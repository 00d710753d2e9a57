"""Insertion-based BVH optimization (Bittner et al. 2013 style).

Operates on the binary pre-order skip-pointer arrays emitted by the
binned-SAH builder (native/bvh_builder.cpp) BEFORE the wide collapse:
repeatedly detach high-inefficiency subtrees and re-insert them at the
globally best sibling found by a branch-and-bound search over the induced
SAH cost. Leaf rows are untouched, so the optimized tree intersects the
exact same triangle set (results equal up to closest-hit tie order on
exactly-equal t).

Why this exists: the wide-kernel frame is ~86% traversal and the
per-iteration cost is intrinsic (PERFORMANCE.md round 3) — the remaining
honest lever is POPS, i.e. tree quality. Binned top-down SAH is greedy;
post-build reinsertion is the standard fix (15-25%% SAH-cost reduction in
the literature). Measured here with the CPU pop replay before any TPU
wiring (tools/eval_reinsert.py).

Reference role: the acceleration-structure quality the reference delegates
to the Vulkan driver via PREFER_FAST_TRACE
(/root/reference/utopian/src/raytracing.rs:151-160).
"""
from __future__ import annotations

import heapq
import logging

import numpy as np

log = logging.getLogger(__name__)


def _half_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]


def _parse(node_miss, node_leaf):
    """Pre-order skip-pointer arrays -> (left, right, parent) child links."""
    n = len(node_leaf)
    ext = np.where(node_miss < 0, n, node_miss).astype(np.int64)
    left = np.full(n, -1, np.int64)
    right = np.full(n, -1, np.int64)
    parent = np.full(n, -1, np.int64)
    internal = node_leaf < 0
    idx = np.nonzero(internal)[0]
    left[idx] = idx + 1
    right[idx] = ext[idx + 1]
    parent[left[idx]] = idx
    parent[right[idx]] = idx
    return left, right, parent


def _emit(root, lo, hi, left, right, node_leaf_ref, child_order="keep"):
    """Re-emit pre-order arrays (min, max, miss, leaf) from child links.

    child_order="area" emits each internal node's larger-surface-area child
    FIRST (the property the greedy builder's natural order tends to have,
    which the any-hit walk's early termination depends on)."""
    n = len(node_leaf_ref)
    out_min = np.empty((n, 3), np.float32)
    out_max = np.empty((n, 3), np.float32)
    out_leaf = np.empty(n, np.int32)
    stack = [int(root)]
    k = 0
    while stack:
        i = stack.pop()
        out_min[k] = lo[i]
        out_max[k] = hi[i]
        out_leaf[k] = node_leaf_ref[i]
        k += 1
        if node_leaf_ref[i] < 0:
            a, b = int(left[i]), int(right[i])
            if child_order == "area" and (
                    _half_area(lo[b], hi[b]) > _half_area(lo[a], hi[a])):
                a, b = b, a
            stack.append(b)
            stack.append(a)
    assert k == n, (k, n)
    # miss pointers from the pre-order layout (same reverse sweep as the
    # native builder): leaf extent = i+1; internal = extent of right child,
    # where left = i+1 and right = extent[left].
    extent = np.empty(n, np.int64)
    for i in range(n - 1, -1, -1):
        if out_leaf[i] >= 0:
            extent[i] = i + 1
        else:
            extent[i] = extent[extent[i + 1]]
    miss = np.where(extent >= n, -1, extent).astype(np.int32)
    miss[0] = -1
    return out_min, out_max, miss, out_leaf


def optimize_reinsertion(node_min, node_max, node_miss, node_leaf,
                         passes: int = 8, frac: float = 0.05,
                         child_order: str = "keep"):
    """Return improved (node_min, node_max, node_miss, node_leaf).

    Each pass detaches the top `frac` nodes by Bittner's inefficiency
    measure (surface area x area ratio to children) and re-inserts each
    subtree at the sibling position minimizing total induced SAH cost
    (branch-and-bound best-first search, exact within the search's bound).
    """
    n = len(node_leaf)
    if n < 16:
        return node_min, node_max, node_miss, node_leaf
    if passes == 0:
        lo = np.array(node_min, np.float64)
        hi = np.array(node_max, np.float64)
        leaf_ref = np.asarray(node_leaf, np.int64)
        left, right, _ = _parse(np.asarray(node_miss, np.int64), leaf_ref)
        return _emit(0, lo, hi, left, right, leaf_ref, child_order)
    lo = np.array(node_min, np.float64)
    hi = np.array(node_max, np.float64)
    leaf_ref = np.asarray(node_leaf, np.int64)
    left, right, parent = _parse(np.asarray(node_miss, np.int64), leaf_ref)
    root = 0

    def sa(i):
        return _half_area(lo[i], hi[i])

    def refit_up(i):
        while i >= 0:
            l, r = left[i], right[i]
            nlo = np.minimum(lo[l], lo[r])
            nhi = np.maximum(hi[l], hi[r])
            if (nlo == lo[i]).all() and (nhi == hi[i]).all():
                break
            lo[i] = nlo
            hi[i] = nhi
            i = parent[i]

    def find_best(nlo, nhi, sa_n):
        """Best sibling X for a detached subtree with box (nlo, nhi)."""
        best_c = np.inf
        best_x = -1
        pq = [(0.0, root)]
        while pq:
            ind, x = heapq.heappop(pq)
            if ind + sa_n >= best_c:
                break
            mlo = np.minimum(lo[x], nlo)
            mhi = np.maximum(hi[x], nhi)
            sam = _half_area(mlo, mhi)
            tot = ind + sam
            if tot < best_c:
                best_c = tot
                best_x = x
            if leaf_ref[x] < 0:
                ind2 = ind + (sam - _half_area(lo[x], hi[x]))
                if ind2 + sa_n < best_c:
                    heapq.heappush(pq, (ind2, int(left[x])))
                    heapq.heappush(pq, (ind2, int(right[x])))
        return best_x

    k = max(4, int(frac * n))
    internal_sum0 = float(sum(sa(i) for i in range(n) if leaf_ref[i] < 0))
    for p in range(passes):
        # inefficiency measure (vectorized)
        d = np.maximum(hi - lo, 0.0)
        area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        m = area.copy()
        idx_int = np.nonzero(leaf_ref < 0)[0]
        child_sum = area[left[idx_int]] + area[right[idx_int]]
        m[idx_int] = area[idx_int] * (
            2.0 * area[idx_int] / np.maximum(child_sum, 1e-30))
        # removable: not root, parent exists, grandparent exists
        ok = (parent >= 0)
        ok[root] = False
        ok &= np.where(parent >= 0, parent != root, False)
        cand = np.nonzero(ok)[0]
        if len(cand) == 0:
            break
        order = cand[np.argsort(-m[cand])][:k]
        moved = 0
        for N in order:
            N = int(N)
            P = int(parent[N])
            if P < 0 or P == root:
                continue  # structure changed since selection
            G = int(parent[P])
            if G < 0:
                continue
            S = int(left[P] if right[P] == N else right[P])
            # detach: S replaces P under G
            if left[G] == P:
                left[G] = S
            else:
                right[G] = S
            parent[S] = G
            parent[P] = -2  # P is free
            refit_up(G)
            sa_n = sa(N)
            X = find_best(lo[N], hi[N], sa_n)
            if X < 0 or X == P:
                X = S  # degenerate fallback: reattach where it was
            XP = int(parent[X])
            # P becomes the new parent of (X, N)
            left[P] = X
            right[P] = N
            parent[X] = P
            parent[N] = P
            lo[P] = np.minimum(lo[X], lo[N])
            hi[P] = np.maximum(hi[X], hi[N])
            if XP >= 0:
                if left[XP] == X:
                    left[XP] = P
                else:
                    right[XP] = P
                parent[P] = XP
                refit_up(XP)
            else:
                parent[P] = -1
                root = P
            moved += 1
        internal_sum = float(sum(sa(i) for i in range(n) if leaf_ref[i] < 0))
        log.info("reinsert pass %d: moved %d, internal SA %.4g (%.3fx)",
                 p, moved, internal_sum, internal_sum / internal_sum0)
    return _emit(root, lo, hi, left, right, leaf_ref, child_order)
