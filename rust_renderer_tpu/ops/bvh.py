"""BVH: acceleration structure build + vectorized stackless traversal.

The TPU rebuild of the reference's hardware ray tracing (utopian/src/
raytracing.rs: BLAS per mesh + TLAS over instances, built by the driver).
Since instances are baked to world space at pack time (renderer.py), one
world-space BVH over all triangles plays the role of BLAS+TLAS; a transform
edit re-packs and rebuilds (the analog of `rebuild_tlas`,
raytracing.rs:400-459).

Design — threaded ("skip pointer") BVH for a vector machine:
- Nodes laid out in DFS pre-order. An AABB hit on an internal node advances
  the cursor to `cur + 1` (its left child); a miss (or a finished leaf) jumps
  to `node_miss[cur]` (next sibling / ancestor sibling; -1 terminates).
- Traversal state per ray is ONE int32 cursor — no stacks, no scatters; every
  step is pure gathers + vectorized AABB/triangle tests across the whole ray
  front. This trades near-first ordering (shrinking t_max still culls) for a
  dataflow shape XLA vectorizes perfectly (SURVEY.md §7.3 item 1).
- Leaves hold exactly LEAF_SIZE triangle slots (padded with -1) so leaf tests
  are fixed-shape.

Build (host-side numpy): triangles sorted by Morton code of centroid, then
median-split over the sorted order — LBVH-style topology with good-enough
SAH quality, O(T log T), no Python per-triangle loops except the node queue.
An optimized C++ builder (native/) handles very large scenes.
"""

from __future__ import annotations

import logging

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops.intersect import HIT_NONE, HIT_SPHERE, HIT_TRIANGLE, Hit

log = logging.getLogger(__name__)

LEAF_SIZE = 4


class BVH(NamedTuple):
    node_min: jax.Array  # (N, 3) f32
    node_max: jax.Array  # (N, 3) f32
    node_miss: jax.Array  # (N,) i32: skip pointer, -1 = traversal done
    node_leaf: jax.Array  # (N,) i32: -1 internal, else row into leaf_tris
    leaf_tris: jax.Array  # (L, LEAF_SIZE) i32 original triangle ids, -1 pad
    # Pre-gathered leaf triangle vertices for gather-light leaf tests:
    leaf_v0: jax.Array  # (L, LEAF_SIZE, 3) f32
    leaf_e1: jax.Array  # (L, LEAF_SIZE, 3) f32 (v1 - v0)
    leaf_e2: jax.Array  # (L, LEAF_SIZE, 3) f32 (v2 - v0)
    # Packed single-row gather layouts (the hot-path data): TPU gather cost
    # is per-INDEX, not per-byte (~1.4 ns/row regardless of width), so the
    # traversal fetches exactly ONE row per step:
    #   node_packed (N, 8):  min.xyz, max.xyz, miss(bitcast i32), leaf(bitcast)
    #   leaf_packed (L, 40): 4 x [v0.xyz, e1.xyz, e2.xyz] + 4 tri ids (bitcast)
    node_packed: jax.Array
    leaf_packed: jax.Array
    # Wide (BVH-WIDE_WIDTH) tree collapsed from the binary one: one row per
    # wide node — (W, 7*width) f32: cols [width*k + c] for k<6 are child c's
    # (min.xyz, max.xyz); col 6*width+c is child c's ref (bitcast i32: >=0
    # wide node index, <=-2 encodes leaf row -(ref+2), WIDE_EMPTY empty
    # slot). Width 16 fills a 128-lane VMEM row (rows cost 512 B regardless
    # of logical width), and one scalar row fetch tests 16 boxes per step.
    wnode_packed: jax.Array
    # Host-side static metadata (python ints, stay static in closures): exact
    # tree depths, used to size traversal stacks safely.
    max_depth: int = 64
    wide_depth: int = 16
    # Row-cursor traversal metadata ((N+1, 3) int32, SMEM-resident in the
    # kernel; None for trees built outside _finalize, e.g. the MC dynamic
    # tree): per wide node [int_last, leaf_last, static_int_rev |
    # static_leaf_rev << 16]. The wide collapse allocates each node's
    # internal children CONTIGUOUSLY (FIFO order) and _finalize reorders
    # leaf rows into collapse-encounter order, so a stack/queue entry can be
    # one word (node_ptr << 16 | hitmask) and a pop decodes child pointers
    # with ffs + popcount instead of per-child scalar pushes
    # (PERFORMANCE.md round 3: mask pushes measure 0.71x the per-iteration
    # cost of per-bit pushes). Masks are BIT-REVERSED (bit 15-slot) so
    # lowest-bit-first decode preserves the production highest-slot-first
    # visit order; int_last/leaf_last are the LAST child's index so
    # ptr = last - count_of_set_static_bits_below(popped bit). Row N is the
    # synthetic root entry's parent (int_last=0, static=1<<15).
    wnode_meta: jax.Array | None = None
    # Quantized WIDTH-32 wide tree (the q32 row-cursor path): one int32
    # (1,128) VMEM row per node with 16-bit conservative child boxes + f32
    # grid header (_quantize_wide32). Built over the SAME binary tree and
    # the SAME leaf table as the w16 collapse; its own leaf encounter order
    # differs, so q32_leaf_perm (SMEM in the kernel) maps q32 leaf ids ->
    # rows of leaf_packed. meta32 is (N32+1, 4) int32:
    # [int_last, leaf_last, static_int_rev32, static_leaf_rev32].
    wnode_q32: jax.Array | None = None
    wnode_meta32: jax.Array | None = None
    q32_leaf_perm: jax.Array | None = None
    q32_depth: int = 0

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized centroid coords into 30-bit Morton codes."""

    def expand(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    q = np.clip((x * 1024.0), 0, 1023).astype(np.uint64)
    return expand(q[:, 0]) | (expand(q[:, 1]) << 1) | (expand(q[:, 2]) << 2)


WIDE_WIDTH = 16
WIDE_EMPTY = np.int32(-0x7FFFFFFF)  # empty child-slot sentinel


def _collapse_wide(node_min, node_max, miss, node_leaf,
                   width: int = WIDE_WIDTH):
    """Collapse the binary skip-pointer tree into a wide (BVH8) tree.

    Standard SAH-guided collapse: each wide node starts as one binary node
    and repeatedly replaces its largest-surface-area internal element with
    that element's two children until `width` slots are filled. Binary
    children are recovered from the DFS pre-order layout (left = i+1,
    right = miss[i+1] — a left child's skip pointer is its sibling).

    Returns (wnode_packed (W, 7*width) f32, wide_depth int). Column layout:
    cols [width*k + c] for k < 6 are child c's (min.xyz, max.xyz) planes;
    col 6*width + c is child c's ref (bitcast i32): >= 0 wide node index,
    <= -2 encodes leaf row -(ref+2), WIDE_EMPTY an empty slot.

    Child SLOT ORDER is the collapse order and is deliberately untouched:
    a round-3 experiment sorting children along the node's longest axis
    (to enable a direction-signed far-to-near push, CWBVH-style) REGRESSED
    the production kernels on real fronts — any-hit +35%, divergent
    closest +12% — before its own ordering logic even ran. Visit order is
    perf-sensitive; see PERFORMANCE.md round 3.
    """
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    miss = np.asarray(miss, np.int64)
    node_leaf = np.asarray(node_leaf, np.int64)
    ext = (node_max - node_min).astype(np.float64)  # f32 squares can overflow
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]

    pending = [0]  # binary root of each wide node, FIFO
    depth_of = [1]
    refs_rows: list[np.ndarray] = []
    box_rows: list[np.ndarray] = []  # (width, 6)
    # Row-cursor metadata (see BVH.wnode_meta): contiguous-children bases +
    # bit-reversed static child-kind masks, plus the leaf-row permutation
    # (new row -> OLD leaf row id, with duplicates when dedup shared a row
    # across wide nodes) that makes each node's leaf children contiguous.
    meta_rows: list[tuple[int, int, int]] = []
    leaf_order: list[int] = []
    wide_depth = 1
    w = 0
    while w < len(pending):
        b = pending[w]
        wide_depth = max(wide_depth, depth_of[w])
        elems = [b]
        while len(elems) < width:
            best = -1
            best_area = -1.0
            for k, e in enumerate(elems):
                if node_leaf[e] < 0 and area[e] > best_area:
                    best, best_area = k, float(area[e])
            if best < 0:
                break
            e = elems.pop(best)
            left = e + 1
            right = int(miss[left])
            elems.append(left)
            elems.append(right)
        refs = np.full(width, WIDE_EMPTY, np.int32)
        boxes = np.zeros((width, 6), np.float32)
        boxes[:, :3] = 1.0  # empty slots: masked by the ref sentinel
        boxes[:, 3:] = -1.0
        int_base = len(pending)
        leaf_base = len(leaf_order)
        int_rev = 0
        leaf_rev = 0
        for slot, e in enumerate(elems):
            if node_leaf[e] >= 0:
                refs[slot] = np.int32(-2 - len(leaf_order))
                leaf_order.append(int(node_leaf[e]))
                leaf_rev |= 1 << (width - 1 - slot)
            else:
                pending.append(e)
                depth_of.append(depth_of[w] + 1)
                refs[slot] = np.int32(len(pending) - 1)
                int_rev |= 1 << (width - 1 - slot)
            boxes[slot, :3] = node_min[e]
            boxes[slot, 3:] = node_max[e]
        n_int = len(pending) - int_base
        n_leaf = len(leaf_order) - leaf_base
        meta_rows.append((
            int_base + max(n_int - 1, 0),
            leaf_base + max(n_leaf - 1, 0),
            int_rev,
            leaf_rev,
        ))
        refs_rows.append(refs)
        box_rows.append(boxes)
        w += 1

    boxes = np.stack(box_rows)  # (W, width, 6)
    refs = np.stack(refs_rows)  # (W, width)
    # Column layout [8k+c]: child c's minx,miny,minz,maxx,maxy,maxz planes.
    packed = np.concatenate(
        [boxes.transpose(0, 2, 1).reshape(len(refs_rows), 6 * width),
         refs.view(np.float32)],
        axis=1,
    ).astype(np.float32)
    # Synthetic root-parent row (the row-cursor stack's initial entry points
    # here with hitmask 1<<(width-1)): one internal "child" = wide node 0.
    meta_rows.append((0, 0, 1 << (width - 1), 0))
    meta64 = np.asarray(meta_rows, np.int64)
    if width <= 16:
        # Row-cursor w16 meta: both static child-kind masks pack into one
        # int32 word ([int_last, leaf_last, int_rev | leaf_rev << 16]).
        meta = np.stack(
            [meta64[:, 0], meta64[:, 1],
             (meta64[:, 2] | (meta64[:, 3] << width))
             .astype(np.uint32).view(np.int32)],
            axis=1).astype(np.int32)
    else:
        # Width > 16 (the quantized w32 path): masks stay separate 32-bit
        # words — [int_last, leaf_last, int_rev32, leaf_rev32].
        meta = np.stack(
            [meta64[:, 0], meta64[:, 1],
             (meta64[:, 2] & 0xFFFFFFFF).astype(np.uint32).view(np.int32),
             (meta64[:, 3] & 0xFFFFFFFF).astype(np.uint32).view(np.int32)],
            axis=1).astype(np.int32)
    leaf_perm = np.asarray(leaf_order, np.int64)
    return packed, int(wide_depth), meta, leaf_perm


def _quantize_wide32(packed32: np.ndarray) -> np.ndarray:
    """Pack a width-32 wide-node table into ONE int32 VMEM row per node
    with 16-bit-quantized child boxes (the CWBVH idea re-sized for TPU row
    economics: a VMEM row costs 512 B at any width, so carry 32 children
    per fetch instead of 16).

    Row layout (128 int32 lanes):
      lanes [p*32 + c], p=0..2: child c's plane pair
          p0 = qlo.x | qlo.y << 16, p1 = qlo.z | qhi.x << 16,
          p2 = qhi.y | qhi.z << 16
      lanes 96..98: node grid origin.xyz (f32 bits)
      lanes 99..101: node grid scale.xyz (f32 bits; plane = origin + q*scale)
      lanes 102..127: zero.

    Quantization is CONSERVATIVE: the node grid is widened 2 ulp beyond the
    children's hull and every child box gets one extra quantization step of
    padding per side, so the dequantized box (including the kernel's
    A=scale*inv_d / B=(origin-o)*inv_d fma algebra, <= 2 ulp of slack)
    always CONTAINS the f32 box — traversal visits a superset of the exact
    walk's nodes and triangle tests decide, so results are exact. Empty
    slots need no special boxes: the static child-kind masks
    (wnode_meta32) already drop their hit bits.
    """
    n, cols = packed32.shape
    width = 32
    assert cols == 7 * width
    boxes = packed32[:, : 6 * width].reshape(n, 6, width)
    refs = packed32[:, 6 * width:].view(np.int32)
    valid = refs != WIDE_EMPTY  # (n, 32)

    lo = boxes[:, 0:3, :]  # (n, 3, 32)
    hi = boxes[:, 3:6, :]
    big = np.float32(3e38)
    lo_m = np.where(valid[:, None, :], lo, big)
    hi_m = np.where(valid[:, None, :], hi, -big)
    origin = lo_m.min(axis=2)  # (n, 3)
    top = hi_m.max(axis=2)
    none_valid = ~valid.any(axis=1)
    origin[none_valid] = 0.0
    top[none_valid] = 0.0
    # Widen the grid 2 ulp so q=0 / q=65535 sit strictly outside the hull.
    origin = np.nextafter(np.nextafter(origin, -np.inf, dtype=np.float32),
                          -np.inf, dtype=np.float32)
    top = np.nextafter(np.nextafter(top, np.inf, dtype=np.float32),
                       np.inf, dtype=np.float32)
    # Scale rounds UP (f64 with a +1e-6 relative bump before the f32 cast):
    # a scale that rounds down makes origin + 65535*scale fall SHORT of the
    # hull top, so children clipped at q=65535 would under-cover (measured
    # ~2.5e-7 relative before the bump).
    ext64 = top.astype(np.float64) - origin.astype(np.float64)
    scale = ((ext64 / 65535.0) * (1.0 + 1e-6)).astype(np.float32)
    safe = np.where(scale > 0, scale, 1.0).astype(np.float32)

    qlo = np.floor((lo - origin[:, :, None]) / safe[:, :, None]) - 1.0
    qhi = np.ceil((hi - origin[:, :, None]) / safe[:, :, None]) + 1.0
    qlo = np.clip(qlo, 0, 65535).astype(np.uint32)
    qhi = np.clip(qhi, 0, 65535).astype(np.uint32)
    qlo = np.where(valid[:, None, :], qlo, 0).astype(np.uint32)
    qhi = np.where(valid[:, None, :], qhi, 0).astype(np.uint32)

    row = np.zeros((n, 128), np.uint32)
    row[:, 0:32] = qlo[:, 0, :] | (qlo[:, 1, :] << 16)
    row[:, 32:64] = qlo[:, 2, :] | (qhi[:, 0, :] << 16)
    row[:, 64:96] = qhi[:, 1, :] | (qhi[:, 2, :] << 16)
    row[:, 96:99] = origin.astype(np.float32).view(np.uint32)
    row[:, 99:102] = scale.astype(np.float32).view(np.uint32)
    return row.view(np.int32)


def _finalize(positions: np.ndarray, indices: np.ndarray, node_min, node_max,
              miss, node_leaf, leaf_arr) -> BVH:
    """Pre-gather leaf triangle vertices and assemble the device arrays."""
    # Collapse first: it renumbers leaf rows into collapse-encounter order
    # (each wide node's leaf children contiguous — the row-cursor kernels'
    # single-word mask-entry encoding needs this; see BVH.wnode_meta). The
    # canonical leaf table is built in the NEW order and the binary tree's
    # leaf refs are remapped to each old row's first new occurrence, so
    # every traversal path sees one consistent table.
    node_leaf = np.asarray(node_leaf, np.int64)
    wnode_packed, wide_depth, wnode_meta, leaf_perm = _collapse_wide(
        node_min, node_max, miss, node_leaf)
    if len(leaf_perm) == 0:
        leaf_perm = np.arange(leaf_arr.shape[0], dtype=np.int64)
    if len(leaf_perm) > leaf_arr.shape[0]:
        log.info("bvh: wide collapse duplicated %d shared leaf rows",
                 int(len(leaf_perm) - leaf_arr.shape[0]))
    leaf_arr = np.asarray(leaf_arr)[leaf_perm]
    new_of_old = np.zeros(max(int(leaf_perm.max(initial=-1)) + 1, 1),
                          np.int64)
    new_of_old[leaf_perm[::-1]] = np.arange(len(leaf_perm))[::-1]
    node_leaf = np.where(node_leaf >= 0,
                         new_of_old[np.maximum(node_leaf, 0)], node_leaf)
    # Quantized width-32 collapse of the same binary tree (node_leaf now
    # references final leaf-table rows, so its leaf_perm IS the q32->table
    # row map).
    w32_packed, q32_depth, meta32, q32_perm = _collapse_wide(
        node_min, node_max, miss, node_leaf, width=32)
    wnode_q32 = _quantize_wide32(w32_packed)
    if len(q32_perm) == 0:
        q32_perm = np.zeros(1, np.int64)
    leaf_size = leaf_arr.shape[1]
    safe = np.maximum(leaf_arr, 0)
    l_i = indices[safe]
    l_v0 = positions[l_i[..., 0]]
    l_v1 = positions[l_i[..., 1]]
    l_v2 = positions[l_i[..., 2]]
    pad = (leaf_arr < 0)[..., None]
    l_v0 = np.where(pad, 0.0, l_v0).astype(np.float32)
    l_e1 = np.where(pad, 0.0, l_v1 - l_v0).astype(np.float32)
    l_e2 = np.where(pad, 0.0, l_v2 - l_v0).astype(np.float32)

    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    miss_i = np.asarray(miss, np.int32)
    leaf_i = np.asarray(node_leaf, np.int32)
    node_packed = np.concatenate(
        [
            node_min, node_max,
            miss_i.astype(np.int32).view(np.float32)[:, None],
            leaf_i.astype(np.int32).view(np.float32)[:, None],
        ],
        axis=1,
    )
    n_leaves = leaf_arr.shape[0]
    # Per-slot layout: slot s occupies columns [9s, 9s+9) as v0.xyz, e1.xyz,
    # e2.xyz; triangle ids (bitcast) fill the last LEAF_SIZE columns.
    per_slot = np.concatenate([l_v0, l_e1, l_e2], axis=2)  # (L, LS, 9)
    leaf_packed = np.concatenate(
        [
            per_slot.reshape(n_leaves, -1),
            leaf_arr.astype(np.int32).view(np.float32),
        ],
        axis=1,
    )
    # NOTE: rows stay at their logical width here; the Pallas path pads to
    # the 128-lane VMEM tile width at launch (traverse_packet_pallas — XLA
    # constant-folds the pad). The XLA packet path row-gathers this table
    # directly, so padding it here would triple its HBM footprint for
    # nothing (rows cost 512 B in VMEM at any width <= 128, but HBM is
    # per-byte).
    # Exact max depth via a preorder walk: internal node i has left child i+1
    # and right child miss[i+1] (the left child's skip pointer is its sibling
    # — the DFS layout invariant). O(N) host pass at build time.
    n_nodes = len(leaf_i)
    max_depth = 1
    stack = [(0, 1)]
    while stack:
        i, depth = stack.pop()
        max_depth = max(max_depth, depth)
        if leaf_i[i] < 0 and i + 1 < n_nodes:
            stack.append((i + 1, depth + 1))
            right = miss_i[i + 1]
            if right >= 0:
                stack.append((int(right), depth + 1))
    return BVH(
        node_min=jnp.asarray(node_min, jnp.float32),
        node_max=jnp.asarray(node_max, jnp.float32),
        node_miss=jnp.asarray(miss_i),
        node_leaf=jnp.asarray(leaf_i),
        leaf_tris=jnp.asarray(leaf_arr, jnp.int32),
        leaf_v0=jnp.asarray(l_v0),
        leaf_e1=jnp.asarray(l_e1),
        leaf_e2=jnp.asarray(l_e2),
        node_packed=jnp.asarray(node_packed),
        leaf_packed=jnp.asarray(leaf_packed),
        wnode_packed=jnp.asarray(wnode_packed),
        max_depth=int(max_depth),
        wide_depth=int(wide_depth),
        wnode_meta=jnp.asarray(wnode_meta),
        wnode_q32=jnp.asarray(wnode_q32),
        wnode_meta32=jnp.asarray(meta32),
        q32_leaf_perm=jnp.asarray(q32_perm, jnp.int32),
        q32_depth=int(q32_depth),
    )


def _collapse_small_subtrees(node_min, node_max, miss, node_leaf, leaf_arr,
                             leaf_size):
    """Post-pass: collapse every subtree holding <= leaf_size triangles into
    ONE full leaf.

    SAH termination leaves half-full leaves (measured occupancy ~0.79: a
    9-triangle node splits 5+4), which wastes ~25% of the VMEM-resident
    leaf table — the difference between a Sponza-scale (260k tri) tree
    fitting the Pallas kernel's 14 MB budget or falling off the fast path.
    The preorder skip-pointer layout makes this cheap: subtree(i) is the
    contiguous node range [i, miss[i] or N), so subtree triangle counts are
    prefix-sum differences and collapse tops are found in one linear scan.
    """
    n = len(node_leaf)
    node_leaf = np.asarray(node_leaf, np.int64)
    miss = np.asarray(miss, np.int64)
    extent = np.where(miss < 0, n, miss)
    is_leaf = node_leaf >= 0
    leafcnt = np.zeros(n, np.int64)
    rows_valid = (leaf_arr >= 0).sum(1)
    leafcnt[is_leaf] = rows_valid[node_leaf[is_leaf]]
    pref = np.concatenate([[0], np.cumsum(leafcnt)])
    count = pref[extent] - pref[np.arange(n)]

    # Topmost internal nodes with a small-enough subtree.
    tops = []
    skip_until = 0
    for i in range(n):
        if i < skip_until:
            continue
        if not is_leaf[i] and count[i] <= leaf_size:
            tops.append(i)
            skip_until = extent[i]
    if not tops:
        return node_min, node_max, miss, node_leaf, leaf_arr

    inside = np.zeros(n, bool)
    top_mask = np.zeros(n, bool)
    for t in tops:
        inside[t + 1:extent[t]] = True
        top_mask[t] = True
    keep = ~inside
    new_index = np.cumsum(keep) - 1
    ext_map = np.concatenate([new_index, [new_index[-1] + 1]])  # extent -> new

    kept = np.nonzero(keep)[0]
    new_rows = []
    new_leaf = np.full(len(kept), -1, np.int64)
    for j, i in enumerate(kept):
        if top_mask[i]:
            span = slice(i, extent[i])
            lrows = node_leaf[span]
            tris = leaf_arr[lrows[lrows >= 0]].reshape(-1)
            tris = tris[tris >= 0]
            row = np.full(leaf_size, -1, np.int64)
            row[: len(tris)] = tris
            new_leaf[j] = len(new_rows)
            new_rows.append(row)
        elif is_leaf[i]:
            new_leaf[j] = len(new_rows)
            new_rows.append(leaf_arr[node_leaf[i]])
    new_miss = np.where(
        extent[kept] >= n, -1, ext_map[extent[kept]]
    ).astype(np.int64)
    log.info(
        "leaf repack: %d -> %d nodes, %d -> %d leaf rows",
        n, len(kept), len(leaf_arr), len(new_rows),
    )
    return (
        np.asarray(node_min)[kept], np.asarray(node_max)[kept],
        new_miss, new_leaf, np.stack(new_rows),
    )


def _presplit_refs(positions: np.ndarray, indices: np.ndarray,
                   budget_ratio: float = 1.4, rounds: int = 8):
    """SBVH-style reference pre-splitting (host, numpy, vectorized rounds).

    Large triangles (architectural walls/floors) force sibling boxes to
    overlap, and overlapped siblings are what turn packet walks into
    near-full union walks. Instead of spatial splits inside the builder
    (a large C++ rewrite with polygon bookkeeping), split the REFERENCES
    before the build: a big triangle becomes several (clipped-AABB,
    same-tri-id) fragments. The build then partitions fragments; leaf rows
    store the ORIGINAL full-triangle geometry, so a hit through any
    fragment is exact and duplicates are harmless (same t/u/v; the strict
    best_t keeps the first). This is the standard SBVH correctness
    argument (Stich et al. 2009) applied at the input layer.

    Per round: the largest-area refs (while the `budget_ratio`*T budget
    lasts) split at the midpoint of their box's longest axis. Each side's
    box = AABB of the full triangle clipped at the plane (verts on that
    side + the two edge-plane intersections), intersected with that half
    of the ref's box — tight for the axis-aligned geometry that matters,
    conservative otherwise. Empty sides are dropped (pure tightening).

    Returns (ref_lo, ref_hi, ref_tri): fragment boxes + original tri ids.
    """
    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    tri_lo = np.minimum(np.minimum(v0, v1), v2)
    tri_hi = np.maximum(np.maximum(v0, v1), v2)
    n = len(indices)
    ref_lo, ref_hi = tri_lo.copy(), tri_hi.copy()
    ref_tri = np.arange(n, dtype=np.int64)
    max_refs = int(budget_ratio * n)

    def half_area(lo, hi):
        ext = (hi - lo).astype(np.float64)
        return ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]

    for _ in range(rounds):
        room = max_refs - len(ref_tri)
        if room <= 0:
            break
        area = half_area(ref_lo, ref_hi)
        # Scene pools carry FLT_MAX sentinel padding triangles — their
        # "boxes" must neither be split nor pollute the area statistics.
        real = (np.abs(ref_lo).max(axis=1) < 1e30) & (
            np.abs(ref_hi).max(axis=1) < 1e30)
        if not real.any():
            break
        mean = area[real].mean()
        # Split only extreme area OUTLIERS (monster ground planes / walls
        # from imported assets), iterating until their fragments reach
        # locally-normal size. Splitting ordinary geometry measured ~45%
        # WORSE on the atrium (duplicate leaf work, no overlap win) —
        # tools/eval_tree.py, PERFORMANCE.md round 3.
        cand = np.nonzero(real & (area > 16.0 * mean))[0]
        if len(cand) == 0:
            break
        if len(cand) > room:
            cand = cand[np.argpartition(-area[cand], room - 1)[:room]]
        t = ref_tri[cand]
        lo_c, hi_c = ref_lo[cand], ref_hi[cand]
        axis = np.argmax(hi_c - lo_c, axis=1)
        ar = np.arange(len(cand))
        p = 0.5 * (lo_c[ar, axis] + hi_c[ar, axis])

        verts = np.stack([v0[t], v1[t], v2[t]], axis=1)  # (C, 3, 3)
        vax = np.take_along_axis(
            verts, axis[:, None, None], axis=2
        )[:, :, 0]  # (C, 3) vertex coords on each ref's split axis
        # Edge-plane intersections for edges (0,1),(1,2),(2,0).
        e_from = verts
        e_to = verts[:, [1, 2, 0]]
        a_from = vax
        a_to = vax[:, [1, 2, 0]]
        cross = (a_from - p[:, None]) * (a_to - p[:, None]) < 0.0
        denom = a_to - a_from
        # Guarded select: the where() masks degenerate edges, but numpy
        # still evaluates the division — silence the benign warning.
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = np.where(np.abs(denom) > 1e-30,
                          (p[:, None] - a_from) / denom, 0.0)
        ipts = e_from + tt[..., None] * (e_to - e_from)  # (C, 3, 3)

        big = np.float32(3e38)

        def side_box(keep_vert, clamp_lo_ax, clamp_hi_ax):
            # candidates: kept verts + crossing-edge intersections
            cand_pts = np.concatenate([verts, ipts], axis=1)  # (C, 6, 3)
            cand_ok = np.concatenate([keep_vert, cross], axis=1)  # (C, 6)
            okm = cand_ok[..., None]
            lo = np.where(okm, cand_pts, big).min(axis=1)
            hi = np.where(okm, cand_pts, -big).max(axis=1)
            lo = np.maximum(lo, lo_c)
            hi = np.minimum(hi, hi_c)
            # restrict the split axis to this half of the ref box
            lo_ax = np.maximum(lo[ar, axis], clamp_lo_ax)
            hi_ax = np.minimum(hi[ar, axis], clamp_hi_ax)
            lo[ar, axis] = lo_ax
            hi[ar, axis] = hi_ax
            valid = np.all(hi >= lo, axis=1) & cand_ok.any(axis=1)
            return lo.astype(np.float32), hi.astype(np.float32), valid

        l_lo, l_hi, l_ok = side_box(vax <= p[:, None], lo_c[ar, axis], p)
        r_lo, r_hi, r_ok = side_box(vax >= p[:, None], p, hi_c[ar, axis])
        # A side that is empty is dropped; if both are somehow empty keep
        # the original ref untouched (degenerate numerical case).
        both_dead = ~l_ok & ~r_ok
        l_lo = np.where(both_dead[:, None], lo_c, l_lo)
        l_hi = np.where(both_dead[:, None], hi_c, l_hi)
        l_ok = l_ok | both_dead

        keep = np.ones(len(ref_tri), bool)
        keep[cand] = False
        ref_lo = np.concatenate([ref_lo[keep], l_lo[l_ok], r_lo[r_ok]])
        ref_hi = np.concatenate([ref_hi[keep], l_hi[l_ok], r_hi[r_ok]])
        ref_tri = np.concatenate([ref_tri[keep], t[l_ok], t[r_ok]])
    return ref_lo, ref_hi, ref_tri


def _dedup_leaf_rows(leaf_tris: np.ndarray) -> np.ndarray:
    """Null out duplicate tri ids within each leaf row (pre-split fragments
    of one triangle can land in the same leaf). -1 slots stay -1; no
    compaction needed (slot tests skip tri_id < 0)."""
    srt = np.sort(leaf_tris, axis=1)
    dup_vals = np.where(srt[:, 1:] == srt[:, :-1], srt[:, 1:], -2)
    out = leaf_tris.copy()
    for r in range(leaf_tris.shape[0]):
        vals = dup_vals[r][dup_vals[r] >= 0]
        if len(vals) == 0:
            continue
        for v in np.unique(vals):
            slots = np.nonzero(out[r] == v)[0]
            out[r, slots[1:]] = -1
    return out


def build_bvh(positions: np.ndarray, indices: np.ndarray, leaf_size: int = LEAF_SIZE,
              use_native: bool = True, presplit_ratio: float = 1.0,
              reinsert_passes: int = 0,
              reinsert_child_order: str = "keep") -> BVH:
    """Build from (V,3) float32 world positions and (T,3) int32 indices.

    Prefers the native binned-SAH builder (native/bvh_builder.cpp — better
    trees, ~100x faster host build); falls back to the numpy Morton-median
    builder below. presplit_ratio > 1 enables SBVH-style reference
    pre-splitting up to that multiple of the triangle count (_presplit_refs;
    native path only). reinsert_passes > 0 runs Bittner-style insertion
    optimization on the binary tree before the wide collapse
    (ops/bvh_opt.py; native path only)."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int64).reshape(-1, 3)

    # Exclude unreachable geometry from the tree. The default scene parks a
    # gizmo-target sphere at FLT_MAX (models/scenes.py, = scenes.rs:3-30);
    # its triangles gave 13 ancestor nodes INFINITE boxes that every packet
    # walked every frame, and inf surface areas poison SAH arithmetic.
    # Every traversal caller uses t_max <= 1e4, so triangles entirely
    # beyond |1e30| can never produce a valid hit — dropping their LEAF
    # rows is exact. They re-enter automatically when moved to finite
    # coordinates (any transform change rebuilds the tree). Original
    # triangle ids are preserved (leaf rows index the untouched scene
    # pools).
    indices_all = indices
    if len(indices):
        tv = positions[indices.reshape(-1)].reshape(-1, 3, 3)
        far = ~np.all(np.abs(tv) < 1e30, axis=(1, 2))
        far |= ~np.isfinite(tv).all(axis=(1, 2))
        if far.any():
            log.info("bvh: excluding %d unreachable triangles (beyond 1e30)",
                     int(far.sum()))
            keep = np.nonzero(~far)[0]
            indices = indices[keep]
            tri_map = keep.astype(np.int64)
        else:
            tri_map = None
    else:
        tri_map = None
    n_tris = len(indices)

    def _to_original_ids(leaf_tris):
        """Map filtered-build triangle ids back to the caller's ids, so hit
        prims index the untouched scene pools."""
        if tri_map is None:
            return leaf_tris
        return np.where(leaf_tris >= 0,
                        tri_map[np.maximum(leaf_tris, 0)], -1)

    if use_native and n_tris > 0:
        from rust_renderer_tpu import native

        ref_tri = None
        if presplit_ratio > 1.0:
            ref_lo, ref_hi, ref_tri = _presplit_refs(
                positions, indices, budget_ratio=presplit_ratio
            )
            # Feed the builder fake triangles spanning each fragment box
            # (AABB of [lo, hi, lo] is exactly [lo, hi]; no midpoint
            # arithmetic — FLT_MAX sentinel rows would overflow to inf and
            # poison every ancestor box). Real triangle data re-enters at
            # leaf-pack time via the ref->tri map.
            fake_pos = np.stack(
                [ref_lo, ref_hi, ref_lo], axis=1
            ).reshape(-1, 3).astype(np.float32)
            fake_idx = np.arange(len(ref_tri) * 3, dtype=np.int32).reshape(-1, 3)
            out = native.build_bvh_sah(fake_pos, fake_idx, leaf_size)
        else:
            out = native.build_bvh_sah(positions, indices.astype(np.int32), leaf_size)
        if out is not None:
            node_min, node_max, node_miss, node_leaf, leaf_tris = out
            if reinsert_passes > 0 or reinsert_child_order != "keep":
                from rust_renderer_tpu.ops.bvh_opt import optimize_reinsertion

                node_min, node_max, node_miss, node_leaf = (
                    optimize_reinsertion(node_min, node_max, node_miss,
                                         node_leaf, passes=reinsert_passes,
                                         child_order=reinsert_child_order)
                )
            node_min, node_max, node_miss, node_leaf, leaf_tris = (
                _collapse_small_subtrees(
                    node_min, node_max, node_miss, node_leaf,
                    leaf_tris.astype(np.int64), leaf_size,
                )
            )
            leaf_tris = leaf_tris.astype(np.int64)
            if ref_tri is not None:
                leaf_tris = np.where(leaf_tris >= 0, ref_tri[np.maximum(leaf_tris, 0)], -1)
                leaf_tris = _dedup_leaf_rows(leaf_tris)
            return _finalize(
                positions, indices_all, node_min, node_max, node_miss,
                node_leaf, _to_original_ids(leaf_tris),
            )
    if n_tris == 0:
        # Degenerate empty BVH: one leaf with no triangles.
        return _finalize(
            np.zeros((1, 3), np.float32),
            np.zeros((1, 3), np.int64),
            np.zeros((1, 3), np.float32),
            np.zeros((1, 3), np.float32),
            np.full(1, -1, np.int32),
            np.zeros(1, np.int32),
            np.full((1, leaf_size), -1, np.int64),
        )

    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    centroid = (tri_min + tri_max) * 0.5

    lo = centroid.min(0)
    span = np.maximum(centroid.max(0) - lo, 1e-12)
    order = np.argsort(_morton3((centroid - lo) / span), kind="stable")

    s_min = tri_min[order]
    s_max = tri_max[order]

    # Iterative DFS build over sorted ranges, emitting nodes in pre-order so
    # hit-next == cur+1. Each frame: (start, end, miss_target_patch_list).
    node_min: list[np.ndarray] = []
    node_max: list[np.ndarray] = []
    node_leaf: list[int] = []
    node_miss: list[int] = []
    leaf_rows: list[np.ndarray] = []

    # Stack entries: (start, end). We record each node's subtree end so the
    # miss pointer is "index after my subtree" resolved in a second pass.
    subtree_end: list[int] = []
    stack = [(0, n_tris)]
    # To compute subtree extents in pre-order, do the DFS explicitly with
    # parent bookkeeping.
    frames = [(0, n_tris, -1)]  # (start, end, parent_node)
    parents: list[int] = []
    while frames:
        start, end, parent = frames.pop()
        idx = len(node_leaf)
        count = end - start
        node_min.append(s_min[start:end].min(0))
        node_max.append(s_max[start:end].max(0))
        parents.append(parent)
        if count <= leaf_size:
            row = np.full(leaf_size, -1, np.int64)
            row[:count] = order[start:end]
            node_leaf.append(len(leaf_rows))
            leaf_rows.append(row)
        else:
            node_leaf.append(-1)
            mid = start + count // 2
            # Push right then left so left is emitted next (pre-order).
            frames.append((mid, end, idx))
            frames.append((start, mid, idx))
        node_miss.append(-2)  # resolved below

    n_nodes = len(node_leaf)
    parents_arr = np.asarray(parents, np.int64)
    # Children of each internal node appear consecutively in pre-order:
    # left = parent+1 ... ; right child starts right after left's subtree.
    # Compute subtree extent via reverse sweep: a node's subtree ends where
    # the next node with a shallower-or-equal position in its ancestor chain
    # begins. Simpler: process nodes in reverse, tracking extents.
    extent = np.zeros(n_nodes, np.int64)
    children: list[list[int]] = [[] for _ in range(n_nodes)]
    for i in range(1, n_nodes):
        children[parents_arr[i]].append(i)
    for i in range(n_nodes - 1, -1, -1):
        if node_leaf[i] >= 0:
            extent[i] = i + 1
        else:
            extent[i] = extent[children[i][1]]
    # miss pointer: for each node, the node after its subtree; -1 if none.
    miss = np.where(extent >= n_nodes, -1, extent).astype(np.int64)
    # Root's miss must be -1.
    miss[0] = -1

    leaf_arr = np.stack(leaf_rows) if leaf_rows else np.full((1, leaf_size), -1, np.int64)
    log.info("bvh (numpy): %d tris -> %d nodes", n_tris, len(node_leaf))
    nmin, nmax, miss, nleaf, leaf_arr = _collapse_small_subtrees(
        np.stack(node_min), np.stack(node_max), miss,
        np.asarray(node_leaf), leaf_arr, leaf_size,
    )
    return _finalize(positions, indices_all, nmin, nmax, miss, nleaf,
                     _to_original_ids(leaf_arr))


def build_scene_bvh(scene, leaf_size: int | None = None) -> BVH:
    """Build from a PackedScene's world-space pools.

    Leaf size is backend-tuned: the Pallas kernel fetches leaf rows as
    scalars and a VMEM row costs 512 B at any width <= 128 lanes, so leaves
    hold 12 slots (12x9 coords + 12 ids = 120 of 128 lanes) — fat leaves
    also shallow the walk; the XLA gather path prefers 4 (leaf math there
    is per-lane width-bound)."""
    if leaf_size is None:
        try:
            is_tpu = jax.devices()[0].platform != "cpu"
        except Exception:
            is_tpu = False
        leaf_size = 12 if is_tpu else LEAF_SIZE
    return build_bvh(
        np.asarray(scene.positions), np.asarray(scene.indices), leaf_size
    )


# -- occluder seeds ----------------------------------------------------------


def make_seed_test(bvh: BVH, k: int = 4):
    """Pre-traversal test against the K largest-total-area leaf rows.

    Discovery (round 3): the FLT_MAX gizmo sphere accidentally forced every
    packet through a mixed leaf of camera-area wall triangles, terminating
    camera occlusion queries in ~6 pops/block. This is that mechanism done
    on purpose: big walls/floors occlude most rays, so test them FIRST as
    static trace-time constants (no gathers, ~30 VPU ops/triangle full-
    image). CPU replay (tools/eval_seed.py, K=4): camera any-hit 0.02x
    pops (97.6% killed pre-walk), bounce any-hit 0.37x, sun front 0.85x.

    Returns fn(origin, direction, t_min, t_max) -> bool occluded, or None
    (no usable rows). Occlusion-only: the same seeds used to prime
    closest-hit t_max measured a no-op (0.98-0.99x pops — the walk
    tightens best_t quickly on its own), so only make_any_hit consumes
    this.

    Exactness: occlusion is boolean — extra tests can only find occluders
    earlier, never change the answer. Reference role: none — the
    reference's RT cores hide occlusion-ray cost in hardware; this is TPU
    scheduling.
    """
    if k <= 0:
        return None
    v0 = np.asarray(bvh.leaf_v0)
    e1 = np.asarray(bvh.leaf_e1)
    e2 = np.asarray(bvh.leaf_e2)
    tid = np.asarray(bvh.leaf_tris)
    if len(v0) == 0:
        return None
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum(axis=1)
    rows = np.argsort(-area)[: min(k, len(area))]
    tris = []
    for r in rows:
        for s in range(tid.shape[1]):
            if tid[r, s] >= 0:
                tris.append((v0[r, s].tolist(), e1[r, s].tolist(),
                             e2[r, s].tolist(), int(tid[r, s])))
    if not tris:
        return None

    def test(origin, direction, t_min, t_max):
        ox, oy, oz = origin[..., 0], origin[..., 1], origin[..., 2]
        dx, dy, dz = direction[..., 0], direction[..., 1], direction[..., 2]
        shape = ox.shape
        tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
        occ = jnp.zeros(shape, bool)
        for (a, b, c, _pid) in tris:
            px = dy * c[2] - dz * c[1]
            py = dz * c[0] - dx * c[2]
            pz = dx * c[1] - dy * c[0]
            det = b[0] * px + b[1] * py + b[2] * pz
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx, tvy, tvz = ox - a[0], oy - a[1], oz - a[2]
            u = (tvx * px + tvy * py + tvz * pz) * inv
            qx = tvy * b[2] - tvz * b[1]
            qy = tvz * b[0] - tvx * b[2]
            qz = tvx * b[1] - tvy * b[0]
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (c[0] * qx + c[1] * qy + c[2] * qz) * inv
            ok = (
                (jnp.abs(det) > 1e-12)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min) & (t < tmax_arr)
            )
            occ = jnp.logical_or(occ, ok)
        return occ

    return test


# -- traversal ---------------------------------------------------------------


def _slab_test(o, inv_d, bmin, bmax, t_min, t_best):
    """Vectorized ray/AABB slab test. Returns bool (...)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.logical_and(tfar >= jnp.maximum(tnear, t_min), tnear <= t_best)


def _leaf_intersect(bvh: BVH, leaf_row, o, d, t_min, best_t, best_prim, best_u, best_v):
    """Test LEAF_SIZE triangles of each ray's current leaf. Möller–Trumbore
    against pre-gathered (v0, e1, e2)."""
    v0 = bvh.leaf_v0[leaf_row]  # (..., LEAF, 3)
    e1 = bvh.leaf_e1[leaf_row]
    e2 = bvh.leaf_e2[leaf_row]
    tris = bvh.leaf_tris[leaf_row]  # (..., LEAF)

    ox = o[..., None, :]
    dx = d[..., None, :]
    pvec = jnp.cross(dx, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = ox - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(dx * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (
        (tris >= 0)
        & (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min[..., None])
        & (t < best_t[..., None])
    )
    t = jnp.where(ok, t, rayops.INF)
    arg = jnp.argmin(t, axis=-1)
    tsel = jnp.take_along_axis(t, arg[..., None], axis=-1)[..., 0]
    closer = tsel < best_t
    take = lambda a: jnp.take_along_axis(a, arg[..., None], axis=-1)[..., 0]
    return (
        jnp.where(closer, tsel, best_t),
        jnp.where(closer, take(tris), best_prim),
        jnp.where(closer, take(u), best_u),
        jnp.where(closer, take(v), best_v),
        closer,
    )


def _row_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """One packed row per index — the only gather shape that runs near the
    TPU's per-index throughput floor. table (L, W), idx (R,) -> (R, W)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        table, idx[:, None], dnums, slice_sizes=(1, table.shape[1]), mode="clip"
    )


def _bitcast_i32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def traverse(bvh: BVH, origin, direction, t_min=1e-3, t_max=1e4, any_hit: bool = False):
    """Closest-hit (or any-hit) traversal over a ray batch (..., 3).

    Returns (t, prim, u, v) with t=INF on miss; with any_hit=True terminates
    rays at the first confirmed triangle hit.

    Fused stackless walk over packed rows: every step advances each live lane
    through one node (one 32-byte row gather) and, for lanes sitting on a
    leaf, tests its 4 triangles (one 160-byte row gather). Gather cost on TPU
    is per-index (~1.4 ns/row regardless of width), so exactly two row
    gathers per lane-step is the floor for a binary tree; iteration count is
    bounded by the longest single-ray walk (lockstep phase alternation was
    tried and loses badly under divergence — waiting lanes still pay
    indices while rounds multiply).
    """
    shape = origin.shape[:-1]
    r = 1
    for s in shape:
        r *= s
    o = origin.reshape(r, 3)
    d = direction.reshape(r, 3)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    t_min_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape).reshape(r)
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(r)

    ls = bvh.leaf_tris.shape[1]

    # Planar ray components: (R,) arrays keep the minor dimension = lanes, so
    # every VPU op runs at full register width (a (R,3) layout pads 3 -> 128
    # and wastes ~40x of each vector op).
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dxc, dyc, dzc = d[:, 0], d[:, 1], d[:, 2]
    ix, iy, iz = inv_d[:, 0], inv_d[:, 1], inv_d[:, 2]

    def cond(state):
        cur, *_ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, best_t, best_prim, best_u, best_v = state
        running = cur >= 0
        row = _row_gather(bvh.node_packed, jnp.maximum(cur, 0))
        col = lambda j: row[:, j]
        tx0 = (col(0) - ox) * ix
        ty0 = (col(1) - oy) * iy
        tz0 = (col(2) - oz) * iz
        tx1 = (col(3) - ox) * ix
        ty1 = (col(4) - oy) * iy
        tz1 = (col(5) - oz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        miss = _bitcast_i32(col(6))
        leaf = _bitcast_i32(col(7))
        box_hit = jnp.logical_and(tfar >= jnp.maximum(tnear, t_min_v), tnear <= best_t)
        box_hit = jnp.logical_and(box_hit, running)

        is_leaf = leaf >= 0
        do_leaf = jnp.logical_and(box_hit, is_leaf)

        lrow = _row_gather(bvh.leaf_packed, jnp.maximum(leaf, 0))  # (R, 40)
        improved_any = jnp.zeros_like(do_leaf)
        # Unrolled leaf slots, all math on (R,) components.
        for s in range(ls):
            base = s * 9
            v0x, v0y, v0z = lrow[:, base], lrow[:, base + 1], lrow[:, base + 2]
            e1x, e1y, e1z = lrow[:, base + 3], lrow[:, base + 4], lrow[:, base + 5]
            e2x, e2y, e2z = lrow[:, base + 6], lrow[:, base + 7], lrow[:, base + 8]
            tri_id = _bitcast_i32(lrow[:, 9 * ls + s])
            # pvec = d x e2
            px_ = dyc * e2z - dzc * e2y
            py_ = dzc * e2x - dxc * e2z
            pz_ = dxc * e2y - dyc * e2x
            det = e1x * px_ + e1y * py_ + e1z * pz_
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            u = (tvx * px_ + tvy * py_ + tvz * pz_) * inv_det
            # qvec = tvec x e1
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dxc * qx + dyc * qy + dzc * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                do_leaf
                & (tri_id >= 0)
                & (jnp.abs(det) > 1e-12)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min_v) & (t < best_t)
            )
            best_t = jnp.where(ok, t, best_t)
            best_prim = jnp.where(ok, tri_id, best_prim)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            improved_any = jnp.logical_or(improved_any, ok)

        descend = jnp.logical_and(box_hit, jnp.logical_not(is_leaf))
        nxt = jnp.where(descend, cur + 1, miss)
        cur = jnp.where(running, nxt, cur)
        if any_hit:
            cur = jnp.where(improved_any, -1, cur)
        return cur, best_t, best_prim, best_u, best_v

    degenerate = jnp.sum(d * d, axis=-1) < 1e-12
    init = (
        jnp.where(degenerate, -1, 0).astype(jnp.int32),
        jnp.minimum(jnp.full(r, rayops.INF), t_max_v),
        jnp.full(r, -1, jnp.int32),
        jnp.zeros(r, jnp.float32),
        jnp.zeros(r, jnp.float32),
    )
    cur, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    t = jnp.where(prim >= 0, t, rayops.INF)
    return (
        t.reshape(shape), prim.reshape(shape), u.reshape(shape), v.reshape(shape)
    )


def traverse_packet(
    bvh: BVH, origin, direction, t_min=1e-3, t_max=1e4,
    any_hit: bool = False, packet: int = 256, tile: int = 16,
):
    """Packet traversal: blocks of rays share ONE traversal cursor.

    The per-ray walk's gathers lower to table-scanning reductions on TPU
    (cost ∝ rays x nodes — measured 82% of traversal time). Packets make the
    random access *scalar per block*: each step gathers `n_blocks` node rows
    (thousands, not millions of indices) and tests the whole block against
    that node with dense (B, P) vector math — the classic SIMD packet-tracing
    design, which is exactly what a TPU wants. A block descends when ANY of
    its rays hits the box (per-ray t-culling still applies inside).

    (..., 3) ray arrays; image-shaped inputs (H, W, 3) are tiled `tile`x`tile`
    so packets are spatially coherent. Divergent (bounce) rays degrade toward
    union-of-paths traversal — still bounded by the single-ray worst case
    times packet overlap.
    """
    shape = origin.shape[:-1]
    if len(shape) == 2 and shape[0] % tile == 0 and shape[1] % tile == 0:
        h, w = shape
        o = origin.reshape(h // tile, tile, w // tile, tile, 3)
        o = o.transpose(0, 2, 1, 3, 4).reshape(-1, tile * tile, 3)
        d = direction.reshape(h // tile, tile, w // tile, tile, 3)
        d = d.transpose(0, 2, 1, 3, 4).reshape(-1, tile * tile, 3)
        packet = tile * tile

        def unshape(x):
            x = x.reshape(h // tile, w // tile, tile, tile)
            return x.transpose(0, 2, 1, 3).reshape(h, w)

    else:
        r = 1
        for s in shape:
            r *= s
        pad = (-r) % packet
        o = jnp.pad(origin.reshape(-1, 3), ((0, pad), (0, 0)))
        # Zero-direction pad lanes hit the degenerate-ray guard and are
        # retired on entry (a live pad direction would keep walking the tree
        # and, in any-hit mode, block the tail block's all-done early exit).
        d = jnp.pad(direction.reshape(-1, 3), ((0, pad), (0, 0)))
        o = o.reshape(-1, packet, 3)
        d = d.reshape(-1, packet, 3)

        def unshape(x):
            return x.reshape(-1)[:r].reshape(shape)

    b = o.shape[0]
    p = packet
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]  # (B, P)
    dxc, dyc, dzc = d[..., 0], d[..., 1], d[..., 2]
    safe = lambda a: jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)
    ix, iy, iz = 1.0 / safe(dxc), 1.0 / safe(dyc), 1.0 / safe(dzc)
    t_min_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    t_min_v = _tile_like(t_min_v, shape, tile, packet)
    t_max_v = _tile_like(t_max_v, shape, tile, packet)

    ls = bvh.leaf_tris.shape[1]

    def cond(state):
        cur, *_ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, best_t, best_prim, best_u, best_v, done = state
        running = cur >= 0  # (B,)
        row = _row_gather(bvh.node_packed, jnp.maximum(cur, 0))  # (B, 8)
        col = lambda j: row[:, j : j + 1]  # (B, 1) broadcast over P
        tx0 = (col(0) - ox) * ix
        ty0 = (col(1) - oy) * iy
        tz0 = (col(2) - oz) * iz
        tx1 = (col(3) - ox) * ix
        ty1 = (col(4) - oy) * iy
        tz1 = (col(5) - oz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        miss = _bitcast_i32(row[:, 6])  # (B,)
        leaf = _bitcast_i32(row[:, 7])
        ray_hit = (
            (tfar >= jnp.maximum(tnear, t_min_v))
            & (tnear <= best_t)
            & jnp.logical_not(done)
        )  # (B, P)
        block_hit = jnp.logical_and(running, jnp.any(ray_hit, axis=-1))  # (B,)

        is_leaf = leaf >= 0
        do_leaf = jnp.logical_and(block_hit, is_leaf)  # (B,)

        lrow = _row_gather(bvh.leaf_packed, jnp.maximum(leaf, 0))  # (B, 9ls+ls)
        lc = lambda j: lrow[:, j : j + 1]  # (B, 1)
        improved_any = jnp.zeros_like(ray_hit)
        for s in range(ls):
            base = s * 9
            v0x, v0y, v0z = lc(base), lc(base + 1), lc(base + 2)
            e1x, e1y, e1z = lc(base + 3), lc(base + 4), lc(base + 5)
            e2x, e2y, e2z = lc(base + 6), lc(base + 7), lc(base + 8)
            tri_id = _bitcast_i32(lrow[:, 9 * ls + s])[:, None]  # (B, 1)
            px_ = dyc * e2z - dzc * e2y
            py_ = dzc * e2x - dxc * e2z
            pz_ = dxc * e2y - dyc * e2x
            det = e1x * px_ + e1y * py_ + e1z * pz_
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            u = (tvx * px_ + tvy * py_ + tvz * pz_) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dxc * qx + dyc * qy + dzc * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                do_leaf[:, None]
                & (tri_id >= 0)
                & (jnp.abs(det) > 1e-12)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > t_min_v) & (t < best_t)
                & jnp.logical_not(done)
            )
            best_t = jnp.where(ok, t, best_t)
            best_prim = jnp.where(ok, jnp.broadcast_to(tri_id, ok.shape), best_prim)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            improved_any = jnp.logical_or(improved_any, ok)

        if any_hit:
            done = jnp.logical_or(done, improved_any)

        descend = jnp.logical_and(block_hit, jnp.logical_not(is_leaf))
        nxt = jnp.where(descend, cur + 1, miss)
        cur = jnp.where(running, nxt, cur)
        if any_hit:
            cur = jnp.where(jnp.all(done, axis=-1), -1, cur)
        return cur, best_t, best_prim, best_u, best_v, done

    # Degenerate rays (zero-length scatter directions, e.g. lambertian
    # normal+unit_sphere ~ 0) would otherwise walk the entire tree and stall
    # their whole packet: mark them done up front.
    degenerate = (dxc * dxc + dyc * dyc + dzc * dzc) < 1e-12
    init = (
        jnp.zeros(b, jnp.int32),
        jnp.minimum(jnp.full((b, p), rayops.INF), t_max_v),
        jnp.full((b, p), -1, jnp.int32),
        jnp.zeros((b, p), jnp.float32),
        jnp.zeros((b, p), jnp.float32),
        degenerate,
    )
    cur, t, prim, u, v, done = jax.lax.while_loop(cond, body, init)
    t = jnp.where(prim >= 0, t, rayops.INF)
    return unshape(t), unshape(prim), unshape(u), unshape(v)


def traverse_packet_sorted(
    bvh: BVH, origin, direction, t_min=1e-3, t_max=1e4,
    any_hit: bool = False, packet: int = 256,
):
    """Packet traversal over rays re-ordered for coherence.

    Bounce/shadow rays lose the spatial coherence that makes packets fast;
    sorting by (direction octant, origin Morton cell) re-forms coherent
    packets. Sort + permute costs a few ms; divergent traversals cost
    hundreds. Results are scattered back to the original order (exact)."""
    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3)
    d = direction.reshape(-1, 3)
    r = o.shape[0]

    # Key: 3-bit direction octant (major) then 6-bit/axis origin Morton.
    scene_lo = bvh.node_min[0]
    scene_span = jnp.maximum(bvh.node_max[0] - scene_lo, 1e-6)
    q = jnp.clip(((o - scene_lo) / scene_span * 64.0), 0, 63).astype(jnp.uint32)

    def expand6(v):
        v = v & jnp.uint32(0x3F)
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C3)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249)
        return v

    morton = expand6(q[:, 0]) | (expand6(q[:, 1]) << jnp.uint32(1)) | (
        expand6(q[:, 2]) << jnp.uint32(2)
    )
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << jnp.uint32(1))
        | ((d[:, 2] >= 0).astype(jnp.uint32) << jnp.uint32(2))
    )
    key = (octant << jnp.uint32(18)) | morton
    order = jnp.argsort(key)

    t_min_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape).reshape(-1)
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(-1)

    t, prim, u, v = traverse_packet(
        bvh, o[order], d[order], t_min_v[order], t_max_v[order],
        any_hit=any_hit, packet=packet,
    )
    inv = jnp.argsort(order)
    return (
        t[inv].reshape(shape), prim[inv].reshape(shape),
        u[inv].reshape(shape), v[inv].reshape(shape),
    )


def _tile_like(x, shape, tile, packet):
    """Reshape a (...,) scalar-broadcast array the same way the rays were."""
    if len(shape) == 2 and shape[0] % tile == 0 and shape[1] % tile == 0:
        h, w = shape
        return (
            x.reshape(h // tile, tile, w // tile, tile)
            .transpose(0, 2, 1, 3)
            .reshape(-1, tile * tile)
        )
    r = 1
    for s in shape:
        r *= s
    pad = (-r) % packet
    return jnp.pad(x.reshape(-1), (0, pad)).reshape(-1, packet)


def _pallas_mode(bvh: BVH, wide: bool = True) -> str:
    """Pallas backend selection: "full" keeps nodes + leaf rows VMEM-resident
    (~14 MB of the 16 MB scoped-vmem budget); "dma" keeps only the wide node
    table resident and DMAs one 512 B leaf row from HBM per leaf pop —
    Sponza-scale and beyond; "none" falls back to the XLA packet walk
    (always on CPU). Bytes are counted at the REAL VMEM layout — tiles are
    (8,128), so every table row costs ceil(width/128)*512 B regardless of
    logical width (measured the hard way: a (260k, 10) table is 133 MB in
    VMEM, not 10 MB). Hence 12-slot leaf rows (120/128 lanes used) and
    width-16 wide nodes (112/128)."""
    try:
        import jax as _jax

        if _jax.devices()[0].platform == "cpu":
            return "none"
    except Exception:
        return "none"

    def vmem_rows_bytes(a):
        rows, cols = a.shape
        return rows * -(-cols // 128) * 512

    node_bytes = vmem_rows_bytes(bvh.wnode_packed if wide else bvh.node_packed)
    leaf_bytes = vmem_rows_bytes(bvh.leaf_packed)
    if node_bytes + leaf_bytes < 14 * 1024 * 1024:
        return "full"
    if wide and node_bytes < 8 * 1024 * 1024:
        return "dma"
    return "none"


def _pallas_eligible(bvh: BVH, wide: bool = True) -> bool:
    return _pallas_mode(bvh, wide) != "none"


def _pick_traversal(bvh: BVH, packet: bool, sort: bool,
                    wide: bool = True, ordered: bool = False,
                    multi: int = 1, dual: bool = False,
                    compact_window: int = 0, steady_drain: int = 0,
                    drain_first: bool = False,
                    compact_order: str = "morton",
                    row_cursors: int = 0, row_expand: int = 2,
                    q32: bool = False, skip_expand: bool = False,
                    skip_drain: bool = False):
    if sort:
        return traverse_packet_sorted
    mode = _pallas_mode(bvh, wide=wide) if packet else "none"
    if mode != "none":
        import functools

        from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas

        trav = functools.partial(traverse_packet_pallas, wide=wide,
                                 ordered=ordered, dma_leaf=(mode == "dma"),
                                 multi=multi, dual=dual,
                                 steady_drain=steady_drain,
                                 drain_first=drain_first,
                                 row_cursors=row_cursors,
                                 row_expand=row_expand, q32=q32,
                                 skip_expand=skip_expand,
                                 skip_drain=skip_drain)
        if compact_window > 1:
            from rust_renderer_tpu.ops.compaction import traverse_compacted

            return functools.partial(traverse_compacted,
                                     window_blocks=compact_window, trav=trav,
                                     order=compact_order)
        return trav
    return traverse_packet if packet else traverse


def make_closest_hit(bvh: BVH, packet: bool = True, sort: bool = False,
                     wide: bool = True, ordered: bool = False,
                     compact_window: int = 0, steady_drain: int = 3,
                     compact_order: str = "morton",
                     row_cursors: int = 8, row_expand: int = 2,
                     q32: bool = False, skip_drain: bool = True):
    """closest_hit(scene, o, d, t_min, t_max) -> Hit, BVH for triangles plus
    the scene's analytic spheres (signature-compatible with
    intersect.closest_hit_bruteforce so ops/pathtrace.py can swap backends).
    packet=True uses coherent packet traversal (~40x faster on TPU); on TPU
    with VMEM-sized trees the Pallas BVH8 kernel is selected automatically
    (wide=False keeps the round-1 binary skip walk; ordered=True pushes
    children near-first). sort=True re-orders rays for coherence.
    compact_window=N (N>=2) applies windowed live-lane compaction on the
    Pallas path (ops/compaction.py) — late bounce fronts with clustered
    dead lanes skip whole blocks.
    steady_drain=D (default 3) selects the dual-expand steady-drain kernel
    (_make_kernel_wide_sdd): each iteration retires up to 32 boxes + D
    queued leaf rows per vector->scalar extract. TPU-measured round 3
    (tools/bench_fronts.py, real captured fronts): beats the cond-guarded
    pop kernel on every bounce front (closest b1-b4 sum 224->205 ms plain;
    183 ms composed with compact_window=16). steady_drain=0 restores the
    round-2 kernel.
    compact_order="morton" (default) sorts each compaction window's live
    lanes by origin Morton code — narrower per-block union walks; measured
    -10..-14% on late closest fronts, free (shares the dead-bit sort key,
    ops/compaction.py).
    row_cursors=G (default 8) selects the row-cursor kernel
    (_make_kernel_wide_row): G independent cursors per block, each owning
    1024/G lanes of the Morton-compacted order, so each sublane group walks
    ITS OWN union instead of the whole block's. TPU-measured round 3
    (tools/bench_fronts.py wrc64e2 vs prod wsm64d3, real 1024² fronts):
    closest b1-b4 0.53-0.57x, camera front par. Falls back to steady-drain
    automatically for trees without collapse metadata, DMA-leaf scale, or
    >64k wide nodes. row_expand=2 (measured best vs 1) expansions/iter.
    skip_drain=True (round-5 default, tools/bench_fronts.py wrc64e2d3y):
    all-queues-empty iterations branch around the drain's 3x12-slot MT
    passes (phase stats measured drain slot utilization 27-54%); exact,
    measured -6..-13% on every closest front."""
    trav = _pick_traversal(bvh, packet, sort, wide, ordered,
                           dual=steady_drain > 0, steady_drain=steady_drain,
                           compact_window=compact_window,
                           compact_order=compact_order,
                           row_cursors=row_cursors, row_expand=row_expand,
                           q32=q32, skip_drain=skip_drain)

    def closest_hit(scene, origin, direction, t_min=1e-3, t_max=1e4) -> Hit:
        t, prim, u, v = trav(bvh, origin, direction, t_min, t_max)
        best = Hit(
            t=t,
            kind=jnp.where(prim >= 0, HIT_TRIANGLE, HIT_NONE),
            prim=jnp.maximum(prim, 0),
            u=u,
            v=v,
        )
        from rust_renderer_tpu.ops.intersect import _intersect_spheres

        return _intersect_spheres(scene, origin, direction, t_min, t_max, best)

    return closest_hit


def make_any_hit(bvh: BVH, packet: bool = True, sort: bool = False,
                 wide: bool = True, ordered: bool = False,
                 compact_window: int = 0, steady_drain: int = 3,
                 compact_order: str = "morton", seed_rows: int = 0,
                 row_cursors: int = 8, row_expand: int = 2,
                 q32: bool = False, skip_drain: bool = True,
                 skip_expand: bool = True):
    # steady_drain=3 + dual: the dual-expand steady-drain kernel
    # (_make_kernel_wide_sdd) — two 16-bit child masks fill the one
    # extracted int32, leaf rows drain LIFO D-per-iteration with no
    # lax.cond anywhere. TPU-measured round 3 on every real captured NEE
    # front (tools/bench_fronts.py): anyhit b1-b4 sum 238->206 ms plain,
    # 163 ms composed with compact_window=16. steady_drain=0 restores the
    # round-2 dual-pop kernel (two cond-guarded pops per extract).
    # drain_first: leaf rows drain BEFORE the expand — measured -2..-12%
    # on every real any-hit front (wash on closest, so only wired here).
    # compact_order="morton": origin-Morton window ordering, measured
    # -20..-30% on real NEE any-hit fronts (tools/bench_fronts.py wsmf16).
    # seed_rows=K pre-tests every ray against the K largest-area leaf rows
    # (make_seed_test): already-occluded lanes get zero directions, retire
    # at the degenerate-ray guard, and windowed compaction drops them —
    # only genuinely-hard occlusion rays walk the tree. Exact.
    # row_cursors=8: the row-cursor kernel (see make_closest_hit);
    # TPU-measured on real NEE fronts (wrc64e2 vs wsm64d3) anyhit b1-b4
    # 0.77-0.91x, camera front par. Auto-falls-back where unsupported.
    # skip_drain + skip_expand (round-5 defaults, wrc64e2d3xy): scalar
    # branches around the drain / expand vector phases when every queue /
    # stack is empty — phase stats measured any-hit drain utilization at
    # 22-29%; exact, measured -9..-11% on every NEE front.
    trav = _pick_traversal(bvh, packet, sort, wide, ordered, dual=True,
                           steady_drain=steady_drain,
                           compact_window=compact_window,
                           drain_first=steady_drain > 0,
                           compact_order=compact_order,
                           row_cursors=row_cursors, row_expand=row_expand,
                           q32=q32, skip_drain=skip_drain,
                           skip_expand=skip_expand)
    seed = make_seed_test(bvh, seed_rows) if seed_rows > 0 else None

    def any_hit(scene, origin, direction, t_min=1e-3, t_max=1e4):
        occ_seed = None
        if seed is not None:
            occ_seed = seed(origin, direction, t_min, t_max)
            direction = jnp.where(occ_seed[..., None], 0.0, direction)
        t, prim, _, _ = trav(bvh, origin, direction, t_min, t_max, any_hit=True)
        hit = prim >= 0
        if occ_seed is not None:
            hit = jnp.logical_or(hit, occ_seed)
        if scene.sphere_center.shape[0] > 0:
            from rust_renderer_tpu.ops.intersect import _intersect_spheres

            best = Hit(
                t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), t.shape),
                kind=jnp.zeros(t.shape, jnp.int32),
                prim=jnp.zeros(t.shape, jnp.int32),
                u=jnp.zeros(t.shape, jnp.float32),
                v=jnp.zeros(t.shape, jnp.float32),
            )
            sph = _intersect_spheres(scene, origin, direction, t_min, t_max, best)
            hit = jnp.logical_or(hit, sph.kind == HIT_SPHERE)
        return hit

    return any_hit
