"""Pallas traversal kernel vs XLA packet traversal.

On CPU the Mosaic kernel runs in interpreter mode (slow but exact), keeping
this covered in the default suite; on TPU it compiles natively.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rust_renderer_tpu.ops import bvh as bvhmod


def _soup_bvh(n=150, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e = rng.uniform(-0.8, 0.8, (n, 2, 3)).astype(np.float32)
    pos = np.concatenate([base, base + e[:, 0], base + e[:, 1]], 1).reshape(-1, 3)
    idx = np.arange(n * 3, dtype=np.int32).reshape(-1, 3)
    return bvhmod.build_bvh(pos, idx)


def _rays(n=1024, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def _pallas_traverse(b, o, d, **kw):
    from rust_renderer_tpu.ops.pallas import traversal as ptrav
    from jax.experimental import pallas as pl

    if jax.devices()[0].platform == "cpu":
        import functools
        orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        ptrav.pl.pallas_call = patched
        try:
            return ptrav.traverse_packet_pallas(b, o, d, **kw)
        finally:
            ptrav.pl.pallas_call = orig
    return ptrav.traverse_packet_pallas(b, o, d, **kw)


def test_pallas_matches_xla_closest():
    b = _soup_bvh()
    o, d = _rays()
    t1, p1, u1, v1 = _pallas_traverse(b, o, d)
    t2, p2, u2, v2 = bvhmod.traverse_packet(b, o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-6)


def test_pallas_matches_xla_any_hit():
    b = _soup_bvh(seed=3)
    o, d = _rays(seed=4)
    t1, p1, _, _ = _pallas_traverse(b, o, d, any_hit=True)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    np.testing.assert_array_equal(np.asarray(p1) >= 0, np.asarray(p2) >= 0)


def test_pallas_eligibility_gate():
    b = _soup_bvh()
    # On CPU the auto-backend must NOT pick the Mosaic kernel.
    if jax.devices()[0].platform == "cpu":
        assert not bvhmod._pallas_eligible(b)


def test_pallas_binary_matches_xla():
    """The round-1 binary skip walk stays available (wide=False)."""
    b = _soup_bvh(seed=5)
    o, d = _rays(seed=6)
    t1, p1, _, _ = _pallas_traverse(b, o, d, wide=False)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pallas_wide_ordered_matches():
    b = _soup_bvh(seed=7)
    o, d = _rays(seed=8)
    t1, p1, _, _ = _pallas_traverse(b, o, d, wide=True, ordered=True)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-6)


def test_pallas_wide_degenerate_and_tmax():
    """Zero-direction lanes retire; per-ray t_max is honored (NEE shadows)."""
    b = _soup_bvh(seed=9)
    o, d = _rays(seed=10)
    d = d.at[::3].set(0.0)  # every third lane degenerate
    tmax = jnp.full(o.shape[0], 2.5)
    t1, p1, _, _ = _pallas_traverse(b, o, d, t_max=tmax, wide=True)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d, t_max=tmax)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert np.all(np.asarray(p1)[::3] == -1)


def test_pallas_dual_pop_matches():
    """The dual-pop kernel (two stack pops share one vector->scalar
    extract) is exact vs the XLA packet walk, closest and any-hit,
    including degenerate lanes and per-ray t_max."""
    b = _soup_bvh(seed=17)
    o, d = _rays(seed=18)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    t1, p1, _, _ = _pallas_traverse(b, o, d, dual=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)
    d = d.at[::4].set(0.0)
    tmax = jnp.full(o.shape[0], 3.0)
    ta, pa, _, _ = _pallas_traverse(b, o, d, t_max=tmax, any_hit=True,
                                    dual=True)
    tb, pb, _, _ = bvhmod.traverse_packet(b, o, d, t_max=tmax, any_hit=True)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, np.asarray(pb) >= 0)
    assert np.all(np.asarray(pa)[::4] == -1)


def test_pallas_dual_pop_dma_leaf_matches():
    b = _soup_bvh(seed=19)
    o, d = _rays(seed=20)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    t1, p1, _, _ = _pallas_traverse(b, o, d, dual=True, dma_leaf=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)


def test_pallas_leaf_queue_matches():
    """The leaf-queue kernel (leaf children deferred to an SMEM queue,
    flushed up to W rows per cond branch) is exact vs the XLA packet walk.

    Interpret mode re-walks the unrolled flush jaxpr every while
    iteration (minutes per call on this host; the any-hit variant is
    slower still), so the default-suite case is a tiny closest-only soup;
    any-hit / flush-size sweep / DMA coverage runs on TPU only."""
    b = _soup_bvh(n=24, seed=23)
    o, d = _rays(seed=24)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    t1, p1, _, _ = _pallas_traverse(b, o, d, leaf_queue=4)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)


@pytest.mark.slow
def test_pallas_leaf_queue_sweep_tpu():
    """Any-hit + flush-size sweep + DMA-leaf lq coverage — native TPU only
    (interpret-mode evaluation of the flush jaxpr is pathologically slow;
    the kernel itself was verified exact on TPU)."""
    if jax.devices()[0].platform == "cpu":
        pytest.skip("lq any-hit/sweep coverage needs the native TPU backend")
    b = _soup_bvh(n=60, seed=25)
    o, d = _rays(seed=26)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    for k in (1, 8):
        t1, p1, _, _ = _pallas_traverse(b, o, d, leaf_queue=k)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    t1, p1, _, _ = _pallas_traverse(b, o, d, leaf_queue=4, dma_leaf=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    ta, pa, _, _ = _pallas_traverse(b, o, d, any_hit=True, leaf_queue=4)
    tb, pb, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, np.asarray(pb) >= 0)


def test_pallas_steady_drain_matches():
    """The steady-drain kernel (branch-free body: one masked internal
    expand + `drain` masked leaf-row tests per iteration) is exact vs the
    XLA packet walk. Interpret mode replays the full unrolled body per
    iteration, so the default-suite case is a tiny closest-only soup;
    any-hit / drain sweep / queue-depth coverage runs on TPU only."""
    b = _soup_bvh(n=24, seed=27)
    o, d = _rays(seed=28)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    t1, p1, _, _ = _pallas_traverse(b, o, d, steady_drain=2)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)
    # dual-expand steady drain (sdd): two 16-bit masks share the extract
    t3, p3, _, _ = _pallas_traverse(b, o, d, steady_drain=2, dual=True)
    np.testing.assert_array_equal(np.asarray(p3), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(t3)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)
    # any-hit sdd runs to natural drain-out (no alive bit) — same hits
    tb, pb, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    ta, pa, _, _ = _pallas_traverse(b, o, d, any_hit=True, steady_drain=3,
                                    dual=True)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, np.asarray(pb) >= 0)
    # drain-FIRST sdd: rows drain one iteration later — still exact
    t4, p4, _, _ = _pallas_traverse(b, o, d, steady_drain=2, dual=True,
                                    drain_first=True)
    np.testing.assert_array_equal(np.asarray(p4), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(t4)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)
    ta, pa, _, _ = _pallas_traverse(b, o, d, any_hit=True, steady_drain=3,
                                    dual=True, drain_first=True)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, np.asarray(pb) >= 0)


def test_pallas_row_cursor_matches():
    """The row-cursor kernel (8 per-sublane cursors, single-word mask
    stack/queue entries decoded via ffs + popcount against wnode_meta) is
    exact vs the XLA packet walk — closest and any-hit, both expand
    widths, degenerate lanes and per-ray t_max. Tiny soup: interpret mode
    replays the unrolled body per iteration."""
    b = _soup_bvh(n=24, seed=31)
    assert b.wnode_meta is not None
    o, d = _rays(seed=32)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    hit = np.asarray(p2) >= 0
    for expand in (1, 2):
        t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8,
                                        row_expand=expand)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_allclose(np.asarray(t1)[hit],
                                   np.asarray(t2)[hit], rtol=1e-6)
    tb, pb, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    ta, pa, _, _ = _pallas_traverse(b, o, d, any_hit=True, row_cursors=8)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, np.asarray(pb) >= 0)


def test_pallas_row_cursor_kill_and_skip_expand():
    """The two leaf-term levers (VERDICT r4 #3) stay EXACT: cursor_kill
    clears all-done sublanes' stacks/queues (any-hit semantics only —
    'done' is terminal there), and skip_expand branches around the expand
    vector work when every stack is empty (words are provably zero then).
    Both must reproduce the baseline kernel bit-for-bit."""
    b = _soup_bvh(n=24, seed=31)
    o, d = _rays(seed=32)
    # Make some packets retire early so cursor_kill actually fires.
    d = d.at[:256].set(0.0)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    hit = np.asarray(p2) >= 0
    for ckw in (dict(skip_expand=True), dict(skip_drain=True),
                dict(skip_expand=True, skip_drain=True),
                # Sponza-scale composition: the drain's async row copies
                # live INSIDE the skip branch (DMA under lax.cond).
                dict(skip_drain=True, dma_leaf=True)):
        t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8, **ckw)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                                   rtol=1e-6)
    tb, pb, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    for kw in (dict(cursor_kill=True),
               dict(cursor_kill=True, skip_expand=True),
               dict(skip_drain=True, skip_expand=True)):
        ta, pa, _, _ = _pallas_traverse(b, o, d, any_hit=True,
                                        row_cursors=8, **kw)
        np.testing.assert_array_equal(np.asarray(pa) >= 0,
                                      np.asarray(pb) >= 0)


def test_pallas_row_cursor_expand3():
    """expand>=3 packs hit bits into a SECOND word (int32 shifts >= 32
    silently drop the third expansion's hits — this caught a real bug:
    a deep-enough tree mismatched 46/1024 rays before the second word)."""
    b = _soup_bvh(n=300, seed=7)
    o, d = _rays(seed=8)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    hit = np.asarray(p2) >= 0
    for expand in (3, 4):
        t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8,
                                        row_expand=expand)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        np.testing.assert_allclose(np.asarray(t1)[hit],
                                   np.asarray(t2)[hit], rtol=1e-6)


def test_pallas_row_cursor_dma_leaf_matches():
    """Row-cursor kernel with the leaf table in HBM: each drain slot's 8
    cursor rows arrive by pipelined async copy (the Sponza-scale mode)."""
    b = _soup_bvh(n=24, seed=41)
    o, d = _rays(seed=42)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8, dma_leaf=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)
    tb, pb, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    ta, pa, _, _ = _pallas_traverse(b, o, d, any_hit=True, row_cursors=8,
                                    dma_leaf=True)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, np.asarray(pb) >= 0)


def test_pallas_row_cursor_with_multi_is_correct():
    """ADVICE r3: row_cursors composed with multi>1 used to build
    multi-sized BlockSpecs over a b-step grid (out-of-range blocks /
    wrong results). multi is now forced off on the row path."""
    b = _soup_bvh(n=24, seed=51)
    o, d = _rays(n=4096, seed=52)
    t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8, multi=4)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)


def test_pallas_row_cursor_overflow_stats():
    """ADVICE r3: the RC_SCAP/RC_QCAP overflow clamps must be observable.
    overflow_stats=True returns a 5th per-block diagnostic (row 0 =
    clamped stack pushes, row 1 = clamped queue pushes): zero on a
    normal scene with untouched results; nonzero when the queue capacity
    is artificially strangled."""
    from rust_renderer_tpu.ops.pallas import traversal as ptrav

    b = _soup_bvh(n=60, seed=61)
    o, d = _rays(seed=62)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    t1, p1, _, _, ovf = _pallas_traverse(b, o, d, row_cursors=8,
                                         overflow_stats=True)
    assert ovf is not None and int(np.asarray(ovf).sum()) == 0
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    # Strangle the queue: every multi-leaf-row mask entry now clamps.
    orig_qcap = ptrav.RC_QCAP
    ptrav._run.clear_cache()
    try:
        ptrav.RC_QCAP = 1
        _, _, _, _, ovf2 = _pallas_traverse(b, o, d, row_cursors=8,
                                            overflow_stats=True)
        assert int(np.asarray(ovf2).sum()) > 0
    finally:
        ptrav.RC_QCAP = orig_qcap
        ptrav._run.clear_cache()


def test_pallas_row_cursor_deep_tree_falls_back():
    """Trees whose static stack bound exceeds RC_SCAP fall back to the
    steady-drain kernel (still exact) instead of silently clamping."""
    from rust_renderer_tpu.ops.pallas import traversal as ptrav

    b = _soup_bvh(n=24, seed=63)
    o, d = _rays(seed=64)
    orig = ptrav.RC_SCAP
    try:
        ptrav.RC_SCAP = 1  # forces too_deep for any real tree
        t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8)
    finally:
        ptrav.RC_SCAP = orig
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pallas_row_cursor_degenerate_and_tmax():
    b = _soup_bvh(n=24, seed=33)
    o, d = _rays(seed=34)
    d = d.at[::3].set(0.0)
    tmax = jnp.full(o.shape[0], 2.5)
    t1, p1, _, _ = _pallas_traverse(b, o, d, t_max=tmax, row_cursors=8)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d, t_max=tmax)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert np.all(np.asarray(p1)[::3] == -1)


def test_wnode_meta_decodes_the_wide_tree():
    """wnode_meta invariants: decoding every node's static masks against
    the packed refs reproduces the child pointers and leaf rows, children
    are contiguous, and the synthetic root row expands node 0."""
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W

    b = _soup_bvh(n=150, seed=35)
    wn = np.asarray(b.wnode_packed)
    refs = wn[:, 6 * W:7 * W].view(np.int32)
    meta = np.asarray(b.wnode_meta)
    assert meta.shape == (wn.shape[0] + 1, 3)
    assert meta[-1, 0] == 0 and meta[-1, 2] == 1 << (W - 1)
    for n in range(wn.shape[0]):
        int_last, leaf_last, masks = meta[n]
        st_int = int(masks) & 0xFFFF
        st_leaf = (int(masks) >> 16) & 0xFFFF
        for slot in range(W):
            bit = 1 << (W - 1 - slot)
            r = int(refs[n, slot])
            if r == WIDE_EMPTY:
                assert not (st_int & bit) and not (st_leaf & bit)
            elif r >= 0:
                assert st_int & bit
                after = bin(st_int & (bit - 1)).count("1")
                assert int_last - after == r
            else:
                assert st_leaf & bit
                after = bin(st_leaf & (bit - 1)).count("1")
                assert leaf_last - after == -2 - r


@pytest.mark.slow
def test_pallas_steady_drain_sweep_tpu():
    """Any-hit + drain sweep + DMA + queue-headroom coverage — native TPU
    only (interpret mode is pathologically slow on while-loop kernels)."""
    if jax.devices()[0].platform == "cpu":
        pytest.skip("sd sweep coverage needs the native TPU backend")
    from rust_renderer_tpu.ops.pallas.traversal import SD_QCAP
    b = _soup_bvh(n=60, seed=29)
    o, d = _rays(seed=30)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    for drain in (1, 2, 3):
        t1, p1, _, _ = _pallas_traverse(b, o, d, steady_drain=drain)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    for drain in (2, 3, 4):  # dual-expand steady drain
        t1, p1, _, _ = _pallas_traverse(b, o, d, steady_drain=drain,
                                        dual=True)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    t1, p1, _, _ = _pallas_traverse(b, o, d, steady_drain=2, dma_leaf=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    tb, pb, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    for kw in (dict(steady_drain=2), dict(steady_drain=3, dual=True)):
        ta, pa, _, _ = _pallas_traverse(b, o, d, any_hit=True, **kw)
        np.testing.assert_array_equal(np.asarray(pa) >= 0,
                                      np.asarray(pb) >= 0)
    # queue headroom: stats row 2 carries the peak queue depth
    out = _pallas_traverse(b, o, d, steady_drain=2, stats=True)
    max_q = int(np.asarray(out[4])[:, 2, 0].max())
    assert max_q < SD_QCAP // 2, max_q


def test_pallas_multi_block_matches():
    """The latency-interleaved kernel (multi ray blocks per grid step) is
    exact vs the XLA packet walk at every interleave width."""
    b = _soup_bvh(seed=13)
    o, d = _rays(seed=14)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    for m in (1, 2, 4):
        t1, p1, _, _ = _pallas_traverse(b, o, d, multi=m)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        hit = np.asarray(p1) >= 0
        np.testing.assert_allclose(
            np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-6
        )


def test_pallas_dma_leaf_matches():
    """The at-scale mode (leaf table in HBM, one row DMA'd per leaf pop)
    is exact vs the VMEM-resident walk."""
    b = _soup_bvh(seed=21)
    o, d = _rays(seed=22)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    t1, p1, _, _ = _pallas_traverse(b, o, d, dma_leaf=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)
    # any-hit + multi-block dma
    ta, pa, _, _ = _pallas_traverse(b, o, d, any_hit=True, dma_leaf=True,
                                    multi=2)
    tb, pb, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, np.asarray(pb) >= 0)


def test_pallas_multi_block_any_hit_and_degenerate():
    b = _soup_bvh(seed=15)
    o, d = _rays(seed=16)
    d = d.at[::5].set(0.0)
    tmax = jnp.full(o.shape[0], 3.0)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d, t_max=tmax, any_hit=True)
    t1, p1, _, _ = _pallas_traverse(
        b, o, d, t_max=tmax, any_hit=True, multi=4
    )
    np.testing.assert_array_equal(np.asarray(p1) >= 0, np.asarray(p2) >= 0)
    assert np.all(np.asarray(p1)[::5] == -1)


def test_wide_collapse_structure():
    """Every triangle is reachable exactly once through the wide tree."""
    b = _soup_bvh(seed=11)
    width = bvhmod.WIDE_WIDTH
    w = np.asarray(b.wnode_packed)
    refs = w[:, 6 * width:7 * width].view(np.int32)
    leaf_rows = []
    stack = [0]
    seen_nodes = set()
    while stack:
        n = stack.pop()
        assert n not in seen_nodes, "wide tree has a cycle"
        seen_nodes.add(n)
        for r in refs[n]:
            if r == bvhmod.WIDE_EMPTY:
                continue
            if r >= 0:
                stack.append(int(r))
            else:
                leaf_rows.append(-2 - int(r))
    assert sorted(leaf_rows) == sorted(set(leaf_rows)), "leaf row repeated"
    tris = np.asarray(b.leaf_tris)[leaf_rows]
    tris = tris[tris >= 0]
    n_tris = int(np.asarray(b.leaf_tris).max()) + 1
    assert sorted(tris.tolist()) == list(range(n_tris))


def test_windowed_compaction_matches():
    """traverse_compacted permutes live lanes first within windows, walks,
    and restores order — results must be exactly the plain walk's,
    including dead (zero-direction) lanes staying prim=-1."""
    from rust_renderer_tpu.ops import compaction

    b = _soup_bvh(seed=31)
    o, d = _rays(n=2048, seed=32)
    d = d.at[::3].set(0.0)  # scattered dead lanes across both blocks

    t0, p0, u0, v0 = _pallas_traverse(b, o, d)

    from rust_renderer_tpu.ops.pallas import traversal as ptrav
    from jax.experimental import pallas as pl

    if jax.devices()[0].platform == "cpu":
        orig = pl.pallas_call

        def patched(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

    for method, order in (("sort", "live"), ("sort", "morton"),
                          ("scatter", "live")):
        if jax.devices()[0].platform == "cpu":
            orig = pl.pallas_call

            def patched(*a, **k):
                k["interpret"] = True
                return orig(*a, **k)

            ptrav.pl.pallas_call = patched
            try:
                t1, p1, u1, v1 = compaction.traverse_compacted(
                    b, o, d, window_blocks=2, method=method, order=order)
            finally:
                ptrav.pl.pallas_call = orig
        else:
            t1, p1, u1, v1 = compaction.traverse_compacted(
                b, o, d, window_blocks=2, method=method, order=order)
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p0))
        hit = np.asarray(p0) >= 0
        np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t0)[hit],
                                   rtol=1e-6)
        assert np.all(np.asarray(p1)[::3] == -1)

    # occlusion flavor: only prim is restored (t/u/v documented zeros)
    ta0, pa0, _, _ = _pallas_traverse(b, o, d, any_hit=True)
    if jax.devices()[0].platform == "cpu":
        ptrav.pl.pallas_call = patched
        try:
            _, pa1, _, _ = compaction.traverse_compacted(
                b, o, d, window_blocks=2, method="sort", any_hit=True)
        finally:
            ptrav.pl.pallas_call = orig
    else:
        _, pa1, _, _ = compaction.traverse_compacted(
            b, o, d, window_blocks=2, method="sort", any_hit=True)
    np.testing.assert_array_equal(np.asarray(pa1) >= 0, np.asarray(pa0) >= 0)


def test_seed_occlusion_matches():
    """make_seed_test kills only genuinely-occluded lanes: traversing the
    survivors and OR-ing the seed verdict must reproduce the plain any-hit
    answer exactly (the make_any_hit seed_rows mechanism)."""
    b = _soup_bvh(n=400, seed=41)
    o, d = _rays(2048, seed=42)

    _, p0, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    base_occ = np.asarray(p0) >= 0

    seed = bvhmod.make_seed_test(b, 4)
    assert seed is not None
    occ = np.asarray(seed(o, d, 1e-3, 1e4))
    # seed verdicts are a subset of true occlusions
    assert not np.any(occ & ~base_occ)

    d2 = jnp.where(jnp.asarray(occ)[..., None], 0.0, d)
    _, p1, _, _ = bvhmod.traverse_packet(b, o, d2, any_hit=True)
    combined = (np.asarray(p1) >= 0) | occ
    np.testing.assert_array_equal(combined, base_occ)
    assert occ.any(), "seed rows never fired — test scene too sparse"


def test_window_forward_map():
    from rust_renderer_tpu.ops import compaction

    live = jnp.asarray([True, False, True, False, False, True, True, True])
    fwd = np.asarray(compaction.window_forward_map(live, 4))
    # window 0: live lanes 0,2 -> slots 0,1; dead 1,3 -> 2,3
    # window 1: lane 4 dead -> slot 7; lanes 5,6,7 live -> 4,5,6
    np.testing.assert_array_equal(fwd, [0, 2, 1, 3, 7, 4, 5, 6])


# -- quantized width-32 row-cursor kernel (wnode_q32) -------------------------


def test_pallas_q32_matches_closest():
    """Conservative 16-bit quantization must be EXACT: the q32 walk visits
    a superset of the f32 walk's nodes and triangle tests decide."""
    b = _soup_bvh(n=150, seed=71)
    o, d = _rays(n=2048, seed=72)
    t1, p1, u1, v1 = _pallas_traverse(b, o, d, row_cursors=8, q32=True,
                                      row_expand=1)
    t2, p2, u2, v2 = bvhmod.traverse_packet(b, o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u1)[hit], np.asarray(u2)[hit],
                               rtol=1e-5, atol=1e-6)


def test_pallas_q32_matches_any_hit():
    b = _soup_bvh(n=120, seed=73)
    o, d = _rays(seed=74)
    t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8, q32=True,
                                    any_hit=True)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d, any_hit=True)
    np.testing.assert_array_equal(np.asarray(p1) >= 0, np.asarray(p2) >= 0)


def test_pallas_q32_expand2():
    b = _soup_bvh(n=90, seed=75)
    o, d = _rays(seed=76)
    t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8, q32=True,
                                    row_expand=2)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pallas_q32_dma_leaf():
    b = _soup_bvh(n=100, seed=77)
    o, d = _rays(seed=78)
    t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8, q32=True,
                                    dma_leaf=True)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit],
                               rtol=1e-6)


def test_pallas_q32_degenerate_and_tmax():
    b = _soup_bvh(n=60, seed=79)
    o, d = _rays(seed=80)
    d = d.at[::5].set(0.0)  # degenerate rays must retire, not hang
    t1, p1, _, _ = _pallas_traverse(b, o, d, row_cursors=8, q32=True,
                                    t_max=4.0)
    t2, p2, _, _ = bvhmod.traverse_packet(b, o, d, t_max=4.0)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert (np.asarray(p1)[::5] == -1).all()


def test_q32_quantization_is_conservative():
    """Every dequantized child box must contain its f32 box (2-ulp grid
    widening + one quantization step of padding per side)."""
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, _collapse_wide

    b = _soup_bvh(n=200, seed=81)
    packed, _, _, _ = _collapse_wide(
        np.asarray(b.node_min), np.asarray(b.node_max),
        np.asarray(b.node_miss), np.asarray(b.node_leaf), width=32)
    q = np.asarray(b.wnode_q32).view(np.uint32)
    n = q.shape[0]
    boxes = packed[:, :6 * 32].reshape(n, 6, 32)
    refs = packed[:, 6 * 32:].view(np.int32)
    origin = q[:, 96:99].view(np.float32).reshape(n, 3)
    scale = q[:, 99:102].view(np.float32).reshape(n, 3)
    qlo = np.stack([q[:, 0:32] & 0xFFFF, q[:, 0:32] >> 16,
                    q[:, 32:64] & 0xFFFF], 1).astype(np.float64)
    qhi = np.stack([q[:, 32:64] >> 16, q[:, 64:96] & 0xFFFF,
                    q[:, 64:96] >> 16], 1).astype(np.float64)
    lo_dq = origin[:, :, None] + qlo * scale[:, :, None]
    hi_dq = origin[:, :, None] + qhi * scale[:, :, None]
    valid = (refs != WIDE_EMPTY)[:, None, :] & np.ones((1, 3, 1), bool)
    assert (lo_dq[valid] <= boxes[:, 0:3, :][valid] + 1e-30).all()
    assert (hi_dq[valid] >= boxes[:, 3:6, :][valid] - 1e-30).all()
