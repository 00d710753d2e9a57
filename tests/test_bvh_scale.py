"""Sponza-scale (>=250k triangle) BVH build + traversal sanity.

BASELINE configs 3/4 name Sponza (~260k tris, prototype/src/scenes.rs:102);
the upstream checkout lacks the LFS geometry, so create_sponza_scale_scene
tessellates the atrium stand-in to the same scale. This test proves the
native SAH builder, the wide collapse, and the VMEM-budget auto-selection
behave at that size (CPU: the budget gate must choose the XLA path without a
cliff; the Pallas-in-VMEM path is exercised on TPU by tools/bench_traversal
--scene sponza and bench.py)."""

import numpy as np
import jax.numpy as jnp

import rust_renderer_tpu as rt
from rust_renderer_tpu.models import create_sponza_scale_scene
from rust_renderer_tpu.ops import bvh as bvhmod


def _build():
    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    create_sponza_scale_scene(r, cam)
    scene = r.pack()
    # leaf_size 12 = the TPU/Pallas configuration (build_scene_bvh picks 4
    # on the CPU backend this suite runs under; the budget numbers below
    # are about the TPU tree).
    bvh = bvhmod.build_bvh(
        np.asarray(scene.positions), np.asarray(scene.indices), leaf_size=12
    )
    return scene, bvh, cam


def test_sponza_scale_build_and_budget():
    scene, bvh, _ = _build()
    n_tris = scene.indices.shape[0]
    assert n_tris >= 250_000, f"scale scene too small: {n_tris}"
    # Tree integrity at scale.
    assert bvh.max_depth < 64
    assert int(jnp.sum(bvh.leaf_tris >= 0)) == n_tris
    # VMEM tiles are (8,128): every row costs ceil(width/128)*512 B
    # regardless of logical width — hence 12-slot leaf rows (120/128 lanes)
    # and width-16 wide nodes (112/128 lanes). At Sponza scale the combined
    # tables exceed the full-residency budget (leaf occupancy ~0.75 is
    # structural), so the Pallas backend keeps the NODE table resident and
    # DMAs leaf rows from HBM per pop (mode "dma" on TPU).
    def vmem_mb(a):
        rows, cols = a.shape
        return rows * -(-cols // 128) * 512 / 1e6

    assert vmem_mb(bvh.wnode_packed) < 8.0, "node table must stay resident"
    assert vmem_mb(bvh.wnode_packed) + vmem_mb(bvh.leaf_packed) > 14.0, (
        "scene unexpectedly fits full residency — update this test to "
        "assert mode 'full'"
    )
    # On CPU the auto-select falls back cleanly (no Mosaic attempt); on TPU
    # the same tree picks mode "dma" (bench_traversal --scene sponza).
    assert bvhmod._pallas_mode(bvh) == "none"
    assert not bvhmod._pallas_eligible(bvh)


def test_sponza_scale_traversal_correct():
    scene, bvh, cam = _build()
    # A small probe front through the 260k-tri tree vs brute force.
    rng = np.random.default_rng(0)
    n = 64
    o = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    t, prim, u, v = bvhmod.traverse_packet(bvh, o, d)

    # Brute-force Möller-Trumbore reference, vectorized over all 260k tris.
    verts = np.asarray(scene.positions, np.float64)
    idx = np.asarray(scene.indices)
    v0 = verts[idx[:, 0]]
    e1 = verts[idx[:, 1]] - v0
    e2 = verts[idx[:, 2]] - v0
    on = np.asarray(o, np.float64)
    dn = np.asarray(d, np.float64)
    t_ref = np.full(n, np.inf)
    for k in range(n):
        p = np.cross(dn[k], e2)
        det = (e1 * p).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = on[k] - v0
        uu = (tv * p).sum(-1) * inv
        q = np.cross(tv, e1)
        vv = (dn[k] * q).sum(-1) * inv
        tt = (e2 * q).sum(-1) * inv
        ok &= (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 1e-3) & (tt < 1e4)
        if ok.any():
            t_ref[k] = tt[ok].min()
    hit = np.asarray(prim) >= 0
    assert np.array_equal(hit, np.isfinite(t_ref))
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-4)
