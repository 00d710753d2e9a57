"""Tile-binned Pallas rasterizer vs the brute-force reference.

The binned path (ops/raster_binned.py) must produce the same depth buffer as
ops/raster.py's exact O(px·tris) loop — same clipping, both windings, min-z
LESS_OR_EQUAL semantics (pipeline.rs:286-310). Run in Pallas interpret mode
on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rust_renderer_tpu.ops import raster
from rust_renderer_tpu.ops import raster_binned


def _random_mesh(n, seed=0, spread=1.2):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n, 1, 3))
    tris = centers + rng.normal(0, 0.25, (n, 3, 3))
    verts = tris.reshape(-1, 3).astype(np.float32)
    idx = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    return verts, idx


def _proj(verts, z_off=3.0, persp=True):
    v = jnp.asarray(verts)
    if persp:
        f = 1.5
        clip = jnp.stack(
            [v[:, 0] * f, v[:, 1] * f,
             (v[:, 2] + z_off) * 0.5, (v[:, 2] + z_off)], axis=-1
        )
    else:  # ortho (the shadow-cascade case): w = 1
        clip = jnp.stack(
            [v[:, 0] * 0.6, v[:, 1] * 0.6,
             (v[:, 2] + z_off) * 0.2, jnp.ones_like(v[:, 0])], axis=-1
        )
    return clip


@pytest.mark.parametrize("persp", [True, False])
def test_binned_matches_bruteforce(persp):
    verts, idx = _random_mesh(300, seed=3)
    clip = _proj(verts, persp=persp)
    w, h = 96, 64
    ref = np.asarray(raster.rasterize_depth(clip, jnp.asarray(idx), w, h,
                                            method="brute"))
    out = np.asarray(
        raster_binned.rasterize_depth_binned(clip, jnp.asarray(idx), w, h,
                                             interpret=True)
    )
    assert out.shape == ref.shape
    # Edge-function vs barycentric formulations differ by float rounding on
    # boundary pixels; require exact agreement on the overwhelming majority
    # and close depth everywhere both are covered.
    both = (ref < 1.0) & (out < 1.0)
    assert both.mean() > 0.2, "coverage sanity"
    np.testing.assert_allclose(out[both], ref[both], atol=1e-4)
    disagree = (ref < 1.0) != (out < 1.0)
    assert disagree.mean() < 0.005, f"coverage mismatch {disagree.mean():.4%}"


def test_binned_big_triangle_goes_global():
    # One screen-filling floor triangle + small ones: exercises the GLOBAL
    # list (span > SPAN_X/SPAN_Y tiles).
    verts, idx = _random_mesh(50, seed=7)
    floor = np.asarray(
        [[-50, -50, 0.5], [50, -50, 0.5], [0, 80, 0.5]], np.float32
    )
    verts = np.concatenate([verts, floor])
    idx = np.concatenate(
        [idx, np.asarray([[150, 151, 152]], np.int32)]
    )
    clip = _proj(verts, persp=False)
    w, h = 128, 96
    ref = np.asarray(raster.rasterize_depth(clip, jnp.asarray(idx), w, h,
                                            method="brute"))
    out = np.asarray(
        raster_binned.rasterize_depth_binned(clip, jnp.asarray(idx), w, h,
                                             interpret=True)
    )
    both = (ref < 1.0) & (out < 1.0)
    assert both.mean() > 0.5  # the floor covers everything
    np.testing.assert_allclose(out[both], ref[both], atol=1e-4)


def test_binned_empty_scene():
    out = raster_binned.rasterize_depth_binned(
        jnp.zeros((0, 4)), jnp.zeros((0, 3), jnp.int32), 64, 32,
        interpret=True,
    )
    assert out.shape == (32, 64)
    assert np.allclose(np.asarray(out), 1.0)
