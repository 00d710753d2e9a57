"""SSAO: shift-stencil formulation vs the exact gather formulation.

ssao_stencil (ops/ssao.py) snaps each hemisphere tap to a static pixel
offset (8 directions x 6 log-spaced rings) so the pass is dense VPU work
with no per-pixel dynamic indices (the FXAA re-design applied to SSAO,
VERDICT r3 #3). It is an approximation by construction; these tests pin
the behavioral contract: open geometry stays unoccluded, concave corners
darken, and the field tracks the exact form closely in the mean.

Reference behavior spec: utopian/shaders/ssao/ssao.frag:31-113.
"""

import numpy as np
import jax.numpy as jnp

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import ssao as ssao_ops

H = W = 96


def _synthetic_gbuffer():
    """Raycast a floor (y=0) + back wall (z=-2) corner from a real camera so
    gbuffer positions are CONSISTENT with the projection (taps must land
    where the gbuffer says they do)."""
    cam = rt.Camera([0.0, 1.5, 3.0], [0.0, 0.0, -1.0], fov_degrees=60.0,
                    aspect_ratio=1.0, z_near=0.1, z_far=100.0)
    view = np.asarray(cam.get_view(), np.float32)
    proj = np.asarray(cam.get_projection(), np.float32)
    inv_v = np.linalg.inv(view)
    inv_p = np.linalg.inv(proj)
    ys, xs = np.mgrid[0:H, 0:W]
    ndc_x = (xs + 0.5) / W * 2.0 - 1.0
    ndc_y = -((ys + 0.5) / H * 2.0 - 1.0)  # FLIP_UV_Y convention
    clip = np.stack([ndc_x, ndc_y, np.ones_like(ndc_x),
                     np.ones_like(ndc_x)], -1)
    vdir = clip @ inv_p.T
    vdir = vdir[..., :3] / vdir[..., 3:4]
    wdir = vdir @ inv_v[:3, :3].T
    wdir /= np.linalg.norm(wdir, axis=-1, keepdims=True)
    org = inv_v[:3, 3]

    pos = np.full((H, W, 3), 1.0, np.float32)
    nrm = np.zeros((H, W, 3), np.float32)
    t_floor = np.where(wdir[..., 1] < -1e-6, -org[1] / wdir[..., 1], np.inf)
    t_wall = np.where(wdir[..., 2] < -1e-6, (-2.0 - org[2]) / wdir[..., 2],
                      np.inf)
    t = np.minimum(t_floor, t_wall)
    hit = np.isfinite(t)
    p = org + wdir * t[..., None]
    is_floor = (t_floor <= t_wall) & hit
    pos[hit] = p[hit]
    nrm[is_floor] = [0.0, 1.0, 0.0]
    nrm[hit & ~is_floor] = [0.0, 0.0, 1.0]
    pos4 = np.concatenate([pos, np.ones((H, W, 1), np.float32)], -1)
    nrm4 = np.concatenate([nrm, np.zeros((H, W, 1), np.float32)], -1)
    return (jnp.asarray(pos4), jnp.asarray(nrm4), jnp.asarray(view),
            jnp.asarray(proj), is_floor, hit)


def test_stencil_tracks_exact():
    pos, nrm, view, proj, is_floor, hit = _synthetic_gbuffer()
    exact = np.asarray(ssao_ops.ssao(pos, nrm, view, proj,
                                     jnp.float32(0.3), jnp.float32(0.025)))
    sten = np.asarray(ssao_ops.ssao_stencil(pos, nrm, view, proj,
                                            jnp.float32(0.3),
                                            jnp.float32(0.025)))
    assert np.isfinite(sten).all()
    # Field-level agreement (the stencil is a tap-position approximation).
    assert abs(float(exact[hit].mean() - sten[hit].mean())) < 0.06
    assert float(np.abs(exact[hit] - sten[hit]).mean()) < 0.12


def test_corner_darkens_open_floor_does_not():
    pos, nrm, view, proj, is_floor, hit = _synthetic_gbuffer()
    sten = np.asarray(ssao_ops.ssao_stencil(pos, nrm, view, proj,
                                            jnp.float32(0.3),
                                            jnp.float32(0.025)))
    pos_np = np.asarray(pos)
    # Open floor: well in front of the wall.
    open_floor = is_floor & (pos_np[..., 2] > -0.8)
    # Corner band: floor pixels within 0.25 world units of the wall.
    corner = is_floor & (pos_np[..., 2] < -1.75)
    assert open_floor.sum() > 50 and corner.sum() > 50
    assert float(sten[open_floor].mean()) > 0.92
    assert float(sten[corner].mean()) < float(sten[open_floor].mean()) - 0.1


def test_sky_pixels_unoccluded():
    pos, nrm, view, proj, _is_floor, hit = _synthetic_gbuffer()
    sten = np.asarray(ssao_ops.ssao_stencil(pos, nrm, view, proj,
                                            jnp.float32(0.3),
                                            jnp.float32(0.025)))
    if (~hit).sum():
        np.testing.assert_array_equal(sten[~hit], 1.0)
