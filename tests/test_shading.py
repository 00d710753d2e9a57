"""PBR shading, shadows, SSAO, FXAA, IBL unit tests (SURVEY.md §4 item 1:
GGX/Fresnel vs closed forms, cascade-split math vs shadow.rs:40-46)."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.ops import brdf, fxaa as fxaa_ops, ibl as ibl_ops, shadow
from rust_renderer_tpu.ops.pbr import PixelParams, surface_shading
from rust_renderer_tpu.utils import math3d


# -- BRDF closed forms --------------------------------------------------------


def test_ggx_normal_incidence_peak():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    rough = jnp.asarray([0.5])
    d_aligned = brdf.distribution_ggx(n, n, rough)
    a = 0.5 * 0.5
    expected = (a * a) / (np.pi * ((a * a - 1) + 1) ** 2)
    assert np.isclose(float(d_aligned[0]), expected, rtol=1e-5)


def test_fresnel_schlick_limits():
    f0 = jnp.asarray([[0.04, 0.04, 0.04]])
    at_normal = brdf.fresnel_schlick(jnp.asarray([1.0]), f0)
    np.testing.assert_allclose(np.asarray(at_normal)[0], 0.04, atol=1e-6)
    grazing = brdf.fresnel_schlick(jnp.asarray([0.0]), f0)
    np.testing.assert_allclose(np.asarray(grazing)[0], 1.0, atol=1e-6)


def test_geometry_smith_bounds():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    v = jnp.asarray([[0.0, 0.0, 1.0]])
    g = brdf.geometry_smith(n, v, v, jnp.asarray([0.1]))
    assert 0.9 < float(g[0]) <= 1.0


def test_hammersley_first_points():
    pts = np.asarray(brdf.hammersley2d(jnp.arange(4), 4))
    np.testing.assert_allclose(pts[:, 0], [0, 0.25, 0.5, 0.75])
    np.testing.assert_allclose(pts[:, 1], [0, 0.5, 0.25, 0.75], atol=1e-6)


def test_importance_sample_ggx_concentrates_with_smoothness():
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (64, 1))
    i = jnp.arange(64)
    xi = brdf.hammersley2d(i, 64)
    smooth = np.asarray(brdf.importance_sample_ggx(xi, jnp.full((64,), 0.05), n))
    rough = np.asarray(brdf.importance_sample_ggx(xi, jnp.full((64,), 0.9), n))
    assert smooth[:, 2].mean() > rough[:, 2].mean()
    assert smooth[:, 2].mean() > 0.99


# -- surface shading ----------------------------------------------------------


def _pixel(n=(0, 1, 0), pos=(0, 0, 0), metallic=0.0, roughness=0.5):
    shape = (1,)
    return PixelParams(
        position=jnp.asarray([pos], jnp.float32),
        base_color=jnp.asarray([[0.8, 0.6, 0.4]]),
        normal=jnp.asarray([n], jnp.float32),
        metallic=jnp.full(shape, metallic),
        roughness=jnp.full(shape, roughness),
        occlusion=jnp.ones(shape),
    )


def test_point_light_inverse_square_falloff():
    def shade(d):
        return surface_shading(
            _pixel(),
            light_color=jnp.ones(3),
            light_pos=jnp.asarray([0.0, d, 0.0]),
            light_dir=jnp.zeros(3),
            light_type=jnp.float32(1.0),
            light_att=jnp.asarray([0.0, 0.0, 1.0]),  # pure quadratic
            light_spot=jnp.float32(0.0),
            eye_pos=jnp.asarray([0.0, 1.0, 1.0]),
        )

    near = np.asarray(shade(1.0)).sum()
    far = np.asarray(shade(2.0)).sum()
    assert 3.5 < near / far < 4.5


def test_directional_light_ndotl():
    out_up = surface_shading(
        _pixel(n=(0, 1, 0)),
        light_color=jnp.ones(3),
        light_pos=jnp.zeros(3),
        light_dir=jnp.asarray([0.0, 1.0, 0.0]),  # L = dir * (-1,1,-1) = up
        light_type=jnp.float32(0.0),
        light_att=jnp.ones(3),
        light_spot=jnp.float32(0.0),
        eye_pos=jnp.asarray([0.0, 1.0, 1.0]),
    )
    out_down = surface_shading(
        _pixel(n=(0, -1, 0)),
        light_color=jnp.ones(3),
        light_pos=jnp.zeros(3),
        light_dir=jnp.asarray([0.0, 1.0, 0.0]),
        light_type=jnp.float32(0.0),
        light_att=jnp.ones(3),
        light_spot=jnp.float32(0.0),
        eye_pos=jnp.asarray([0.0, 1.0, 1.0]),
    )
    assert np.asarray(out_up).sum() > 0.01
    assert np.asarray(out_down).sum() < 1e-6  # facing away -> NdotL = 0


# -- cascade math -------------------------------------------------------------


def test_cascade_splits_formula():
    """Exact log/uniform blend of shadow.rs:40-46."""
    near, far, lam = 0.01, 20000.0, 0.927
    splits = shadow.cascade_splits(near, far, 4, lam)
    clip_range = far - near
    ratio = far / near
    for i in range(4):
        p = (i + 1) / 4
        log = near * ratio**p
        uniform = near + clip_range * p
        d = lam * (log - uniform) + uniform
        assert np.isclose(splits[i], (d - near) / clip_range, rtol=1e-6)
    assert np.all(np.diff(splits) > 0)
    assert np.isclose(splits[-1], 1.0, atol=1e-6)


def test_cascade_matrices_contain_frustum_slice():
    cam_view = math3d.look_at_rh([0, 2, 5], [0, 0, 0], [0, 1, 0])
    cam_proj = math3d.perspective_rh(np.radians(60), 1.5, 0.1, 100.0)
    sun = np.array([0.3, 0.9, 0.3], np.float32)
    sun /= np.linalg.norm(sun)
    mats, depths = shadow.cascade_matrices(cam_view, cam_proj, 0.1, 100.0, sun)
    assert mats.shape == (4, 4, 4)
    assert np.all(np.diff(depths) > 0)
    # A world point in the first slice projects into the first cascade's box.
    p = np.array([0.0, 0.0, 2.0, 1.0])  # a few units in front of the camera
    clip = mats[0] @ p
    ndc = clip[:3] / clip[3]
    assert np.all(np.abs(ndc[:2]) <= 1.0)
    assert 0.0 <= ndc[2] <= 1.0


def test_calculate_shadow_occluded_vs_lit():
    size = 64
    # One cascade; light looks down -Y. Shadow map: near depth (0.3)
    # everywhere = occluder above the ground.
    vp = math3d.orthographic_rh(-5, 5, -5, 5, -10, 10) @ math3d.look_at_rh(
        [0, 5, 0], [0, 0, 0], [0, 0, -1]
    )
    sm_occluded = jnp.full((1, size, size), 0.0, jnp.float32)
    sm_clear = jnp.ones((1, size, size), jnp.float32)
    pos = jnp.asarray([[[0.0, 0.0, 0.0]]])
    view = jnp.asarray(math3d.look_at_rh([0, 1, 5], [0, 0, 0], [0, 1, 0]))
    f = jax.jit(
        lambda sm: shadow.calculate_shadow(
            pos, view, sm, jnp.asarray(vp)[None], jnp.asarray([1000.0])
        )[0]
    )
    assert np.isclose(float(f(sm_occluded)[0, 0]), shadow.SHADOW_FACTOR, atol=1e-5)
    assert np.isclose(float(f(sm_clear)[0, 0]), 1.0, atol=1e-5)


# -- FXAA ----------------------------------------------------------------------


def test_fxaa_smooths_hard_edge():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0
    # A diagonal-ish step: offset the edge by one pixel on odd rows.
    img[1::2, 15] = 1.0
    out = np.asarray(jax.jit(fxaa_ops.fxaa)(jnp.asarray(img)))
    # Intermediate values appear along the edge.
    edge_vals = out[:, 14:18, 0]
    assert ((edge_vals > 0.05) & (edge_vals < 0.95)).any()


def test_fxaa_disabled_is_identity():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(16, 16, 3)).astype(np.float32))
    out = jax.jit(lambda i: fxaa_ops.fxaa(i, 0.45, 0))(img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))


def test_fxaa_flat_region_untouched():
    img = jnp.full((16, 16, 3), 0.5)
    out = jax.jit(fxaa_ops.fxaa)(img)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


# -- IBL pipeline ---------------------------------------------------------------


def test_brdf_lut_known_values():
    lut = np.asarray(jax.jit(lambda: ibl_ops.brdf_lut(32, 128))())
    assert lut.shape == (32, 32, 2)
    assert np.all(lut >= 0) and np.all(lut[..., 0] <= 1.2)
    # Smooth surface at normal incidence: scale ~1, bias ~0.
    smooth_row = lut[1]  # near roughness 0 (row 0 = roughness ~0)
    assert smooth_row[-1, 0] > 0.9


def test_irradiance_of_uniform_env_is_uniform():
    env = jnp.ones((6, 16, 16, 3)) * 0.7
    irr = np.asarray(jax.jit(lambda e: ibl_ops.irradiance_convolution(e, 8, 0.1))(env))
    np.testing.assert_allclose(irr, 0.7, rtol=1e-2)


def test_specular_prefilter_preserves_uniform_env():
    env = [jnp.ones((6, 16 >> m, 16 >> m, 3)) * 0.5 for m in range(3)]
    spec = jax.jit(lambda *c: ibl_ops.specular_prefilter(list(c), 3, 16))(*env)
    for s in spec:
        np.testing.assert_allclose(np.asarray(s), 0.5, rtol=2e-2)
