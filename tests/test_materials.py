import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import materials, rng
from rust_renderer_tpu.scene import Material, MaterialType


def _scene_with(mats):
    r = rt.Renderer()
    for i, m in enumerate(mats):
        r.add_sphere([i * 10.0, 0.0, 0.0], 1.0, material=m)
    return r.pack()


def _run_scatter(scene, mat_ids, ray_dir, normal, seed=1):
    n = len(mat_ids)
    state = rng.init_rng(jnp.arange(n), jnp.zeros(n, jnp.int32), n, jnp.uint32(seed))

    @jax.jit
    def go(scene, state):
        uv = jnp.zeros((n, 2))
        return materials.scatter(
            scene, jnp.asarray(mat_ids, jnp.int32), ray_dir, normal, uv, state
        )

    return go(scene, state)


def test_lambertian_scatter_distribution():
    scene = _scene_with([Material(base_color_factor=np.array([0.5, 0.25, 1.0, 1.0], np.float32))])
    n = 2048
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    _, sc = _run_scatter(scene, [0] * n, d, nrm)
    dirs = np.asarray(sc.direction)
    # normal + unit_sphere: mean should be ~normal, all within 1 of normal.
    assert np.allclose(dirs.mean(0), [0, 1, 0], atol=0.06)
    assert np.all(np.linalg.norm(dirs - [0, 1, 0], axis=-1) < 1.0 + 1e-5)
    assert bool(np.asarray(sc.is_scattered).all())
    # Albedo = texture(white) * base_color_factor.
    np.testing.assert_allclose(np.asarray(sc.color)[0], [0.5, 0.25, 1.0], atol=1e-5)


def test_metal_mirror_reflection():
    scene = _scene_with([Material(material_type=MaterialType.METAL, material_property=0.0)])
    d = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    nrm = jnp.asarray([[0.0, 1.0, 0.0]])
    _, sc = _run_scatter(scene, [0], d, nrm)
    out = np.asarray(sc.direction)[0]
    np.testing.assert_allclose(out, np.array([1.0, 1.0, 0.0]) / np.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc.color)[0], [1, 1, 1])  # hardcoded white


def test_metal_fuzz_spreads():
    scene = _scene_with([Material(material_type=MaterialType.METAL, material_property=0.5)])
    n = 512
    d = jnp.tile(jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    _, sc = _run_scatter(scene, [0] * n, d, nrm)
    dirs = np.asarray(sc.direction)
    mirror = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    spread = np.linalg.norm(dirs - mirror, axis=-1)
    assert spread.max() < 0.5 + 1e-4  # bounded by fuzz radius
    assert spread.mean() > 0.1  # but actually spread out


def test_dielectric_snell_refraction():
    """Entering glass head-on-ish: check Snell's law with eta = 1/1.5 (the
    reference's always-flipped-normal convention, reference.rchit:61-81)."""
    scene = _scene_with([Material(material_type=MaterialType.DIELECTRIC, material_property=1.5)])
    n = 256
    theta_i = 0.3
    d = jnp.tile(
        jnp.asarray([[np.sin(theta_i), -np.cos(theta_i), 0.0]], dtype=jnp.float32), (n, 1)
    )
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    _, sc = _run_scatter(scene, [0] * n, d, nrm)
    dirs = np.asarray(sc.direction)
    # Most lanes refract (Schlick at 0.3 rad is ~4-6%); refracted angle
    # satisfies sin(theta_t) = sin(theta_i)/1.5.
    refracted = dirs[dirs[:, 1] < 0]
    assert len(refracted) > 0.8 * n
    sin_t = np.abs(refracted[:, 0]) / np.linalg.norm(refracted, axis=-1)
    np.testing.assert_allclose(sin_t, np.sin(theta_i) / 1.5, atol=1e-4)
    # And some reflect.
    assert (dirs[:, 1] > 0).sum() > 0


def test_diffuse_light_absorbs():
    scene = _scene_with([Material(material_type=MaterialType.DIFFUSE_LIGHT)])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    nrm = jnp.asarray([[0.0, 1.0, 0.0]])
    _, sc = _run_scatter(scene, [0], d, nrm)
    assert not bool(np.asarray(sc.is_scattered)[0])
    np.testing.assert_allclose(np.asarray(sc.color)[0], [1, 1, 1])


def test_schlick_reflectance_limits():
    r = materials.schlick_reflectance(jnp.float32(1.0), jnp.float32(1.0 / 1.5))
    r0 = ((1 - 1 / 1.5) / (1 + 1 / 1.5)) ** 2
    assert np.isclose(float(r), r0, atol=1e-6)
    grazing = materials.schlick_reflectance(jnp.float32(0.0), jnp.float32(1.0 / 1.5))
    assert float(grazing) > 0.99
