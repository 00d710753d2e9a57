import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import intersect, rays
from rust_renderer_tpu.scene import Material, MaterialType, ModelLoader


def _sphere_scene():
    r = rt.Renderer()
    r.add_sphere([0.0, 0.0, -3.0], 1.0, material=Material())
    r.add_sphere([0.0, 0.0, -6.0], 1.0, material=Material())
    return r.pack()


def _cube_scene():
    r = rt.Renderer()
    r.add_model(ModelLoader.load_cube(), np.eye(4, dtype=np.float32))
    return r.pack()


def test_ray_sphere_closest_of_two():
    scene = _sphere_scene()
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = jax.jit(intersect.closest_hit_bruteforce)(scene, o, d)
    assert bool(hit.is_hit[0])
    assert int(hit.kind[0]) == intersect.HIT_SPHERE
    assert int(hit.prim[0]) == 0
    assert np.isclose(float(hit.t[0]), 2.0, atol=1e-4)


def test_ray_sphere_inside_hits_backside():
    scene = _sphere_scene()
    o = jnp.asarray([[0.0, 0.0, -3.0]])  # center of first sphere
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = jax.jit(intersect.closest_hit_bruteforce)(scene, o, d)
    assert np.isclose(float(hit.t[0]), 1.0, atol=1e-4)


def test_ray_cube_hit_and_normal_flip():
    scene = _cube_scene()
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])

    @jax.jit
    def run(scene, o, d):
        hit = intersect.closest_hit_bruteforce(scene, o, d)
        surf = intersect.surface_at_hit(scene, hit, o, d)
        return hit, surf

    hit, surf = run(scene, o, d)
    assert bool(hit.is_hit[0]) and int(hit.kind[0]) == intersect.HIT_TRIANGLE
    assert np.isclose(float(hit.t[0]), 4.5, atol=1e-4)  # cube face at z=0.5
    n = np.asarray(surf.position[0])
    assert np.isclose(n[2], 0.5, atol=1e-4)
    # Normal flipped toward the incident ray => +Z facing the origin.
    assert np.asarray(surf.normal)[0][2] > 0.9


def test_ray_cube_miss():
    scene = _cube_scene()
    o = jnp.asarray([[0.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = jax.jit(intersect.closest_hit_bruteforce)(scene, o, d)
    assert not bool(hit.is_hit[0])
    assert float(hit.t[0]) > 1e30


def test_moller_trumbore_barycentrics():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    o = jnp.asarray([0.25, 0.25, 1.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    t, u, v, hit = jax.jit(rays.intersect_triangle)(o, d, v0, v1, v2)
    assert bool(hit)
    assert np.isclose(float(t), 1.0, atol=1e-5)
    assert np.isclose(float(u), 0.25, atol=1e-5)
    assert np.isclose(float(v), 0.25, atol=1e-5)


def test_triangle_edge_and_outside():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    _, _, _, hit_out = jax.jit(rays.intersect_triangle)(
        jnp.asarray([0.75, 0.75, 1.0]), d, v0, v1, v2
    )
    assert not bool(hit_out)


def test_offset_ray_moves_off_surface():
    p = jnp.asarray([[1.0, -2.0, 0.001]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    q = np.asarray(jax.jit(rays.offset_ray)(p, n))
    assert q[0][2] > p[0][2]  # moved along the normal
    assert np.allclose(q, np.asarray(p), atol=1e-3)  # by a tiny amount


def test_refract_total_internal_reflection():
    d = jnp.asarray([[np.sin(1.2), -np.cos(1.2), 0.0]], dtype=jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(jax.jit(rays.refract)(d, n, jnp.float32(1.5)))
    assert np.allclose(out, 0.0)  # TIR -> zero vector like GLSL
