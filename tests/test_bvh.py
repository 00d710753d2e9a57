"""BVH build/traverse invariants (SURVEY.md §4 item 1) — agreement with the
exhaustive intersector on random soups and structured scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import bvh as bvhmod
from rust_renderer_tpu.ops import intersect
from rust_renderer_tpu.scene import ModelLoader


def _random_soup(n_tris=200, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-5, 5, (n_tris, 3)).astype(np.float32)
    edges = rng.uniform(-0.8, 0.8, (n_tris, 2, 3)).astype(np.float32)
    positions = np.concatenate(
        [base, base + edges[:, 0], base + edges[:, 1]], axis=1
    ).reshape(-1, 3)
    indices = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return positions, indices


def _random_rays(n=256, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


from typing import NamedTuple


class _TriOnlyScene(NamedTuple):
    """Minimal scene shim (pytree) for the brute-force intersector."""

    positions: jnp.ndarray
    indices: jnp.ndarray
    tri_mesh: jnp.ndarray
    mesh_material: jnp.ndarray
    sphere_center: jnp.ndarray
    sphere_radius: jnp.ndarray
    sphere_material: jnp.ndarray
    normals: jnp.ndarray
    uvs: jnp.ndarray

    @staticmethod
    def make(positions, indices):
        return _TriOnlyScene(
            positions=jnp.asarray(positions),
            indices=jnp.asarray(indices, jnp.int32),
            tri_mesh=jnp.zeros((len(indices),), jnp.int32),
            mesh_material=jnp.zeros((1,), jnp.int32),
            sphere_center=jnp.zeros((0, 3)),
            sphere_radius=jnp.zeros((0,)),
            sphere_material=jnp.zeros((0,), jnp.int32),
            normals=jnp.asarray(positions),
            uvs=jnp.zeros((len(positions), 2)),
        )


def test_bvh_structure_valid():
    positions, indices = _random_soup(500)
    b = bvhmod.build_bvh(positions, indices)
    miss = np.asarray(b.node_miss)
    leaf = np.asarray(b.node_leaf)
    n = b.num_nodes
    # Miss pointers point forward or terminate.
    assert np.all((miss == -1) | (miss > np.arange(n)))
    # Every triangle appears exactly once across leaves.
    tris = np.asarray(b.leaf_tris).reshape(-1)
    tris = tris[tris >= 0]
    assert sorted(tris.tolist()) == list(range(len(indices)))
    # Parent boxes contain leaf content (spot-check root).
    assert np.all(np.asarray(b.node_min)[0] <= positions.min(0) + 1e-4)
    assert np.all(np.asarray(b.node_max)[0] >= positions.max(0) - 1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_bvh_matches_bruteforce_soup(seed):
    positions, indices = _random_soup(300, seed)
    scene = _TriOnlyScene.make(positions, indices)
    b = bvhmod.build_bvh(positions, indices)
    o, d = _random_rays(512, seed + 10)

    brute = jax.jit(intersect.closest_hit_bruteforce)(scene, o, d)
    t, prim, u, v = jax.jit(lambda o, d: bvhmod.traverse(b, o, d))(o, d)

    bt = np.asarray(brute.t)
    tt = np.asarray(t)
    hit_b = np.asarray(brute.is_hit)
    hit_t = prim_hits = np.asarray(prim) >= 0
    np.testing.assert_array_equal(hit_b, hit_t)
    np.testing.assert_allclose(tt[hit_t], bt[hit_t], rtol=1e-4, atol=1e-5)
    # Same primitive chosen (modulo exact ties).
    same = np.asarray(brute.prim)[hit_t] == np.asarray(prim)[hit_t]
    assert same.mean() > 0.99


def test_bvh_cube_scene_surface():
    r = rt.Renderer()
    r.add_model(ModelLoader.load_cube(), np.eye(4, dtype=np.float32))
    scene = r.pack()
    b = bvhmod.build_scene_bvh(scene)
    ch = bvhmod.make_closest_hit(b)
    o = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = jax.jit(lambda s, o, d: ch(s, o, d))(scene, o, d)
    assert bool(hit.is_hit[0]) and not bool(hit.is_hit[1])
    assert np.isclose(float(hit.t[0]), 4.5, atol=1e-4)


def test_bvh_any_hit_occlusion():
    positions, indices = _random_soup(100, 2)
    scene = _TriOnlyScene.make(positions, indices)
    b = bvhmod.build_bvh(positions, indices)
    ah = bvhmod.make_any_hit(b)
    o, d = _random_rays(256, 5)
    occluded = jax.jit(lambda s, o, d: ah(s, o, d))(scene, o, d)
    brute = jax.jit(intersect.closest_hit_bruteforce)(scene, o, d)
    np.testing.assert_array_equal(np.asarray(occluded), np.asarray(brute.is_hit))


def test_bvh_respects_t_bounds():
    positions, indices = _random_soup(100, 4)
    b = bvhmod.build_bvh(positions, indices)
    o, d = _random_rays(128, 6)
    t_full, prim_full, _, _ = jax.jit(lambda o, d: bvhmod.traverse(b, o, d))(o, d)
    t_lim, prim_lim, _, _ = jax.jit(lambda o, d: bvhmod.traverse(b, o, d, 1e-3, 2.0))(o, d)
    tl = np.asarray(t_lim)
    hits = np.asarray(prim_lim) >= 0
    assert np.all(tl[hits] <= 2.0)
    # Everything the limited query finds, the full query finds at the same t.
    np.testing.assert_allclose(tl[hits], np.asarray(t_full)[hits], rtol=1e-5)


def test_empty_bvh():
    b = bvhmod.build_bvh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    o, d = _random_rays(8)
    t, prim, _, _ = jax.jit(lambda o, d: bvhmod.traverse(b, o, d))(o, d)
    assert np.all(np.asarray(prim) == -1)


def test_presplit_exact_and_budgeted():
    """SBVH-style reference pre-splitting (build_bvh presplit_ratio>1) is
    EXACT: fragment leaves store full original triangles, so hits match the
    unsplit tree bit-for-bit (duplicates are idempotent under the strict
    best_t). Big diagonal triangles force actual splits here."""
    positions, indices = _random_soup(200, 7)
    walls = np.asarray(
        [[-50, -2, -50], [50, -2, -48], [0, 3, 80],
         [-50, 6, -50], [50, 2, -50], [0, 6, 80]], np.float32
    )
    positions = np.concatenate([positions, walls])
    indices = np.concatenate(
        [indices,
         (len(positions) - 6 + np.arange(6, dtype=indices.dtype)).reshape(2, 3)]
    )
    b0 = bvhmod.build_bvh(positions, indices, leaf_size=12)
    b1 = bvhmod.build_bvh(positions, indices, leaf_size=12,
                          presplit_ratio=2.0)
    assert b1.leaf_tris.shape[0] > b0.leaf_tris.shape[0], "no splits happened"
    o, d = _random_rays(2048, 8)
    t0, p0, u0, v0 = bvhmod.traverse_packet(b0, o, d)
    t1, p1, u1, v1 = bvhmod.traverse_packet(b1, o, d)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    hit = np.asarray(p0) >= 0
    np.testing.assert_allclose(np.asarray(t0)[hit], np.asarray(t1)[hit],
                               rtol=1e-6)
    ta, pa, _, _ = bvhmod.traverse_packet(b0, o, d, any_hit=True)
    tb, pb, _, _ = bvhmod.traverse_packet(b1, o, d, any_hit=True)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, np.asarray(pb) >= 0)
