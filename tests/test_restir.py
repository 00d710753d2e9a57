"""Reservoir-resampling statistics (SURVEY.md §4: E[W_X] unbiasedness)."""

import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import restir, rng


def _light_scene(num_lights=8, seed=3):
    r = rt.Renderer()
    rs = np.random.default_rng(seed)
    for _ in range(num_lights):
        r.add_light(rs.uniform(-5, 5, 3), [1.0, 1.0, 1.0], 1.0)
    return r.pack()


def test_target_function_inverse_square():
    scene = _light_scene(1)
    lp = np.asarray(scene.light_pos)[0]
    p1 = jnp.asarray(lp + np.array([1.0, 0, 0]))
    p2 = jnp.asarray(lp + np.array([2.0, 0, 0]))
    f = jax.jit(restir.target_function)
    a = float(f(scene, jnp.int32(0), p1))
    b = float(f(scene, jnp.int32(0), p2))
    assert np.isclose(a / b, 4.0, rtol=1e-4)
    # Invalid light index -> zero.
    assert float(f(scene, jnp.int32(-1), p1)) == 0.0


def test_ris_unbiased_estimator():
    """RIS with target p_hat and uniform proposal: E[p_hat(Y) * W_X] equals
    the true sum over lights of p_hat (the quantity RIS integrates)."""
    scene = _light_scene(8)
    n = 8192
    hit = jnp.tile(jnp.asarray([[0.5, 0.2, -0.3]]), (n, 1))
    state = rng.init_rng(jnp.arange(n), jnp.zeros(n, jnp.int32), n, jnp.uint32(11))

    @jax.jit
    def go(scene, state, hit):
        state, res = restir.resample(
            scene, state, hit, jnp.int32(8), jnp.int32(1024), num_candidates=32
        )
        p_hat = restir.target_function(scene, res.Y, hit)
        return p_hat * res.W_X

    est = np.asarray(go(scene, state, hit))
    true = sum(
        float(
            jax.jit(restir.target_function)(
                scene, jnp.int32(i), jnp.asarray([0.5, 0.2, -0.3])
            )
        )
        for i in range(8)
    )
    assert abs(est.mean() - true) / true < 0.02


def test_reservoir_update_selection_probability():
    """A candidate with weight w has selection probability w / W_sum."""
    n = 16384
    state = rng.init_rng(jnp.arange(n), jnp.zeros(n, jnp.int32), n, jnp.uint32(5))

    @jax.jit
    def go(state):
        res = restir.Reservoir.empty((n,))
        state, res = restir.update_reservoir(
            state, res, jnp.full((n,), 0, jnp.int32), jnp.full((n,), 3.0), jnp.ones((n,), jnp.int32)
        )
        state, res = restir.update_reservoir(
            state, res, jnp.full((n,), 1, jnp.int32), jnp.full((n,), 1.0), jnp.ones((n,), jnp.int32)
        )
        return res

    res = go(state)
    frac_second = float(np.mean(np.asarray(res.Y) == 1))
    assert abs(frac_second - 0.25) < 0.02
    assert np.allclose(np.asarray(res.W_sum), 4.0)
    assert np.all(np.asarray(res.M) == 2)


def test_initial_ris_pass_shapes_and_validity():
    scene = _light_scene(4)
    h = w = 16
    state = rng.init_rng(
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1),
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0),
        w,
        jnp.uint32(2),
    )
    hit = jnp.zeros((h, w, 3))

    @jax.jit
    def go(scene, state, hit):
        return restir.initial_ris_pass(scene, state, hit, jnp.int32(4), jnp.int32(1024))

    _, res = go(scene, state, hit)
    assert res.Y.shape == (h, w)
    ys = np.asarray(res.Y)
    assert ys.min() >= 0 and ys.max() <= 3
    assert np.all(np.asarray(res.W_X) >= 0)


def test_temporal_reuse_passthrough_when_disabled():
    scene = _light_scene(4)
    h = w = 8
    state = rng.init_rng(
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1),
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0),
        w,
        jnp.uint32(2),
    )
    hit = jnp.zeros((h, w, 3))
    initial = restir.Reservoir(
        Y=jnp.ones((h, w), jnp.int32),
        W_sum=jnp.full((h, w), 2.0),
        W_X=jnp.full((h, w), 0.5),
        M=jnp.ones((h, w), jnp.int32),
    )
    prev = restir.Reservoir.empty((h, w))

    @jax.jit
    def go(scene, state, hit, initial, prev):
        return restir.temporal_reuse_pass(
            scene, state, hit, initial, prev, jnp.eye(4), jnp.int32(0)
        )

    _, out = go(scene, state, hit, initial, prev)
    np.testing.assert_array_equal(np.asarray(out.Y), np.asarray(initial.Y))
    np.testing.assert_allclose(np.asarray(out.W_X), np.asarray(initial.W_X))


def test_spatial_reuse_improves_or_preserves():
    """Spatial reuse with identical neighbors must preserve the estimator in
    expectation: E[p_hat(Y) W_X] unchanged."""
    scene = _light_scene(8)
    h = w = 64
    state = rng.init_rng(
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1),
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0),
        w,
        jnp.uint32(3),
    )
    hit = jnp.tile(jnp.asarray([0.5, 0.2, -0.3]), (h, w, 1))

    @jax.jit
    def go(scene, state, hit):
        state, initial = restir.initial_ris_pass(
            scene, state, hit, jnp.int32(8), jnp.int32(1024)
        )
        state, spatial = restir.spatial_reuse_pass(
            scene, state, hit, initial, jnp.int32(1)
        )
        p_i = restir.target_function(scene, initial.Y, hit) * initial.W_X
        p_s = restir.target_function(scene, spatial.Y, hit) * spatial.W_X
        return p_i, p_s

    p_i, p_s = go(scene, state, hit)
    mi, ms = float(np.mean(np.asarray(p_i))), float(np.mean(np.asarray(p_s)))
    assert abs(ms - mi) / mi < 0.05
    # Variance should not increase with reuse (same target everywhere).
    assert np.var(np.asarray(p_s)) <= np.var(np.asarray(p_i)) * 1.05


def test_dense_light_path_matches_gather():
    """The one-hot small-table fast paths (target_function, resample,
    select_light_rows) are exact vs the gather formulation."""
    scene = _light_scene(17, seed=9)
    rs = np.random.default_rng(11)
    pos = jnp.asarray(rs.uniform(-6, 6, (33, 3)).astype(np.float32))
    idx = jnp.asarray(rs.integers(-1, 17, 33).astype(np.int32))

    dense = restir.target_function(scene, idx, pos)
    # Force the gather path by faking a huge pixel count budget check:
    import rust_renderer_tpu.ops.restir as rmod

    old = rmod._DENSE_LIGHT_MAX
    try:
        rmod._DENSE_LIGHT_MAX = 0
        gathered = restir.target_function(scene, idx, pos)
        rows_g = restir.select_light_rows(
            scene, jnp.clip(idx, 0, 16)
        )
    finally:
        rmod._DENSE_LIGHT_MAX = old
    np.testing.assert_allclose(np.asarray(dense), np.asarray(gathered),
                               rtol=2e-5)
    rows_d = restir.select_light_rows(scene, jnp.clip(idx, 0, 16))
    np.testing.assert_allclose(np.asarray(rows_d), np.asarray(rows_g),
                               rtol=2e-5)

    # resample: identical RNG stream -> identical reservoirs on both paths.
    state = rng.init_rng(
        jnp.arange(33, dtype=jnp.int32), jnp.zeros(33, jnp.int32), 33, 1
    )
    s_d, res_d = restir.resample(
        scene, state, pos, jnp.int32(17), jnp.int32(1024)
    )
    try:
        rmod._DENSE_LIGHT_MAX = 0
        s_g, res_g = restir.resample(
            scene, state, pos, jnp.int32(17), jnp.int32(1024)
        )
    finally:
        rmod._DENSE_LIGHT_MAX = old
    np.testing.assert_array_equal(np.asarray(res_d.Y), np.asarray(res_g.Y))
    np.testing.assert_allclose(np.asarray(res_d.W_X), np.asarray(res_g.W_X),
                               rtol=2e-5)


def test_dense_light_path_chunked_matches_direct():
    """Over the element budget the dense paths lax.map pixel chunks
    (config 4 at 1080p x 128 lights); chunking must be bit-exact vs the
    direct dense computation."""
    import rust_renderer_tpu.ops.restir as rmod

    scene = _light_scene(13, seed=21)
    rs = np.random.default_rng(5)
    n = 2500
    pos = jnp.asarray(rs.uniform(-6, 6, (n, 3)).astype(np.float32))
    idx = jnp.asarray(rs.integers(-1, 13, n).astype(np.int32))
    state = rng.init_rng(
        jnp.arange(n, dtype=jnp.int32), jnp.zeros(n, jnp.int32), n, 3
    )

    direct_tf = restir.target_function(scene, idx, pos)
    _, direct_res = restir.resample(scene, state, pos, jnp.int32(13),
                                    jnp.int32(1024))
    direct_rows = restir.select_light_rows(scene, jnp.clip(idx, 0, 12))

    old = rmod._DENSE_ELEM_BUDGET
    try:
        # Budget forcing ~3 chunks (chunk floor is 1024 pixels).
        rmod._DENSE_ELEM_BUDGET = 1024 * 13
        chunked_tf = restir.target_function(scene, idx, pos)
        _, chunked_res = restir.resample(scene, state, pos, jnp.int32(13),
                                         jnp.int32(1024))
        chunked_rows = restir.select_light_rows(scene, jnp.clip(idx, 0, 12))
    finally:
        rmod._DENSE_ELEM_BUDGET = old

    # Same math, but XLA reassociates reductions differently across the two
    # compiled graphs — agreement is to float ulps, not bitwise.
    np.testing.assert_allclose(np.asarray(direct_tf), np.asarray(chunked_tf),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(direct_rows),
                               np.asarray(chunked_rows), rtol=1e-6)
    same_y = np.asarray(direct_res.Y) == np.asarray(chunked_res.Y)
    assert same_y.mean() > 0.999  # ulp flips can swing a borderline take
    np.testing.assert_allclose(np.asarray(direct_res.W_X)[same_y],
                               np.asarray(chunked_res.W_X)[same_y],
                               rtol=1e-5)
