import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.ops import rng


from functools import partial


@partial(jax.jit, static_argnums=1)
def _draw_many(state, n=64):
    outs = []
    for _ in range(n):
        state, x = rng.random_float(state)
        outs.append(x)
    return state, jnp.stack(outs, -1)


def test_random_float_range_and_determinism():
    state = rng.init_rng(jnp.arange(16), jnp.zeros(16, jnp.int32), 16, jnp.uint32(3))
    _, a = _draw_many(state)
    _, b = _draw_many(state)
    a, b = np.asarray(a), np.asarray(b)
    assert np.all(a >= 0) and np.all(a <= 1)
    np.testing.assert_array_equal(a, b)


def test_random_float_uniform_moments():
    px = jnp.arange(4096) % 64
    py = jnp.arange(4096) // 64
    state = rng.init_rng(px, py, 64, jnp.uint32(0))
    _, x = _draw_many(state, 32)
    x = np.asarray(x).reshape(-1)
    assert abs(x.mean() - 0.5) < 0.01
    assert abs(x.var() - 1 / 12) < 0.01


def test_per_pixel_streams_differ():
    px = jnp.arange(256)
    state = rng.init_rng(px, jnp.zeros(256, jnp.int32), 256, jnp.uint32(7))
    _, x = _draw_many(state, 4)
    x = np.asarray(x)
    # No two pixels share the same draw sequence.
    assert len({tuple(row) for row in x}) == 256


def test_frame_seed_changes_sequence():
    px = jnp.arange(64)
    py = jnp.zeros(64, jnp.int32)
    s0 = rng.init_rng(px, py, 64, jnp.uint32(0))
    s1 = rng.init_rng(px, py, 64, jnp.uint32(1))
    _, a = _draw_many(s0, 4)
    _, b = _draw_many(s1, 4)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_unit_sphere_inside_and_distribution():
    state = rng.init_rng(jnp.arange(2048), jnp.zeros(2048, jnp.int32), 2048, jnp.uint32(5))
    _, p = jax.jit(rng.random_in_unit_sphere)(state)
    p = np.asarray(p)
    r2 = np.sum(p * p, -1)
    assert np.all(r2 < 1.0)
    # Centered distribution.
    assert np.all(np.abs(p.mean(0)) < 0.05)
    # E[r^2] for uniform ball = 3/5.
    assert abs(r2.mean() - 0.6) < 0.04


def test_unit_disk_inside():
    state = rng.init_rng(jnp.arange(512), jnp.zeros(512, jnp.int32), 512, jnp.uint32(9))
    _, p = jax.jit(rng.random_in_unit_disk)(state)
    p = np.asarray(p)
    assert np.all(np.sum(p * p, -1) < 1.0)
