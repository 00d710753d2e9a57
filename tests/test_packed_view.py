"""Packed view-buffer transfer (settings.pack_view / unpack_view).

The frame jit receives RenderSettings as ONE flat f32 buffer (ints bitcast)
instead of ~107 separate leaf transfers — the reference's single
ViewUniformData UBO write per frame (utopian/src/renderer.rs:84-120).
These tests pin the roundtrip bit-exactly and the graph integration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.settings import (
    PackedView, RenderSettings, pack_view, unpack_view)


def test_pack_unpack_roundtrip_bit_exact():
    v = RenderSettings.default(num_lights=3).replace(
        total_samples=np.uint32(7),
        sky_enabled=np.int32(0),
    )
    buf = pack_view(v)
    assert isinstance(buf, PackedView)
    assert buf.buf.dtype == np.float32 and buf.buf.ndim == 1
    out = jax.jit(unpack_view)(buf)
    for f in dataclasses.fields(RenderSettings):
        a = np.asarray(getattr(v, f.name))
        b = np.asarray(getattr(out, f.name))
        assert a.shape == b.shape, f.name
        assert a.dtype == b.dtype, f.name
        # Bitwise equality (bitcasts must not perturb ints or NaN payloads).
        assert np.array_equal(
            a.reshape(-1).view(np.uint8), b.reshape(-1).view(np.uint8)
        ), f.name


def test_pack_view_passthrough_for_plain_views():
    # Tests hand the graph plain dicts / arrays; both helpers must be no-ops.
    d = {"x": np.float32(1.0)}
    assert pack_view(d) is d
    a = jnp.zeros((4,), jnp.float32)
    assert unpack_view(a) is a


def test_unpack_view_no_shape_duck_typing():
    # ADVICE r3: a plain 1-D f32 array whose length coincides with the
    # packed-view total must pass through untouched, not be reinterpreted
    # as a RenderSettings.
    from rust_renderer_tpu.settings import _view_spec

    total = _view_spec()[1]
    a = jnp.zeros((total,), jnp.float32)
    assert unpack_view(a) is a


def test_graph_executes_with_packed_view():
    from rust_renderer_tpu.graph import Graph

    def fn(res, scene, view, u):
        # Consumes an int field and a float field through the bitcast path.
        img = jnp.full(
            (4, 4), view.time * (1.0 + view.total_samples.astype(
                jnp.float32)))
        return {"out": img}

    g = Graph()
    g.create_texture("out", 4, 4, channels=1)
    g.add_pass("p").write("out").render(fn).build()
    view = RenderSettings.default(num_lights=0).replace(
        total_samples=np.uint32(3), time=np.float32(2.5))
    res = g.render(None, view)
    assert np.allclose(np.asarray(res["out"]), 2.5 * 4.0)
