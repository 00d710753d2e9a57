import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.graph import Graph


def _noop_scene():
    return jnp.zeros(1)


def _view():
    return {"gain": jnp.float32(2.0)}


def test_pass_dataflow_order():
    g = Graph()
    g.create_texture("a", 4, 4, 1)
    g.create_texture("b", 4, 4, 1)

    def write_a(res, scene, view, u):
        return {"a": jnp.ones((4, 4))}

    def b_from_a(res, scene, view, u):
        return {"b": res["a"] * view["gain"]}

    g.new_frame()
    g.clear()
    g.add_pass("pa").write("a").render(write_a).build()
    g.add_pass("pb").read("a").write("b").render(b_from_a).build()
    out = g.render(_noop_scene(), _view())
    np.testing.assert_allclose(np.asarray(out["b"]), 2.0)


def test_persistent_resource_accumulates():
    g = Graph()
    g.create_texture("acc", 2, 2, 1, persistent=True)

    def bump(res, scene, view, u):
        return {"acc": res["acc"] + 1.0}

    for i in range(3):
        g.new_frame()
        g.clear()
        g.add_pass("bump").write("acc").render(bump).build()
        out = g.render(_noop_scene(), _view())
    np.testing.assert_allclose(np.asarray(out["acc"]), 3.0)


def test_jit_cache_hit_on_retrace():
    """Graph rebuilt per frame must not recompile (SURVEY.md: jit caching
    makes the per-frame rebuild free)."""
    g = Graph()
    g.create_texture("a", 4, 4, 1)
    calls = {"n": 0}

    def write_a(res, scene, view, u):
        calls["n"] += 1
        return {"a": jnp.ones((4, 4)) * view["gain"]}

    for _ in range(5):
        g.new_frame()
        g.clear()
        g.add_pass("pa").write("a").render(write_a).build()
        g.render(_noop_scene(), _view())
    # Trace ran once; later frames hit the compiled executable.
    assert calls["n"] == 1
    assert len(g._compiled) == 1


def test_uniforms_are_traced_not_baked():
    g = Graph()
    g.create_texture("a", 2, 2, 1)

    def scaled(res, scene, view, u):
        return {"a": jnp.full((2, 2), u["scale"])}

    outs = []
    for s in [1.0, 3.0]:
        g.new_frame()
        g.clear()
        g.add_pass("p").write("a").uniforms("scale", jnp.float32(s)).render(scaled).build()
        outs.append(float(np.asarray(g.render(_noop_scene(), _view())["a"])[0, 0]))
    assert outs == [1.0, 3.0]
    assert len(g._compiled) == 1  # same structure, no recompile


def test_recompile_generation_bumps_cache():
    g = Graph()
    g.create_texture("a", 2, 2, 1)

    def f(res, scene, view, u):
        return {"a": jnp.ones((2, 2))}

    g.new_frame(); g.clear()
    g.add_pass("p").write("a").render(f).build()
    g.render(_noop_scene(), _view())
    g.recompile()
    g.new_frame(); g.clear()
    g.add_pass("p").write("a").render(f).build()
    g.render(_noop_scene(), _view())
    assert len(g._compiled) == 2


def test_failed_kernel_keeps_old_pipeline():
    """Hot-reload failure tolerance (pipeline.rs:109-121): a broken kernel
    falls back to the last good executable."""
    g = Graph()
    g.create_texture("a", 2, 2, 1)

    def good(res, scene, view, u):
        return {"a": jnp.ones((2, 2))}

    def broken(res, scene, view, u):
        raise RuntimeError("bad shader")

    g.new_frame(); g.clear()
    g.add_pass("p").write("a").render(good).build()
    out1 = g.render(_noop_scene(), _view())

    g.recompile()  # simulate hot reload to a broken kernel
    g.new_frame(); g.clear()
    g.add_pass("p").write("a").render(broken).build()
    out2 = g.render(_noop_scene(), _view())
    np.testing.assert_allclose(np.asarray(out2["a"]), np.asarray(out1["a"]))


def test_resource_resize_reallocates():
    g = Graph()
    g.create_texture("a", 4, 4, 1, persistent=True)
    g.prepare()
    assert g.state["a"].shape == (4, 4)
    g.create_texture("a", 8, 8, 1, persistent=True)
    g.prepare()
    assert g.state["a"].shape == (8, 8)
