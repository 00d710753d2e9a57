"""bench.py scheduling contract (VERDICT r4 #1): the driver's capture must
get the cheap lines early and every selected metric must resolve to a
runnable workload. Pure-host tests — no TPU, no jax."""

import importlib.util
import os
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_selected_metrics_cheap_first(monkeypatch):
    bench = _load_bench()
    for var in ("RR_BENCH_SKIP_SCALE", "RR_BENCH_SKIP_MC",
                "RR_BENCH_SKIP_CONFIGS"):
        monkeypatch.delenv(var, raising=False)
    metrics = bench._selected_metrics()
    assert metrics[0] == "pathtrace_graph_1080p_1spp_fps"
    # The two at-target configs run before the 1080p monsters so a budget
    # cut costs the expensive lines last.
    order = {m: i for i, m in enumerate(metrics)}
    assert order["rtiow_pathtrace_256_1spp_fps"] < order[
        "raster_post_stack_sponza_1080p_fps"]
    assert order["raster_single_mesh_512_fps"] < order[
        "restir_128_lights_sponza_1080p_fps"]
    # The two biggest compiles come last.
    assert metrics[-2:] == ["pathtrace_sponza_scale_260k_1080p_1spp_fps",
                            "pathtrace_mc_isosurface_1080p_1spp_fps"]


def test_every_selected_metric_has_a_workload(monkeypatch):
    bench = _load_bench()
    for var in ("RR_BENCH_SKIP_SCALE", "RR_BENCH_SKIP_MC",
                "RR_BENCH_SKIP_CONFIGS"):
        monkeypatch.delenv(var, raising=False)
    workloads = bench._workloads(1920, 1080)
    for m in bench._selected_metrics():
        fn_name, scene_name, kw = workloads[m]
        assert fn_name in ("run_workload", "run_raster_workload")
        assert hasattr(bench, fn_name)
        import rust_renderer_tpu.models.scenes as scenes

        assert hasattr(scenes, scene_name), scene_name


def test_skip_flags_trim_the_list(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("RR_BENCH_SKIP_SCALE", "1")
    monkeypatch.setenv("RR_BENCH_SKIP_MC", "1")
    monkeypatch.setenv("RR_BENCH_SKIP_CONFIGS", "1")
    assert bench._selected_metrics() == ["pathtrace_graph_1080p_1spp_fps"]
