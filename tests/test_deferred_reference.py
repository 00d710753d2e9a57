"""Independent CPU gate for the deferred composite (VERDICT r4 #4).

The RASTERIZED golden (tests/test_raster_golden.py) is a self-blessed
regression; this gate cross-checks the SHADING independently: it feeds the
framework's own gbuffer/shadow/IBL resources into a from-the-GLSL-spec
numpy composite (tests/cpu_deferred_reference.py) and requires agreement —
then proves the gate's sensitivity by injecting a wrong-cascade bug into
the CPU side and requiring DISagreement.
"""

import numpy as np
import pytest

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import bvh as bvh_ops
from rust_renderer_tpu.ops import shadow as shadow_ops
from rust_renderer_tpu.renderers import build_render_graph
from rust_renderer_tpu.scene import ModelLoader
from rust_renderer_tpu.settings import RenderSettings, StaticConfig
from rust_renderer_tpu.utils import math3d

from tests import cpu_deferred_reference as cpu

W = H = 64
CFG = StaticConfig(
    width=W, height=H, shadow_map_size=128, cubemap_size=16, cubemap_mips=3,
    irradiance_size=8, brdf_lut_size=16,
)


@pytest.fixture(scope="module")
def frame():
    r = rt.Renderer()
    cam = rt.Camera([3.0, 2.5, 5.0], [0.0, 0.5, 0.0], aspect_ratio=1.0,
                    z_near=0.01, z_far=1000.0)
    r.add_model(ModelLoader.load_cube(), math3d.translation([0, 0.5, 0]))
    r.add_model(ModelLoader.load_cube(), math3d.scale([20.0, 0.1, 20.0]))
    r.add_light([2.0, 3.0, 2.0], [1.0, 1.0, 1.0], 1.0)
    r.add_light([-2.0, 2.0, -1.0], [1.0, 0.5, 0.2], 0.7)
    scene = r.pack()
    b = bvh_ops.build_scene_bvh(scene)
    view = RenderSettings.default(num_lights=r.get_num_lights()).with_camera(
        cam, W, H)
    sun = np.array([0.0, 0.90631, 0.42262], np.float32)

    g = rt.Graph()
    g.new_frame(); g.clear()
    build_render_graph(g, CFG, cam, b, sun, need_environment_update=True)
    res = g.render(scene, view)

    matrices, splits = shadow_ops.cascade_matrices(
        cam.get_view(), cam.get_projection(), cam.get_near_plane(),
        cam.get_far_plane(), sun, CFG.shadow_cascade_count)
    return res, scene, view, matrices, splits, sun


def _cpu_composite(frame_vals, cascade_offset: int = 0) -> np.ndarray:
    res, scene, view, matrices, splits, sun = frame_vals
    lights = [
        dict(color=np.asarray(scene.light_color[i]),
             pos=np.asarray(scene.light_pos[i]),
             dir=np.asarray(scene.light_dir[i]),
             type=float(scene.light_type[i]),
             att=np.asarray(scene.light_att[i]),
             spot=float(scene.light_spot[i]))
        for i in range(int(view.num_lights))
    ]
    chain = [np.asarray(res[f"specular_map_mip{m}"])
             for m in range(CFG.cubemap_mips)]
    return cpu.render_deferred(
        np.asarray(res["gbuffer_position"]), np.asarray(res["gbuffer_normal"]),
        np.asarray(res["gbuffer_albedo"]), np.asarray(res["gbuffer_pbr"]),
        np.asarray(res["shadow_map"]), np.asarray(matrices),
        np.asarray(splits), np.asarray(res["irradiance_map"]), chain,
        np.asarray(res["brdf_lut"]), np.asarray(res["ssao_output"]),
        np.asarray(res["rt_shadows"]), np.asarray(res["rt_reflections"]),
        np.asarray(scene.mat_base_color), np.asarray(scene.mat_roughness),
        np.asarray(scene.mat_metallic), np.asarray(scene.mat_rt_type),
        lights, np.asarray(view.view), np.asarray(view.eye_pos),
        np.asarray(sun), cascade_offset=cascade_offset,
    )


def _mismatch_fraction(frame_vals, ref: np.ndarray) -> float:
    out = np.asarray(frame_vals[0]["deferred_output"])[..., :3]
    # The atmosphere pass overwrites deferred_output where gbuffer_depth >= 1
    # (sky); the gate targets the SHADING, so compare geometry pixels only.
    geom = np.asarray(frame_vals[0]["gbuffer_depth"]) < 1.0
    # Relative-ish criterion: binary branches (PCF taps, cascade borders,
    # LUT texel picks) can flip whole pixels on 1-ulp input differences
    # between the f32 XLA program and the f64 numpy reference.
    diff = np.abs(out - ref) / (1.0 + np.abs(ref))
    return float((diff.max(axis=-1) > 5e-3)[geom].mean())


def test_deferred_matches_independent_cpu_reference(frame):
    ref = _cpu_composite(frame)
    out = np.asarray(frame[0]["deferred_output"])[..., :3]
    assert np.isfinite(ref).all() and np.isfinite(out).all()
    frac = _mismatch_fraction(frame, ref)
    assert frac < 0.02, f"deferred composite disagrees on {frac:.1%} of pixels"
    geom = np.asarray(frame[0]["gbuffer_depth"]) < 1.0
    med = np.median(np.abs(out - ref)[geom])
    assert med < 1e-3, f"median |diff| {med}"


def test_deferred_gate_is_shadowed_not_vacuous(frame):
    """The scene must actually exercise the CSM path (shadowed pixels) and
    the point lights — otherwise the gate can't catch shading bugs."""
    ref = _cpu_composite(frame)
    shadow, _ = cpu.calculate_shadow(
        np.asarray(frame[0]["gbuffer_position"])[..., :3].astype(np.float64),
        np.asarray(frame[2].view), np.asarray(frame[0]["shadow_map"]),
        np.asarray(frame[3]), np.asarray(frame[4]))
    assert (shadow < 0.99).mean() > 0.02, "no shadowed pixels — vacuous gate"
    assert (ref > 0.0).any()


def test_deferred_gate_catches_wrong_cascade(frame):
    """Sensitivity probe: selecting cascade i+1 instead of i (a classic
    off-by-one in the split comparison) must trip the gate."""
    bad = _cpu_composite(frame, cascade_offset=1)
    frac = _mismatch_fraction(frame, bad)
    assert frac >= 0.02, (
        f"wrong-cascade injection only moved {frac:.1%} of pixels — the "
        "gate would miss a cascade-selection bug")
