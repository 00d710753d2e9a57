"""Golden-image regression for the RASTERIZED and MINIMAL graphs.

The PT path has an independent-CPU-tracer golden (test_pathtrace_golden.py);
the raster composite (deferred + CSM + SSAO + IBL + FXAA + atmosphere,
BASELINE configs 2/3) gets a blessed-image regression: a committed render,
RMSE-compared with a tight tolerance. Any silent shading change (cascade
selection, SSAO kernel, IBL split-sum, FXAA walk) moves the image and fails
here. Regenerate deliberately with tools/make_raster_golden.py after an
INTENDED change, and eyeball the PNG it writes before committing.

Reference behavior spec: deferred.frag:1-119, shadow_mapping.glsl:8-54.
"""

import os

import numpy as np
import pytest

SIZE = 128
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _render(mode_name: str) -> np.ndarray:
    from rust_renderer_tpu.app.main import Application
    from rust_renderer_tpu.models import create_cornell_box_scene
    from rust_renderer_tpu.settings import RenderGraphMode, StaticConfig

    cfg = StaticConfig(
        shadow_map_size=128, cubemap_size=32, cubemap_mips=3,
        irradiance_size=8, brdf_lut_size=32, num_bounces=2,
    )
    mode = getattr(RenderGraphMode, mode_name)
    app = Application(SIZE, SIZE, mode, cfg)
    app.create_scene(create_cornell_box_scene)
    app.renderer.add_light([0.0, 1.5, 1.0], [1.0, 1.0, 1.0])
    app._repack()
    return app.run(num_frames=1)


@pytest.mark.parametrize("mode_name", ["RASTERIZED", "MINIMAL"])
def test_raster_golden(mode_name):
    path = os.path.join(GOLDEN, f"{mode_name.lower()}_{SIZE}.npy")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: {path} (run tools/make_raster_golden.py)")
    golden = np.load(path)
    img = _render(mode_name)
    assert img is not None and img.shape == golden.shape
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    # Well under visible-change territory but above cross-platform float
    # noise (goldens are generated on the same CPU backend the suite runs on).
    assert rmse < 2e-3, f"{mode_name} drifted from golden: RMSE {rmse:.5f}"


def test_shadow_cascade_golden():
    """Blessed cascade depth maps (renderers/shadow.rs split + sphere-fit
    behavior): any silent change to split computation, cascade matrices, or
    the depth rasterizer moves these layers."""
    path = os.path.join(GOLDEN, f"shadow_cascades_{SIZE}.npy")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: {path} (run tools/make_raster_golden.py)")
    golden = np.load(path)

    from rust_renderer_tpu.app.main import Application
    from rust_renderer_tpu.models import create_cornell_box_scene
    from rust_renderer_tpu.settings import RenderGraphMode, StaticConfig

    cfg = StaticConfig(
        shadow_map_size=128, cubemap_size=32, cubemap_mips=3,
        irradiance_size=8, brdf_lut_size=32, num_bounces=2,
    )
    app = Application(SIZE, SIZE, RenderGraphMode.RASTERIZED, cfg)
    app.create_scene(create_cornell_box_scene)
    app.renderer.add_light([0.0, 1.5, 1.0], [1.0, 1.0, 1.0])
    app._repack()
    app.run(num_frames=1)
    sm = np.asarray(app.graph.render(app.scene, app.view)["shadow_map"])
    assert sm.shape == golden.shape
    rmse = float(np.sqrt(np.mean((sm - golden) ** 2)))
    assert rmse < 2e-3, f"shadow cascades drifted from golden: RMSE {rmse:.5f}"
