"""HUD overlay composited into the presented frame (utils/hud.py — the
egui-into-swapchain analog, ui.rs:56-75). Off by default: goldens and
benches must never see it."""

import numpy as np

from rust_renderer_tpu.utils import hud


def test_text_mask_shapes_and_content():
    m = hud.text_mask("FPS: 12.5")
    assert m.shape == (hud.GLYPH_H, hud.GLYPH_W * 9)
    assert m.any()
    # Blank for spaces, stable under scale.
    m2 = hud.text_mask("A", scale=3)
    assert m2.shape == (hud.GLYPH_H * 3, hud.GLYPH_W * 3)
    assert m2.sum() == hud.text_mask("A").sum() * 9


def test_compose_hud_touches_panel_only():
    img = np.full((200, 300, 3), 0.5, np.float32)
    out = hud.compose_hud(img, ["MODE: PATH_TRACED", "FPS: 1.23"])
    assert out.shape == img.shape
    diff = np.abs(out - img).sum(-1)
    assert diff[:60, :220].any()          # panel region changed
    assert not diff[120:, :].any()        # body untouched
    assert not diff[:, 280:].any()
    np.testing.assert_array_equal(img, 0.5)  # input not mutated


def test_overlay_off_is_passthrough():
    from rust_renderer_tpu.app.ui import Ui
    from rust_renderer_tpu.settings import RenderSettings, StaticConfig

    ui = Ui()
    img = np.zeros((64, 64, 3), np.float32)
    view = RenderSettings.default()
    out = ui.compose(img, view, StaticConfig(), "PT", 1.0, 5)
    assert out is img  # no copy, no change


def test_overlay_on_draws_settings():
    from rust_renderer_tpu.app.ui import Ui
    from rust_renderer_tpu.settings import RenderSettings, StaticConfig

    ui = Ui()
    ui.state.overlay = True
    img = np.zeros((128, 256, 3), np.float32)
    view = RenderSettings.default(num_lights=3)
    out = ui.compose(img, view, StaticConfig(num_bounces=5), "PT", 2.5, 7)
    assert out is not img and out.any()
