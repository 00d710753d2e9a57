"""App-level features: hot reload, profiler, watcher, UI adapter, image IO."""

import os
import time

import numpy as np
import jax.numpy as jnp

from rust_renderer_tpu.app.ui import Ui
from rust_renderer_tpu.settings import RenderSettings, StaticConfig
from rust_renderer_tpu.utils.image_io import save_png, to_uint8
from rust_renderer_tpu.utils.profiler import Profiler
from rust_renderer_tpu.utils.watcher import DirectoryWatcher
from rust_renderer_tpu.input import Input


def test_ui_settings_change_detection():
    ui = Ui()
    view = RenderSettings.default()
    cfg = StaticConfig(width=8, height=8)
    assert not ui.settings_changed(view, cfg)  # first frame: no previous
    assert not ui.settings_changed(view, cfg)  # unchanged
    view2 = Ui.toggle_flag(view, "sky_enabled")
    assert ui.settings_changed(view2, cfg)  # sky toggled -> reset
    assert not ui.settings_changed(view2, cfg)


def test_ui_toggle_flag_roundtrip():
    view = RenderSettings.default()
    v2 = Ui.toggle_flag(view, "fxaa_enabled")
    assert int(v2.fxaa_enabled) == 0
    v3 = Ui.toggle_flag(v2, "fxaa_enabled")
    assert int(v3.fxaa_enabled) == 1


def test_input_edge_detection():
    inp = Input()
    inp.set_key_down("q")
    assert inp.key_pressed("q") and inp.key_down("q")
    inp.begin_frame()
    assert not inp.key_pressed("q") and inp.key_down("q")
    inp.set_key_up("q")
    assert not inp.key_down("q")


def test_watcher_detects_modification(tmp_path):
    mod = tmp_path / "rust_renderer_tpu" / "ops"
    mod.mkdir(parents=True)
    f = mod / "kernel.py"
    f.write_text("x = 1\n")
    w = DirectoryWatcher(str(tmp_path), debounce_seconds=0.0)
    assert w.check_if_modification() is None
    time.sleep(0.01)
    f.write_text("x = 2\n")
    os.utime(f, (time.time() + 1, time.time() + 1))
    changed = w.check_if_modification()
    assert changed is not None and changed.endswith("kernel.py")
    assert DirectoryWatcher.module_name_for(changed) == "rust_renderer_tpu.ops.kernel"


def test_profiler_scopes_and_report():
    p = Profiler()
    with p.scope("alpha"):
        time.sleep(0.01)
    with p.scope("alpha"):
        pass
    rep = p.report()
    assert "alpha" in rep
    p.new_frame()
    p.new_frame()
    assert p.last_frame_ms >= 0.0


def test_image_io_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(size=(16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "frame.png")
    save_png(path, img)
    from PIL import Image

    back = np.asarray(Image.open(path)) / 255.0
    assert np.abs(back - np.clip(img, 0, 1)).max() < 0.01


def test_to_uint8_clamps():
    img = np.array([[[-1.0, 0.5, 2.0]]], np.float32)
    out = to_uint8(img)
    assert out[0, 0, 0] == 0 and out[0, 0, 2] == 255


def test_compile_cache_enable(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at the configured directory, is
    idempotent, and honors the RR_NO_COMPILE_CACHE kill switch."""
    import jax

    from rust_renderer_tpu.utils import compile_cache

    old_dir = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setattr(compile_cache, "_enabled", False)
        monkeypatch.setenv("RR_COMPILE_CACHE", str(tmp_path / "xla"))
        assert compile_cache.enable_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
        assert os.path.isdir(str(tmp_path / "xla"))
        assert compile_cache.enable_persistent_cache()  # idempotent

        monkeypatch.setattr(compile_cache, "_enabled", False)
        monkeypatch.setenv("RR_NO_COMPILE_CACHE", "1")
        assert not compile_cache.enable_persistent_cache()
    finally:
        # jax.config is process-global: don't leave later tests writing
        # cache entries into this (deleted) tmp_path.
        jax.config.update("jax_compilation_cache_dir", old_dir)
        compile_cache._enabled = False
