"""Regenerate the raster-mode golden images (tests/test_raster_golden.py).

Runs on the CPU backend with the 8-device test topology so the goldens match
what the suite renders. Writes .npy goldens plus .png proofs to eyeball
before committing an intended change.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_raster_golden import GOLDEN, SIZE, _render

    from rust_renderer_tpu.utils.image_io import save_png

    os.makedirs(GOLDEN, exist_ok=True)
    for mode in ("RASTERIZED", "MINIMAL"):
        img = _render(mode)
        path = os.path.join(GOLDEN, f"{mode.lower()}_{SIZE}.npy")
        np.save(path, img)
        save_png(path.replace(".npy", ".png"), img)
        print(f"wrote {path} (mean {img.mean():.4f}, max {img.max():.4f})")

    # Shadow-cascade golden (test_shadow_cascade_golden): same scene/config.
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
    path = os.path.join(GOLDEN, f"shadow_cascades_{SIZE}.npy")
    np.save(path, sm)
    for i in range(sm.shape[0]):
        save_png(path.replace(".npy", f"_c{i}.png"),
                 np.repeat(sm[i][..., None], 3, axis=-1))
    print(f"wrote {path} (mean {sm.mean():.4f}, min {sm.min():.4f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
