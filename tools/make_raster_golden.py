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
    return 0


if __name__ == "__main__":
    sys.exit(main())
