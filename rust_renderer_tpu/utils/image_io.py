"""Offscreen 'swapchain': image readback + save (SURVEY.md §7.1 presents map
to off-screen render + readback on a headless TPU host)."""

from __future__ import annotations

import numpy as np


def to_uint8(image: np.ndarray) -> np.ndarray:
    """Clamp a float image (already display-encoded) to uint8 RGB(A)."""
    return (np.clip(np.asarray(image), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, image) -> None:
    arr = to_uint8(image)
    try:
        from PIL import Image

        mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
        Image.fromarray(arr, mode).save(path)
    except ImportError:  # pragma: no cover — minimal PPM fallback
        if not path.endswith(".ppm"):
            path = path + ".ppm"
        with open(path, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
            f.write(arr[..., :3].tobytes())
