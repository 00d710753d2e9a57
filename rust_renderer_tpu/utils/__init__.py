from rust_renderer_tpu.utils.fps_timer import FpsTimer
from rust_renderer_tpu.utils import math3d

__all__ = ["FpsTimer", "math3d"]
