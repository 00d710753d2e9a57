"""Generate the 256x256 converged CPU-reference path-trace golden.

The north-star validation gate (BASELINE config 1 / SURVEY §4 item 2) wants
<1% RMSE between the framework's render and an independent reference at the
EVALUATION size, 256². The independent CPU tracer (tests/cpu_reference.py)
costs ~54 us/sample-pixel, so the converged side (512 spp here, ~25 min) is
generated ONCE by this tool and committed; the suite's slow test re-renders
only the framework side (~70 s at 96 spp) against it — see
tests/test_pathtrace_golden.py::test_rtiow_golden_256_rmse_under_1pct.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZE = 256
SPP = 512
BOUNCES = 3


def main() -> int:
    from tests import cpu_reference
    from rust_renderer_tpu.utils.image_io import save_png

    t0 = time.time()
    img = cpu_reference.render(
        width=SIZE, height=SIZE, spp=SPP, bounces=BOUNCES,
        eye=(0, 1, 4), target=(0, 0.5, -1), fov_degrees=60.0, sun_nee=True,
    )
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       f"rtiow_{SIZE}_cpu_{SPP}spp.npy")
    out = os.path.abspath(out)
    np.save(out, img.astype(np.float32))
    save_png(out.replace(".npy", ".png"), np.clip(img, 0, 1) ** (1 / 2.2))
    print(f"wrote {out} in {time.time()-t0:.0f}s "
          f"(mean {img.mean():.4f}, max {img.max():.3f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
