"""Does XLA-on-TPU gather cost scale with TABLE size (table-scan lowering)
or with INDEX count? 66M indices fixed, table rows swept 2M -> 4k.
If per-index cost drops with table size, the SSAO fetch should be banded
(gather each horizontal image band from a band-local table)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

R = 32 * 1080 * 1920


def main():
    rng = np.random.default_rng(0)
    for n in (1920 * 1080, 1920 * 1080 // 8, 1920 * 1080 // 64, 4096):
        vz = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, size=(R,)).astype(np.int32))

        @jax.jit
        def f(vz, idx):
            return vz[idx].sum()

        float(np.asarray(f(vz, idx)))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            s = float(np.asarray(f(vz, idx)))
        t = (time.perf_counter() - t0) / reps
        print(f"table {n:9d} rows: {t*1000:8.1f} ms  ({t/R*1e9:5.2f} ns/idx)",
              flush=True)


if __name__ == "__main__":
    main()
