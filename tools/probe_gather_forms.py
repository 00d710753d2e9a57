"""Gather-lowering shootout for the SSAO fetch (66M indices from a 2M-texel
depth image at 1080p): probe_ssao.py measured the production row_gather on
an (HW, 1) table at ~9.3 ns/index — 6.6x the ~1.4 ns/row packed-row cost
measured on WIDE tables. Candidates:

  rowg      : production row_gather, (HW,1) table          (baseline)
  flat      : vz_flat[idx] 1D element gather
  take      : jnp.take(vz_flat, idx)
  dyn2d     : table[(idx_y, idx_x)] 2D coordinate gather
  rowg16    : row_gather from a (HW/8, 8) table, 8 samples share no row —
              fetch WIDE rows and select the lane (idx//8 row, idx%8 lane)
  rowg128   : same with (HW/128, 128) rows
  sortu     : flat gather with indices_are_sorted=True on ~coherent idx

All produce the identical values; timings fold to a scalar inside jit and
read it back (block_until_ready alone does not block under the axon tunnel,
PERFORMANCE.md r3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.ops.gather import row_gather

H, W = 1080, 1920
K = 32
N = H * W
R = K * N


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        s = float(np.asarray(out))
    return (time.perf_counter() - t0) / reps, s


def main():
    rng = np.random.default_rng(0)
    vz = rng.standard_normal((N,)).astype(np.float32)
    # SSAO-like indices: near-diagonal with +-50-row jitter.
    base = np.repeat(np.arange(N, dtype=np.int64)[None, :], K, 0)
    jitter = rng.integers(-50 * W, 50 * W, size=base.shape)
    idx = np.clip(base + jitter, 0, N - 1).astype(np.int32).ravel()

    vz_j = jnp.asarray(vz)
    idx_j = jnp.asarray(idx)

    @jax.jit
    def rowg(vz, idx):
        return row_gather(vz[:, None], idx).sum()

    @jax.jit
    def flat(vz, idx):
        return vz[idx].sum()

    @jax.jit
    def take(vz, idx):
        return jnp.take(vz, idx, mode="clip").sum()

    @jax.jit
    def dyn2d(vz, idx):
        img = vz.reshape(H, W)
        return img[(idx // W, idx % W)].sum()

    def make_rowg_wide(width):
        @jax.jit
        def f(vz, idx):
            t = vz.reshape(-1, width)
            rows = row_gather(t, idx // width)
            lane = jax.nn.one_hot(idx % width, width, dtype=vz.dtype)
            return (rows * lane).sum()
        return f

    @jax.jit
    def sortu(vz, idx):
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        return jax.lax.gather(
            vz[:, None], idx[:, None], dnums, slice_sizes=(1, 1),
            mode="clip", indices_are_sorted=True,
        ).sum()

    ref = None
    for name, fn in [
        ("rowg", rowg), ("flat", flat), ("take", take), ("dyn2d", dyn2d),
        ("rowg8", make_rowg_wide(8)), ("rowg128", make_rowg_wide(128)),
        ("sortu", sortu),
    ]:
        try:
            t, s = timeit(fn, vz_j, idx_j)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        if ref is None:
            ref = s
        ok = "ok" if abs(s - ref) < abs(ref) * 1e-3 + 1.0 else f"MISMATCH {s} vs {ref}"
        print(f"{name:8s}: {t*1000:8.1f} ms  ({t/R*1e9:5.2f} ns/idx)  {ok}",
              flush=True)


if __name__ == "__main__":
    main()
