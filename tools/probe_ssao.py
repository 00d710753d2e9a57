"""Standalone TPU timing of ops/ssao.py at 1080p — attributes the ~569 ms
raster-frame fusion (tools/profile_frame.py 1920x1080 raster, fusion.60).

Also times variants to find the cost split:
  - full        : the production ssao()
  - index_only  : everything except the gather+accumulate (sample projection)
  - gather_only : the 66M-row gather alone on precomputed indices
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.ops import ssao as ssao_mod
from rust_renderer_tpu.ops.gather import row_gather

H, W = 1080, 1920


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    # force a tiny readback per rep: block_until_ready alone has been seen
    # not to block under the axon tunnel (PERFORMANCE.md r3)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-10, 10, (H, W, 4)).astype(np.float32))
    nrm = rng.standard_normal((H, W, 4)).astype(np.float32)
    nrm /= np.linalg.norm(nrm[..., :3], axis=-1, keepdims=True)
    nrm = jnp.asarray(nrm)
    view = jnp.asarray(np.eye(4, dtype=np.float32))
    proj = np.eye(4, dtype=np.float32)
    proj[3, 2] = -1.0
    proj = jnp.asarray(proj)
    radius = jnp.float32(0.1)
    bias = jnp.float32(0.0)

    full = jax.jit(ssao_mod.ssao)
    t = timeit(full, pos, nrm, view, proj, radius, bias)
    print(f"ssao full 1080p: {t*1000:.1f} ms")

    # gather_only: same index volume (32*H*W) from an (H*W,1) table
    vz = jnp.asarray(rng.standard_normal((H * W, 1)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, H * W, size=(ssao_mod.KERNEL_SIZE * H * W,))
        .astype(np.int32))

    @jax.jit
    def gather_only(vz, idx):
        return row_gather(vz, idx).sum()

    t = timeit(gather_only, vz, idx)
    print(f"gather only (66M random rows): {t*1000:.1f} ms")

    # coherent indices (what SSAO actually produces: near-diagonal)
    base = np.repeat(np.arange(H * W, dtype=np.int64)[None, :],
                     ssao_mod.KERNEL_SIZE, 0)
    jitter = rng.integers(-50 * W, 50 * W, size=base.shape)
    idx_c = jnp.asarray(np.clip(base + jitter, 0, H * W - 1)
                        .astype(np.int32).ravel())
    t = timeit(gather_only, vz, idx_c)
    print(f"gather only (66M coherent rows): {t*1000:.1f} ms")


if __name__ == "__main__":
    main()
