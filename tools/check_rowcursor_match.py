"""Correctness check: row-cursor kernel vs binary + sdd kernels on TPU.

Counts exact-t and prim mismatches on the Sponza-scale scene for a
divergent front — the bug class the round-3 denormal-flush fix closed
(prim ids zeroed while t stayed exact)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.models import create_sponza_scale_scene
from rust_renderer_tpu.ops import bvh as bvhmod
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas
from rust_renderer_tpu.settings import RenderSettings


def main():
    n = 512
    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    create_sponza_scale_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_scene_bvh(scene)

    view = RenderSettings.default().with_camera(cam, n, n)
    py = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1) + 0.5
    o, d = rayops.generate_camera_rays(
        view.inverse_view, view.inverse_projection, px, py, n, n)
    rng = np.random.default_rng(0)
    dd = rng.normal(size=(n, n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    dd = jnp.asarray(dd)

    variants = {
        "binary": dict(wide=False),
        "sdd": dict(wide=True, multi=1, steady_drain=3, dma_leaf=True),
        "rowcursor": dict(wide=True, multi=1, steady_drain=3, dma_leaf=True,
                          row_cursors=8, row_expand=2),
    }
    ok = True
    for front_name, dirs in (("primary", d), ("divergent", dd)):
        outs = {}
        for name, kw in variants.items():
            f = jax.jit(
                lambda o, d, kw=kw: traverse_packet_pallas(bvh, o, d, **kw))
            t, prim, u, v = jax.block_until_ready(f(o, dirs))
            outs[name] = (np.asarray(t), np.asarray(prim))
            print(f"{front_name}/{name}: hits={np.sum(outs[name][1] >= 0)}",
                  flush=True)

        t0, p0 = outs["binary"]
        for name in ("sdd", "rowcursor"):
            t, p = outs[name]
            t_mis = int(np.sum(t != t0))
            p_mis = int(np.sum(p != p0))
            print(f"{front_name}/{name}: t mismatches={t_mis}/{t.size} "
                  f"prim mismatches={p_mis}", flush=True)
            if t_mis:
                idx = np.argwhere(t != t0)[:5]
                for i, j in idx:
                    print(f"  [{i},{j}] t {t0[i, j]:.6f} vs {t[i, j]:.6f} "
                          f"prim {p0[i, j]} vs {p[i, j]}")
                ok = False
            elif p_mis:
                # same t, different prim: only legal where triangles tie
                idx = np.argwhere(p != p0)[:5]
                for i, j in idx:
                    print(f"  tie [{i},{j}] t={t0[i, j]:.6f} "
                          f"prim {p0[i, j]} vs {p[i, j]}")
    print("OK" if ok else "T-MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
