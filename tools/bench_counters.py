"""Count traversal iterations / leaf pops per packet on real fronts (TPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.models import create_scene
from rust_renderer_tpu.ops import bvh as bvhmod
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops import rng as rngmod
from rust_renderer_tpu.ops.pallas import traversal as ptrav
from rust_renderer_tpu.settings import RenderSettings

n = 512
r = rt.Renderer()
cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
create_scene(r, cam)
scene = r.pack()
bvh = bvhmod.build_scene_bvh(scene)
view = RenderSettings.default().with_camera(cam, n, n)
py = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0) + 0.5
px = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1) + 0.5
o0, d0 = rayops.generate_camera_rays(
    view.inverse_view, view.inverse_projection, px, py, n, n)


def pack(x, tile=32):
    x = x.reshape(n // tile, tile, n // tile, tile)
    return x.transpose(0, 2, 1, 3).reshape(-1, tile * tile).reshape(-1, 8, 128)


@jax.jit
def run_stats(o, d):
    op = jnp.stack([pack(o[..., k]) for k in range(3)], axis=1)
    dp = jnp.stack([pack(d[..., k]) for k in range(3)], axis=1)
    tl = jnp.stack([pack(jnp.full((n, n), 1e-3)), pack(jnp.full((n, n), 1e4))], axis=1)
    out = ptrav._run(bvh.wnode_packed, bvh.leaf_packed, op, dp, tl,
                     bvh.leaf_tris.shape[1], False,
                     stack_size=7 * bvh.wide_depth + 8, wide=True, stats=True)
    t, p, u, v, stats = out
    return t, p, stats[:, 0, 0], stats[:, 1, 0]


@jax.jit
def make_bounce(o0, d0):
    from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas
    t, prim, u, v = traverse_packet_pallas(bvh, o0, d0)
    hitp = o0 + t[..., None] * d0
    ids = scene.indices[jnp.maximum(prim, 0)]
    nrm = (scene.normals[ids[..., 0]] * (1 - u - v)[..., None]
           + scene.normals[ids[..., 1]] * u[..., None]
           + scene.normals[ids[..., 2]] * v[..., None])
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    st = rngmod.init_rng(px.astype(jnp.int32), py.astype(jnp.int32), n, jnp.int32(1))
    st, sph = rngmod.random_in_unit_sphere_fast(st)
    hit = prim >= 0
    o1 = jnp.where(hit[..., None], hitp + nrm * 1e-3, 0.0)
    d1 = jnp.where(hit[..., None], nrm + sph, 0.0)
    return o1, d1


o1, d1 = make_bounce(o0, d0)
for name, (o, d) in (("primary", (o0, d0)), ("bounce1", (o1, d1))):
    t, p, iters, leaves = run_stats(o, d)
    iters = np.asarray(iters); leaves = np.asarray(leaves)
    print(f"{name}: blocks={iters.size} iters mean={iters.mean():.0f} "
          f"max={iters.max()} leaf_pops mean={leaves.mean():.0f} "
          f"internal mean={(iters-leaves).mean():.0f}")
