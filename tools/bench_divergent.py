"""Microbench: divergent-front strategies on the real TPU.

Fronts: a REAL lambertian bounce front (normal + unit-sphere from primary
hits) and worst-case random directions. Strategies: pallas wide/binary as-is,
octant+morton sorted (argsort and cumsum-bucket permutations) + pallas.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.models import create_scene
from rust_renderer_tpu.ops import bvh as bvhmod
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops import rng as rngmod
from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas
from rust_renderer_tpu.settings import RenderSettings


def sort_keys(bvh, o, d):
    scene_lo = bvh.node_min[0]
    scene_span = jnp.maximum(bvh.node_max[0] - scene_lo, 1e-6)
    q = jnp.clip(((o - scene_lo) / scene_span * 64.0), 0, 63).astype(jnp.uint32)

    def expand6(v):
        v = v & jnp.uint32(0x3F)
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C3)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249)
        return v

    morton = expand6(q[:, 0]) | (expand6(q[:, 1]) << jnp.uint32(1)) | (
        expand6(q[:, 2]) << jnp.uint32(2))
    octant = ((d[:, 0] >= 0).astype(jnp.uint32)
              | ((d[:, 1] >= 0).astype(jnp.uint32) << jnp.uint32(1))
              | ((d[:, 2] >= 0).astype(jnp.uint32) << jnp.uint32(2)))
    return (octant << jnp.uint32(18)) | morton, octant


def perm_argsort(key):
    return jnp.argsort(key)


def perm_bucket(bucket, n_buckets):
    """Stable counting-sort permutation via one cumsum per bucket."""
    n = bucket.shape[0]
    order = jnp.zeros(n, jnp.int32)
    base = jnp.int32(0)
    for b in range(n_buckets):
        m = (bucket == b)
        rank = jnp.cumsum(m.astype(jnp.int32)) - 1
        dest = base + rank
        order = jnp.where(m, dest, order)
        base = base + jnp.sum(m.astype(jnp.int32))
    # order maps src->dest; invert to gather: inv[dest] = src
    inv = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return inv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    n = args.size

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

    # Primary hits -> lambertian bounce front (the real bounce-1 shape).
    @jax.jit
    def make_bounce(o0, d0):
        t, prim, u, v = traverse_packet_pallas(bvh, o0, d0)
        hitp = o0 + t[..., None] * d0
        ids = scene.indices[jnp.maximum(prim, 0)]
        nrm = (scene.normals[ids[..., 0]] * (1 - u - v)[..., None]
               + scene.normals[ids[..., 1]] * u[..., None]
               + scene.normals[ids[..., 2]] * v[..., None])
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
        st = rngmod.init_rng(px.astype(jnp.int32), py.astype(jnp.int32), n, jnp.int32(1))
        st, sph = rngmod.random_in_unit_sphere_fast(st)
        nd = nrm + sph
        hit = prim >= 0
        o1 = jnp.where(hit[..., None], hitp + nrm * 1e-3, 0.0)
        d1 = jnp.where(hit[..., None], nd, 0.0)
        return o1, d1

    o1, d1 = make_bounce(o0, d0)
    jax.block_until_ready(o1)

    rng = np.random.default_rng(0)
    dd = rng.normal(size=(n, n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    drand = jnp.asarray(dd)

    def timeit(f, *a):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps * 1000, out

    plain = jax.jit(lambda o, d: traverse_packet_pallas(bvh, o, d, wide=True))
    plain_bin = jax.jit(lambda o, d: traverse_packet_pallas(bvh, o, d, wide=False))

    @jax.jit
    def sorted_argsort(o, d):
        of, df = o.reshape(-1, 3), d.reshape(-1, 3)
        key, octant = sort_keys(bvh, of, df)
        orderi = perm_argsort(key)
        t, p, u, v = traverse_packet_pallas(bvh, of[orderi], df[orderi], wide=True)
        inv = jnp.argsort(orderi)
        return t[inv].reshape(o.shape[:-1]), p[inv].reshape(o.shape[:-1])

    @jax.jit
    def sorted_bucket(o, d):
        of, df = o.reshape(-1, 3), d.reshape(-1, 3)
        key, octant = sort_keys(bvh, of, df)
        gath = perm_bucket(octant.astype(jnp.int32), 8)
        t, p, u, v = traverse_packet_pallas(bvh, of[gath], df[gath], wide=True)
        # scatter back
        nr = of.shape[0]
        t2 = jnp.zeros(nr, t.dtype).at[gath].set(t.reshape(-1))
        p2 = jnp.zeros(nr, p.dtype).at[gath].set(p.reshape(-1))
        return t2.reshape(o.shape[:-1]), p2.reshape(o.shape[:-1])

    for name, front in (("bounce1", (o1, d1)), ("random", (o0, drand))):
        o, d = front
        ms_w, out_w = timeit(plain, o, d)
        ms_b, _ = timeit(plain_bin, o, d)
        ms_sa, out_sa = timeit(sorted_argsort, o, d)
        ms_sb, out_sb = timeit(sorted_bucket, o, d)
        ok_sa = np.array_equal(np.asarray(out_sa[1]), np.asarray(out_w[1]))
        ok_sb = np.array_equal(np.asarray(out_sb[1]), np.asarray(out_w[1]))
        print(f"{name}: wide {ms_w:.1f} binary {ms_b:.1f} "
              f"sorted_argsort {ms_sa:.1f} (match {ok_sa}) "
              f"sorted_bucket {ms_sb:.1f} (match {ok_sb})")


if __name__ == "__main__":
    main()
