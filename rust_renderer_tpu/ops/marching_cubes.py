"""Marching cubes: vectorized classify / interpolate / emit.

Rebuild of utopian/shaders/marching_cubes/marching_cubes.comp: a 32^3 voxel
grid over an animated SDF (torus + box + pulsing sphere carved from a solid,
marching_cubes.comp:56-120), classic MC via the Bourke tables, gradient
normals (:161-177), and an indirect draw count (:237-253).

TPU-native shape: the GPU's per-voxel `atomicAdd` vertex append becomes the
capacity+mask pattern (SURVEY.md §7.3 item 3) — every voxel owns 5 triangle
slots; unused slots are collapsed (degenerate) triangles that rasterize to
nothing. An optional cumsum compaction produces tightly packed vertices for
consumers that want them (BVH refit). `vertex_count` mirrors the reference's
DrawIndirectCommand.vertexCount.

The 256x16 triangle connectivity table is the canonical public-domain
marching-cubes table (P. Bourke, "Polygonising a scalar field"), embedded as
a compressed blob; the edge table is derived from it.
"""

from __future__ import annotations

import base64
import zlib
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

import os

_DATA_PATH = os.path.join(os.path.dirname(__file__), "mc_tables.bin")


def _tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    with open(_DATA_PATH, "rb") as f:
        tri = np.frombuffer(zlib.decompress(f.read()), np.int8).reshape(256, 16)
    tri = tri.astype(np.int32)
    # Edge table: bit e set iff edge e appears in the case's triangle list.
    edge = np.zeros(256, np.int32)
    for c in range(256):
        for e in tri[c]:
            if e >= 0:
                edge[c] |= 1 << int(e)
    counts = (tri >= 0).sum(1) // 3
    return tri, edge, counts


_TRI_TABLE_NP, _EDGE_TABLE_NP, _TRI_COUNT_NP = _tables()

# Edge -> (corner a, corner b), Bourke numbering; corner offsets follow
# renderers/marching_cubes.rs:25-34.
_EDGE_CORNERS = np.array(
    [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
     (0, 4), (1, 5), (2, 6), (3, 7)],
    np.int32,
)
_CORNER_OFFSETS = np.array(
    [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
     (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
    np.float32,
)

MAX_TRIS_PER_VOXEL = 5


# -- the reference's animated SDF (marching_cubes.comp:56-120) ----------------


def _sd_sphere(p, s):
    return jnp.linalg.norm(p, axis=-1) - s


def _sd_torus(p, t):
    q = jnp.stack(
        [jnp.linalg.norm(p[..., [0, 2]], axis=-1) - t[0], p[..., 1]], axis=-1
    )
    return jnp.linalg.norm(q, axis=-1) - t[1]


def _sd_box(p, b):
    d = jnp.abs(p) - b
    outside = jnp.linalg.norm(jnp.maximum(d, 0.0), axis=-1)
    inside = jnp.minimum(jnp.maximum(d[..., 0], jnp.maximum(d[..., 1], d[..., 2])), 0.0)
    return outside + inside


def default_density(pos: jax.Array, time: jax.Array) -> jax.Array:
    """marching_cubes.comp density(): solid (-1) with shapes carved out by
    max(-sdf, d): a torus at (10,20,10), a box at (10,10,10), and a sphere at
    (10,26,10) pulsing with |sin(0.3 t)|."""
    d = jnp.full(pos.shape[:-1], -1.0)
    d = jnp.maximum(-_sd_torus(pos - jnp.asarray([10.0, 20.0, 10.0]), (5.0, 3.0)), d)
    d = jnp.maximum(-_sd_box(pos - jnp.asarray([10.0, 10.0, 10.0]), jnp.asarray([5.0] * 3)), d)
    r = 8.0 * jnp.abs(jnp.sin(time * 0.3))
    d = jnp.maximum(-_sd_sphere(pos - jnp.asarray([10.0, 26.0, 10.0]), r), d)
    return d


class MarchingCubesResult(NamedTuple):
    positions: jax.Array  # (T, 3, 3) triangle vertices (degenerate = unused)
    normals: jax.Array  # (T, 3, 3) per-vertex gradient normals
    valid: jax.Array  # (T,) bool
    vertex_count: jax.Array  # scalar i32 — DrawIndirectCommand.vertexCount


def marching_cubes(
    density_fn=default_density,
    grid: int = 32,
    voxel_size: float = 1.0,
    iso_level: float = 0.0,
    time: jax.Array | float = 0.0,
    flat_normals: bool = False,
) -> MarchingCubesResult:
    """Extract the isosurface. T = grid^3 * MAX_TRIS_PER_VOXEL slots."""
    time = jnp.asarray(time, jnp.float32)
    tri_table = jnp.asarray(_TRI_TABLE_NP)
    tri_count = jnp.asarray(_TRI_COUNT_NP)

    # Corner lattice densities: (grid+1)^3 — one evaluation per lattice point
    # (the reference evaluates per voxel-corner redundantly; same values).
    n1 = grid + 1
    ii = jnp.arange(n1, dtype=jnp.float32) * voxel_size
    gx, gy, gz = jnp.meshgrid(ii, ii, ii, indexing="ij")
    lattice = jnp.stack([gx, gy, gz], axis=-1)
    dens = density_fn(lattice, time)  # (n1, n1, n1)

    # Per-voxel 8-corner gather -> case index (comp:184-190).
    vi = jnp.arange(grid)
    vx, vy, vz = jnp.meshgrid(vi, vi, vi, indexing="ij")
    vx = vx.reshape(-1)
    vy = vy.reshape(-1)
    vz = vz.reshape(-1)

    corner_d = []
    for cx, cy, cz in _CORNER_OFFSETS.astype(np.int32):
        corner_d.append(dens[vx + cx, vy + cy, vz + cz])
    corner_d = jnp.stack(corner_d, axis=-1)  # (V, 8)

    case = jnp.zeros(corner_d.shape[0], jnp.int32)
    for i in range(8):
        case = case | jnp.where(corner_d[..., i] < iso_level, 1 << i, 0)

    base = jnp.stack([vx, vy, vz], axis=-1).astype(jnp.float32) * voxel_size  # (V,3)

    # Edge interpolation for all 12 edges of every voxel (comp:200-231);
    # vertexInterp: mix(p1, p2, (iso - v1) / (v2 - v1)).
    edge_pos = []
    for e in range(12):
        a, b = _EDGE_CORNERS[e]
        pa = base + jnp.asarray(_CORNER_OFFSETS[a] * voxel_size)
        pb = base + jnp.asarray(_CORNER_OFFSETS[b] * voxel_size)
        va = corner_d[..., a]
        vb = corner_d[..., b]
        t = (iso_level - va) / jnp.where(jnp.abs(vb - va) < 1e-12, 1e-12, vb - va)
        t = jnp.clip(t, 0.0, 1.0)[..., None]
        edge_pos.append(pa + (pb - pa) * t)
    edge_pos = jnp.stack(edge_pos, axis=1)  # (V, 12, 3)

    # Triangle emission: 5 slots x 3 edges from the case table.
    entries = tri_table[case]  # (V, 16)
    tris = []
    valids = []
    for s in range(MAX_TRIS_PER_VOXEL):
        e0 = entries[:, s * 3 + 0]
        e1 = entries[:, s * 3 + 1]
        e2 = entries[:, s * 3 + 2]
        ok = e0 >= 0
        v0 = jnp.take_along_axis(edge_pos, jnp.maximum(e0, 0)[:, None, None], axis=1)[:, 0]
        v1 = jnp.take_along_axis(edge_pos, jnp.maximum(e1, 0)[:, None, None], axis=1)[:, 0]
        v2 = jnp.take_along_axis(edge_pos, jnp.maximum(e2, 0)[:, None, None], axis=1)[:, 0]
        tri = jnp.stack([v0, v1, v2], axis=1)  # (V, 3, 3)
        tri = jnp.where(ok[:, None, None], tri, 0.0)  # degenerate when unused
        tris.append(tri)
        valids.append(ok)

    positions = jnp.concatenate(tris, axis=0)  # (5V, 3, 3)
    valid = jnp.concatenate(valids, axis=0)

    # Normals: -normalize(grad density) at each vertex (comp:161-177), or
    # flat face normals when requested (the reference's flatNormals toggle).
    if flat_normals:
        face_n = jnp.cross(
            positions[:, 1] - positions[:, 0], positions[:, 2] - positions[:, 0]
        )
        face_n = face_n / jnp.maximum(
            jnp.linalg.norm(face_n, axis=-1, keepdims=True), 1e-12
        )
        normals = jnp.tile(face_n[:, None, :], (1, 3, 1))
    else:
        flat_v = positions.reshape(-1, 3)
        d = 1.0
        grads = []
        for axis in range(3):
            off = jnp.zeros(3).at[axis].set(d)
            gp = density_fn(flat_v + off, time) - density_fn(flat_v - off, time)
            grads.append(gp)
        grad = jnp.stack(grads, axis=-1)
        normals = -grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)
        normals = normals.reshape(positions.shape)

    vertex_count = 3 * tri_count[case].sum()
    return MarchingCubesResult(
        positions=positions, normals=normals, valid=valid,
        vertex_count=vertex_count.astype(jnp.int32),
    )


def compact(result: MarchingCubesResult, capacity: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Prefix-sum compaction of valid triangles into a fixed-capacity buffer
    (the analog of the reference's atomicAdd append order, deterministic).
    Returns (positions (capacity,3,3), normals, count)."""
    idx = jnp.cumsum(result.valid.astype(jnp.int32)) - 1
    idx = jnp.where(result.valid, idx, capacity)  # overflow slot
    pos_out = jnp.zeros((capacity + 1, 3, 3), result.positions.dtype)
    nrm_out = jnp.zeros((capacity + 1, 3, 3), result.normals.dtype)
    pos_out = pos_out.at[idx].set(result.positions, mode="drop")
    nrm_out = nrm_out.at[idx].set(result.normals, mode="drop")
    count = jnp.minimum(result.valid.sum(), capacity)
    return pos_out[:capacity], nrm_out[:capacity], count
