"""Vertex/Primitive: host-side geometry containers.

Mirrors utopian/src/primitive.rs: `Vertex{pos: vec4, normal: vec4, uv: vec2,
color: vec4, tangent: vec4}` (primitive.rs:9-17). TPU-native representation is
struct-of-arrays numpy (packed later into HBM pools by the Renderer) instead
of interleaved GPU vertex buffers; there is no fixed-function vertex fetch to
feed, and SoA is what vectorized kernels want.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Vertex:
    """Scalar convenience constructor (primitive.rs:27-37)."""

    pos: np.ndarray
    normal: np.ndarray
    uv: np.ndarray
    color: np.ndarray
    tangent: np.ndarray

    @staticmethod
    def new(x: float, y: float, z: float) -> "Vertex":
        return Vertex(
            pos=np.array([x, y, z], np.float32),
            normal=np.zeros(3, np.float32),
            uv=np.zeros(2, np.float32),
            color=np.ones(4, np.float32),
            tangent=np.zeros(4, np.float32),
        )


@dataclasses.dataclass
class Primitive:
    """SoA geometry for one mesh primitive (primitive.rs:19-70).

    positions: (V,3) f32; normals: (V,3); uvs: (V,2); colors: (V,4);
    tangents: (V,4) (w = handedness); indices: (I,) u32, triangle list.
    """

    positions: np.ndarray
    normals: np.ndarray
    uvs: np.ndarray
    colors: np.ndarray
    tangents: np.ndarray
    indices: np.ndarray

    def __post_init__(self) -> None:
        v = len(self.positions)
        assert self.normals.shape == (v, 3)
        assert self.uvs.shape == (v, 2)
        assert self.colors.shape == (v, 4)
        assert self.tangents.shape == (v, 4)
        assert self.indices.ndim == 1 and self.indices.size % 3 == 0

    @property
    def num_vertices(self) -> int:
        return len(self.positions)

    @property
    def num_triangles(self) -> int:
        return self.indices.size // 3

    @staticmethod
    def from_vertices(indices, vertices: list[Vertex]) -> "Primitive":
        return Primitive(
            positions=np.stack([v.pos[:3] for v in vertices]).astype(np.float32),
            normals=np.stack([v.normal[:3] for v in vertices]).astype(np.float32),
            uvs=np.stack([v.uv for v in vertices]).astype(np.float32),
            colors=np.stack([v.color for v in vertices]).astype(np.float32),
            tangents=np.stack([v.tangent for v in vertices]).astype(np.float32),
            indices=np.asarray(indices, np.uint32),
        )
