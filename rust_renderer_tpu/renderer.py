"""Scene GPU registry: the TPU analog of bindless resources.

Rebuilds utopian/src/renderer.rs + utopian/src/bindless.rs: the reference
keeps one global descriptor set (set 0) with texture/vertex/index arrays and
material/mesh/light tables, assigning bindless indices as models are added
(renderer.rs:222-299). Here the same registry packs into **HBM scene arrays**
(`PackedScene`): concatenated world-space vertex/index pools with per-triangle
mesh ids, struct-of-array material/light tables, and a fixed-size texture
array — integer handles everywhere, gathered inside jitted kernels.

Caps mirror renderer.rs:5-7 (1024 materials/meshes/lights) — here they are
soft since arrays grow as needed; bindless.rs's 512-descriptor cap maps to the
texture-array axis.

Raytrace properties encoding matches GpuMaterial.raytrace_properties
(renderer.rs:20-36): type 0 = lambertian, 1 = metal, 2 = dielectric,
3 = diffuse light; property = fuzz (metal) or index of refraction
(dielectric).
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.scene.gltf_loader import (
    DEFAULT_TEXTURE_MAP,
    Model,
)
from rust_renderer_tpu.utils import math3d

log = logging.getLogger(__name__)

MAX_NUM_GPU_MATERIALS = 1024
MAX_NUM_GPU_MESHES = 1024
MAX_NUM_GPU_LIGHTS = 1024

# Texture-array tile size: all bindless textures are resampled to this square
# (the fixed-shape alternative to a Vulkan descriptor array; SURVEY.md §7.1).
TEXTURE_TILE = 512


@dataclasses.dataclass
class ModelInstance:
    """renderer.rs:15-18."""

    model: Model
    transform: np.ndarray  # (4,4)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedScene:
    """Immutable HBM scene arrays — the jit-side view of the registry.

    Geometry is pre-transformed to world space (the reference pushes world
    matrices per draw and bakes instance transforms into the TLAS,
    raytracing.rs:219-277; static scenes make pack-time transform the
    TPU-native choice — a transform edit re-packs only the touched mesh).
    """

    # Vertex pools (V, ·) float32, world space.
    positions: jax.Array
    normals: jax.Array
    uvs: jax.Array
    colors: jax.Array
    tangents: jax.Array
    # Triangles: (T, 3) int32 into pools; (T,) int32 gpu-mesh id.
    indices: jax.Array
    tri_mesh: jax.Array
    # Mesh table (M,): material id per gpu mesh.
    mesh_material: jax.Array
    # Material table (K, ·) — GpuMaterial SoA (renderer.rs:20-36).
    mat_diffuse_map: jax.Array
    mat_normal_map: jax.Array
    mat_mr_map: jax.Array
    mat_occlusion_map: jax.Array
    mat_base_color: jax.Array
    mat_metallic: jax.Array
    mat_roughness: jax.Array
    mat_rt_type: jax.Array
    mat_rt_prop: jax.Array
    # Light table (L, ·) — GpuLight SoA (renderer.rs:46-59).
    light_color: jax.Array
    light_pos: jax.Array
    light_range: jax.Array
    light_dir: jax.Array
    light_spot: jax.Array
    light_att: jax.Array
    light_type: jax.Array
    light_intensity: jax.Array
    # Bindless texture array: (N, TEXTURE_TILE, TEXTURE_TILE, 4) uint8.
    textures: jax.Array
    # Analytic spheres (optional fast path for RTIOW-style scenes):
    # (S, 3) centers, (S,) radii, (S,) material ids. S may be 0.
    sphere_center: jax.Array
    sphere_radius: jax.Array
    sphere_material: jax.Array

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    @property
    def num_lights(self) -> int:
        return self.light_pos.shape[0]


def _resample_texture(img: np.ndarray, size: int = TEXTURE_TILE) -> np.ndarray:
    if img.shape[0] == size and img.shape[1] == size:
        return img
    try:
        from PIL import Image as PILImage

        pim = PILImage.fromarray(img, "RGBA").resize((size, size), PILImage.BILINEAR)
        return np.asarray(pim, np.uint8)
    except ImportError:  # pragma: no cover
        ys = (np.arange(size) * img.shape[0] // size).clip(0, img.shape[0] - 1)
        xs = (np.arange(size) * img.shape[1] // size).clip(0, img.shape[1] - 1)
        return img[ys][:, xs]


def _default_textures() -> list[np.ndarray]:
    """Default white / flat-normal / metallic-roughness / black textures
    (renderer.rs:202-220 loads these from disk; values are canonical)."""
    white = np.full((TEXTURE_TILE, TEXTURE_TILE, 4), 255, np.uint8)
    flat_normal = np.empty_like(white)
    flat_normal[..., 0] = 128
    flat_normal[..., 1] = 128
    flat_normal[..., 2] = 255
    flat_normal[..., 3] = 255
    default_mr = np.zeros_like(white)
    default_mr[..., 1] = 255  # roughness (g) = 1.0
    default_mr[..., 3] = 255  # metallic (b) = 0.0
    black = np.zeros_like(white)
    black[..., 3] = 255
    return [white, flat_normal, default_mr, black]


class Renderer:
    """Owns the scene registry and assigns bindless indices on add
    (renderer.rs:123-299)."""

    def __init__(self) -> None:
        self.instances: list[ModelInstance] = []
        self.gpu_materials: list[dict] = []
        self.gpu_meshes: list[dict] = []  # {vertex_offset, index_offset, ..., material}
        self.gpu_lights: list[dict] = []
        self.textures: list[np.ndarray] = []
        self.spheres: list[dict] = []
        self.need_environment_map_update = True
        self._mesh_instance: list[tuple[int, int]] = []  # gpu_mesh -> (instance, mesh i)

        # initialize(): default textures get bindless indices 0..3
        # (renderer.rs:202-220).
        self.default_diffuse_map_index = self.add_bindless_texture(_default_textures()[0])
        self.default_normal_map_index = self.add_bindless_texture(_default_textures()[1])
        self.default_metallic_roughness_map_index = self.add_bindless_texture(
            _default_textures()[2]
        )
        self.default_occlusion_map_index = self.default_diffuse_map_index

    # -- registration (mirrors renderer.rs:222-410) --------------------------

    def add_bindless_texture(self, img: np.ndarray) -> int:
        index = len(self.textures)
        self.textures.append(_resample_texture(np.ascontiguousarray(img)))
        return index

    def add_model(self, model: Model, transform: np.ndarray) -> int:
        """Registers every mesh: model-local texture indices are remapped to
        bindless indices, material + mesh table entries appended, and
        mesh.gpu_mesh set to the global mesh id (renderer.rs:222-299).
        Returns the instance index."""
        instance_index = len(self.instances)
        texture_remap = [self.add_bindless_texture(t) for t in model.textures]

        def remap(local: int, default: int) -> int:
            if np.uint32(local) == DEFAULT_TEXTURE_MAP:
                return default
            return texture_remap[local]

        for mesh_i, mesh in enumerate(model.meshes):
            m = mesh.material
            material_index = len(self.gpu_materials)
            self.gpu_materials.append(
                dict(
                    diffuse_map=remap(m.diffuse_map, self.default_diffuse_map_index),
                    normal_map=remap(m.normal_map, self.default_normal_map_index),
                    metallic_roughness_map=remap(
                        m.metallic_roughness_map,
                        self.default_metallic_roughness_map_index,
                    ),
                    occlusion_map=remap(m.occlusion_map, self.default_occlusion_map_index),
                    base_color_factor=np.asarray(m.base_color_factor, np.float32),
                    metallic_factor=float(m.metallic_factor),
                    roughness_factor=float(m.roughness_factor),
                    rt_type=int(m.material_type),
                    rt_prop=float(m.material_property),
                )
            )
            gpu_mesh_index = len(self.gpu_meshes)
            self.gpu_meshes.append(dict(material=material_index))
            mesh.gpu_mesh = gpu_mesh_index
            self._mesh_instance.append((instance_index, mesh_i))

        self.instances.append(ModelInstance(model=model, transform=np.asarray(transform, np.float32)))
        self.need_environment_map_update = True
        log.info(
            "add_model: instance %d with %d meshes, %d textures (total meshes %d)",
            instance_index, len(model.meshes), len(model.textures), len(self.gpu_meshes),
        )
        return instance_index

    def add_light(self, position, color, range_: float = 1.0) -> int:
        """Point light with the reference's defaults: attenuation (0,0,0.1),
        intensity (1,1,1), type 1 (renderer.rs:391-410)."""
        light_index = len(self.gpu_lights)
        c = np.asarray(color, np.float32)
        self.gpu_lights.append(
            dict(
                color=np.array([c[0], c[1], c[2], 0.0], np.float32),
                position=np.asarray(position, np.float32),
                range=float(range_),
                direction=np.zeros(3, np.float32),
                spot=0.0,
                attenuation=np.array([0.0, 0.0, 0.1], np.float32),
                light_type=1.0,
                intensity=np.ones(3, np.float32),
            )
        )
        return light_index

    def add_sphere(self, center, radius: float, material_index: int | None = None,
                   material=None) -> int:
        """Analytic sphere primitive (TPU-native extra; the RTIOW fast path).

        If `material` (a scene.Material) is given it is appended to the
        material table; else `material_index` must reference an existing one.
        """
        if material is not None:
            material_index = len(self.gpu_materials)
            self.gpu_materials.append(
                dict(
                    diffuse_map=self.default_diffuse_map_index,
                    normal_map=self.default_normal_map_index,
                    metallic_roughness_map=self.default_metallic_roughness_map_index,
                    occlusion_map=self.default_occlusion_map_index,
                    base_color_factor=np.asarray(material.base_color_factor, np.float32),
                    metallic_factor=float(material.metallic_factor),
                    roughness_factor=float(material.roughness_factor),
                    rt_type=int(material.material_type),
                    rt_prop=float(material.material_property),
                )
            )
        assert material_index is not None
        self.spheres.append(
            dict(center=np.asarray(center, np.float32), radius=float(radius),
                 material=int(material_index))
        )
        return len(self.spheres) - 1

    def get_num_lights(self) -> int:
        return len(self.gpu_lights)

    def ensure_mc_material(self, color=(0.0, 1.0, 0.0, 1.0)) -> int:
        """Material for the marching-cubes isosurface in the path-traced
        scene (lambertian, the MC pass color — the raster path's draw color,
        renderers/marching_cubes.rs:63-135). Idempotent."""
        if getattr(self, "_mc_material_index", None) is not None:
            return self._mc_material_index
        self._mc_material_index = len(self.gpu_materials)
        self.gpu_materials.append(
            dict(
                diffuse_map=self.default_diffuse_map_index,
                normal_map=self.default_normal_map_index,
                metallic_roughness_map=self.default_metallic_roughness_map_index,
                occlusion_map=self.default_occlusion_map_index,
                base_color_factor=np.asarray(color, np.float32),
                metallic_factor=0.0,
                roughness_factor=1.0,
                rt_type=0,  # lambertian
                rt_prop=0.0,
            )
        )
        return self._mc_material_index

    def set_instance_transform(self, instance_index: int, transform: np.ndarray) -> None:
        """Gizmo move analog (prototype/src/main.rs:344-359) — next pack()
        rebuilds world-space pools (the TLAS-rebuild equivalent)."""
        self.instances[instance_index].transform = np.asarray(transform, np.float32)

    # -- packing --------------------------------------------------------------

    def pack(self) -> PackedScene:
        """Build the HBM scene arrays. Host-side numpy concat + one transfer."""
        log.info(
            "pack: %d instances, %d meshes, %d materials, %d lights, %d textures",
            len(self.instances), len(self.gpu_meshes), len(self.gpu_materials),
            len(self.gpu_lights), len(self.textures),
        )
        pos_list, nrm_list, uv_list, col_list, tan_list = [], [], [], [], []
        idx_list, tri_mesh_list = [], []
        v_offset = 0
        for gpu_mesh_id, (inst_i, mesh_i) in enumerate(self._mesh_instance):
            inst = self.instances[inst_i]
            mesh = inst.model.meshes[mesh_i]
            world = inst.transform @ inst.model.transforms[mesh_i]
            prim = mesh.primitive
            pos_list.append(math3d.transform_points(world, prim.positions))
            nrm_list.append(math3d.transform_normals(world, prim.normals))
            uv_list.append(prim.uvs)
            col_list.append(prim.colors)
            tan = prim.tangents.copy()
            tan[:, :3] = math3d.transform_dirs(world, tan[:, :3])
            tan_list.append(tan)
            tri = prim.indices.reshape(-1, 3).astype(np.int32) + v_offset
            idx_list.append(tri)
            tri_mesh_list.append(np.full(len(tri), gpu_mesh_id, np.int32))
            v_offset += prim.num_vertices

        def cat(lst, empty_shape, dtype=np.float32):
            if lst:
                return np.concatenate(lst, axis=0).astype(dtype)
            return np.zeros(empty_shape, dtype)

        mats = self.gpu_materials or [
            dict(
                diffuse_map=0, normal_map=1, metallic_roughness_map=2, occlusion_map=0,
                base_color_factor=np.ones(4, np.float32), metallic_factor=0.0,
                roughness_factor=0.5, rt_type=0, rt_prop=0.0,
            )
        ]
        lights = self.gpu_lights or [
            dict(
                color=np.zeros(4, np.float32), position=np.zeros(3, np.float32),
                range=0.0, direction=np.zeros(3, np.float32), spot=0.0,
                attenuation=np.array([0.0, 0.0, 0.1], np.float32), light_type=1.0,
                intensity=np.zeros(3, np.float32),
            )
        ]
        spheres = self.spheres

        tex = np.stack(self.textures) if self.textures else np.zeros(
            (1, TEXTURE_TILE, TEXTURE_TILE, 4), np.uint8
        )

        f32 = jnp.float32
        return PackedScene(
            positions=jnp.asarray(cat(pos_list, (0, 3))),
            normals=jnp.asarray(cat(nrm_list, (0, 3))),
            uvs=jnp.asarray(cat(uv_list, (0, 2))),
            colors=jnp.asarray(cat(col_list, (0, 4))),
            tangents=jnp.asarray(cat(tan_list, (0, 4))),
            indices=jnp.asarray(cat(idx_list, (0, 3), np.int32)),
            tri_mesh=jnp.asarray(cat(tri_mesh_list, (0,), np.int32)),
            mesh_material=jnp.asarray(
                np.array([m["material"] for m in self.gpu_meshes] or [0], np.int32)
            ),
            mat_diffuse_map=jnp.asarray(np.array([m["diffuse_map"] for m in mats], np.int32)),
            mat_normal_map=jnp.asarray(np.array([m["normal_map"] for m in mats], np.int32)),
            mat_mr_map=jnp.asarray(
                np.array([m["metallic_roughness_map"] for m in mats], np.int32)
            ),
            mat_occlusion_map=jnp.asarray(
                np.array([m["occlusion_map"] for m in mats], np.int32)
            ),
            mat_base_color=jnp.asarray(
                np.stack([m["base_color_factor"] for m in mats]).astype(np.float32)
            ),
            mat_metallic=jnp.asarray(np.array([m["metallic_factor"] for m in mats], np.float32)),
            mat_roughness=jnp.asarray(
                np.array([m["roughness_factor"] for m in mats], np.float32)
            ),
            mat_rt_type=jnp.asarray(np.array([m["rt_type"] for m in mats], np.int32)),
            mat_rt_prop=jnp.asarray(np.array([m["rt_prop"] for m in mats], np.float32)),
            light_color=jnp.asarray(np.stack([l["color"] for l in lights]).astype(np.float32)),
            light_pos=jnp.asarray(np.stack([l["position"] for l in lights]).astype(np.float32)),
            light_range=jnp.asarray(np.array([l["range"] for l in lights], np.float32)),
            light_dir=jnp.asarray(np.stack([l["direction"] for l in lights]).astype(np.float32)),
            light_spot=jnp.asarray(np.array([l["spot"] for l in lights], np.float32)),
            light_att=jnp.asarray(
                np.stack([l["attenuation"] for l in lights]).astype(np.float32)
            ),
            light_type=jnp.asarray(np.array([l["light_type"] for l in lights], np.float32)),
            light_intensity=jnp.asarray(
                np.stack([l["intensity"] for l in lights]).astype(np.float32)
            ),
            textures=jnp.asarray(tex),
            sphere_center=jnp.asarray(
                np.stack([s["center"] for s in spheres]).astype(np.float32)
                if spheres
                else np.zeros((0, 3), np.float32)
            ),
            sphere_radius=jnp.asarray(
                np.array([s["radius"] for s in spheres], np.float32)
            ),
            sphere_material=jnp.asarray(
                np.array([s["material"] for s in spheres], np.int32)
            ),
        )
