import os

import numpy as np
import pytest

import rust_renderer_tpu as rt
from rust_renderer_tpu.scene import ModelLoader, Material, MaterialType, load_gltf
from rust_renderer_tpu.utils import math3d

SPHERE_GLTF = "/root/reference/utopian/data/models/sphere.gltf"
SPONZA_GLTF = "/root/reference/prototype/data/models/Sponza/glTF/Sponza.gltf"
SPONZA_BIN = "/root/reference/prototype/data/models/Sponza/glTF/Sponza.bin"
HELMET_GLTF = "/root/reference/prototype/data/models/FlightHelmet/glTF/FlightHelmet.gltf"


def test_cube_geometry():
    model = ModelLoader.load_cube()
    prim = model.meshes[0].primitive
    assert prim.num_vertices == 24
    assert prim.num_triangles == 12
    # All positions on the +-0.5 box.
    assert np.all(np.abs(prim.positions) == 0.5)
    assert np.all(np.linalg.norm(prim.normals, axis=-1) == 1.0)


def test_triangle_model():
    model = ModelLoader.load_triangle()
    assert model.meshes[0].primitive.num_triangles == 1


@pytest.mark.skipif(not os.path.exists(SPHERE_GLTF), reason="reference assets absent")
def test_load_gltf_sphere():
    model = load_gltf(SPHERE_GLTF)
    assert len(model.meshes) >= 1
    prim = model.meshes[0].primitive
    assert prim.num_vertices > 100
    # A unit-ish sphere: every vertex at the same radius from centroid.
    c = prim.positions.mean(0)
    r = np.linalg.norm(prim.positions - c, axis=-1)
    assert r.std() / r.mean() < 0.01
    # Normals point outward.
    outward = np.sum((prim.positions - c) * prim.normals, -1)
    assert np.all(outward > 0)


@pytest.mark.skipif(not os.path.exists(SPONZA_BIN), reason="Sponza.bin absent (lfs)")
def test_load_gltf_sponza_counts():
    model = load_gltf(SPONZA_GLTF)
    assert len(model.meshes) > 100  # Sponza has a few hundred primitives
    assert len(model.textures) > 20
    total_tris = sum(m.primitive.num_triangles for m in model.meshes)
    assert total_tris > 100_000


@pytest.mark.skipif(not os.path.exists(HELMET_GLTF), reason="reference assets absent")
def test_load_gltf_flight_helmet():
    model = load_gltf(HELMET_GLTF)
    assert len(model.meshes) >= 4
    assert len(model.textures) >= 6
    # Textured: at least one mesh references a real (non-default) diffuse map.
    from rust_renderer_tpu.scene import DEFAULT_TEXTURE_MAP

    assert any(
        m.material.diffuse_map != int(DEFAULT_TEXTURE_MAP) for m in model.meshes
    )


def test_renderer_bindless_indices():
    r = rt.Renderer()
    # Defaults occupy indices 0..2 (white, flat normal, default MR).
    assert r.default_diffuse_map_index == 0
    assert r.default_normal_map_index == 1
    assert r.default_metallic_roughness_map_index == 2

    model = ModelLoader.load_cube()
    r.add_model(model, np.eye(4, dtype=np.float32))
    assert model.meshes[0].gpu_mesh == 0
    model2 = ModelLoader.load_cube()
    r.add_model(model2, np.eye(4, dtype=np.float32))
    assert model2.meshes[0].gpu_mesh == 1


def test_pack_world_transform_applied():
    r = rt.Renderer()
    r.add_model(ModelLoader.load_cube(), math3d.translation([10.0, 0.0, 0.0]))
    scene = r.pack()
    pos = np.asarray(scene.positions)
    assert pos[:, 0].min() >= 9.5 - 1e-5
    assert scene.indices.shape == (12, 3)
    assert np.asarray(scene.tri_mesh).max() == 0


def test_pack_lights_defaults():
    r = rt.Renderer()
    r.add_light([1.0, 2.0, 3.0], [1.0, 1.0, 1.0], 1.0)
    scene = r.pack()
    np.testing.assert_allclose(np.asarray(scene.light_pos)[0], [1, 2, 3])
    np.testing.assert_allclose(np.asarray(scene.light_att)[0], [0.0, 0.0, 0.1])
    assert float(scene.light_type[0]) == 1.0
    np.testing.assert_allclose(np.asarray(scene.light_intensity)[0], [1, 1, 1])


def test_instance_transform_update_repacks():
    r = rt.Renderer()
    idx = r.add_model(ModelLoader.load_cube(), np.eye(4, dtype=np.float32))
    r.set_instance_transform(idx, math3d.translation([5.0, 0.0, 0.0]))
    scene = r.pack()
    assert np.asarray(scene.positions)[:, 0].min() >= 4.5 - 1e-5
