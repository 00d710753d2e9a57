import numpy as np

from rust_renderer_tpu.utils import math3d


def test_look_at_rh_places_eye_at_origin():
    eye = np.array([3.0, 2.0, 1.0])
    m = math3d.look_at_rh(eye, [0, 0, 0], [0, 1, 0])
    p = m @ np.append(eye, 1.0)
    assert np.allclose(p[:3], 0, atol=1e-5)


def test_look_at_rh_forward_maps_to_minus_z():
    eye = np.array([0.0, 0.0, 5.0])
    m = math3d.look_at_rh(eye, [0, 0, 0], [0, 1, 0])
    # A point in front of the camera lands on -Z in view space (RH).
    p = m @ np.array([0.0, 0.0, 0.0, 1.0])
    assert p[2] < 0


def test_perspective_rh_depth_range():
    """glam::perspective_rh maps z=-near -> 0 and z=-far -> 1 (NDC depth)."""
    near, far = 0.1, 100.0
    m = math3d.perspective_rh(np.radians(60), 1.5, near, far)
    for z, expect in [(-near, 0.0), (-far, 1.0)]:
        clip = m @ np.array([0.0, 0.0, z, 1.0])
        assert np.isclose(clip[2] / clip[3], expect, atol=1e-4)


def test_orthographic_rh_unit_box():
    m = math3d.orthographic_rh(-2, 2, -2, 2, -10, 10)
    clip = m @ np.array([2.0, -2.0, -10.0, 1.0])
    assert np.allclose(clip[:3] / clip[3], [1, -1, 1], atol=1e-5)


def test_trs_composition_order():
    m = math3d.trs([1, 2, 3], [0, 0, 0, 1], [2, 2, 2])
    p = math3d.transform_points(m, np.array([[1.0, 0.0, 0.0]]))
    assert np.allclose(p[0], [3, 2, 3], atol=1e-6)


def test_transform_normals_nonuniform_scale():
    m = math3d.scale([2.0, 1.0, 1.0])
    n = math3d.transform_normals(m, np.array([[1.0, 1.0, 0.0]] , np.float32) / np.sqrt(2))
    assert np.isclose(np.linalg.norm(n[0]), 1.0, atol=1e-6)
    # Inverse-transpose: x component shrinks relative to y under x-scale.
    assert n[0][0] < n[0][1]


def test_quat_to_mat3_identity_and_y_rotation():
    assert np.allclose(math3d.quat_to_mat3([0, 0, 0, 1]), np.eye(3), atol=1e-7)
    half = np.sin(np.pi / 4)
    r = math3d.quat_to_mat3([0, half, 0, np.cos(np.pi / 4)])  # 90 deg about Y
    assert np.allclose(r @ np.array([1, 0, 0]), [0, 0, -1], atol=1e-6)
