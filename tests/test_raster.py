import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import raster
from rust_renderer_tpu.scene import ModelLoader
from rust_renderer_tpu.utils import math3d


def _cam(eye=(3, 2, 5), target=(0, 0.5, 0), aspect=1.0):
    c = rt.Camera(eye, target, aspect_ratio=aspect, z_near=0.1, z_far=100.0)
    return jnp.asarray(c.get_projection() @ c.get_view())


def test_fullscreen_triangle_covers_everything():
    clip = jnp.asarray(
        [[-1.0, -3.0, 0.5, 1.0], [-1.0, 1.0, 0.5, 1.0], [3.0, 1.0, 0.5, 1.0]]
    )
    idx = jnp.asarray([[0, 1, 2]], jnp.int32)
    vis = jax.jit(lambda c: raster.rasterize(c, idx, 16, 16))(clip)
    assert np.all(np.asarray(vis.tri) == 0)
    np.testing.assert_allclose(np.asarray(vis.depth), 0.5, atol=1e-5)


def test_depth_test_closest_wins():
    # Two overlapping full-screen triangles at different depths, either order.
    def tris(z_first, z_second):
        return jnp.asarray(
            [
                [-1, -3, z_first, 1], [-1, 1, z_first, 1], [3, 1, z_first, 1],
                [-1, -3, z_second, 1], [-1, 1, z_second, 1], [3, 1, z_second, 1],
            ],
            jnp.float32,
        )

    idx = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    f = jax.jit(lambda c: raster.rasterize(c, idx, 8, 8))
    near_first = f(tris(0.2, 0.7))
    assert np.all(np.asarray(near_first.tri) == 0)
    near_second = f(tris(0.7, 0.2))
    assert np.all(np.asarray(near_second.tri) == 1)


def test_near_plane_clipping_keeps_floor():
    """A ground plane extending behind the camera must still rasterize in
    front (the Sutherland-Hodgman clip path)."""
    r = rt.Renderer()
    r.add_model(ModelLoader.load_cube(), math3d.scale([20.0, 0.1, 20.0]))
    scene = r.pack()
    mvp = _cam()
    clip = raster.transform_vertices(scene.positions, mvp)
    vis = jax.jit(lambda c: raster.rasterize(c, scene.indices, 64, 64))(clip)
    covered = (np.asarray(vis.tri) >= 0).mean()
    assert covered > 0.4  # floor fills the lower part of the frame


def test_barycentric_interpolation_matches_geometry():
    """Interpolated world position from barycentrics equals the position
    implied by the pixel ray (validated at pixel centers)."""
    r = rt.Renderer()
    r.add_model(ModelLoader.load_cube(), math3d.translation([0, 0.5, 0]))
    scene = r.pack()
    cam = rt.Camera([0, 0.5, 4], [0, 0.5, 0], aspect_ratio=1.0, z_near=0.1, z_far=100.0)
    mvp = jnp.asarray(cam.get_projection() @ cam.get_view())
    clip = raster.transform_vertices(scene.positions, mvp)
    size = 32
    vis = jax.jit(lambda c: raster.rasterize(c, scene.indices, size, size))(clip)
    pos = jax.jit(lambda v: raster.interpolate(v, scene.indices, scene.positions))(vis)
    pos = np.asarray(pos)
    tri = np.asarray(vis.tri)
    center = pos[size // 2, size // 2]
    assert tri[size // 2, size // 2] >= 0
    # Camera looks straight at the cube front face z=0.5 through the center
    # (pixel-center offset at 32px resolution shifts xy by ~0.06 world units).
    assert np.allclose(center, [0.0, 0.5, 0.5], atol=0.11)
    # z must be exact: the hit lies on the front face.
    assert abs(center[2] - 0.5) < 1e-4


def test_perspective_correct_uv():
    """A floor quad viewed at a grazing angle: perspective-correct uv at a
    known pixel matches the analytic ray/plane intersection."""
    r = rt.Renderer()
    r.add_model(ModelLoader.load_cube(), math3d.scale([10.0, 0.1, 10.0]))
    scene = r.pack()
    cam = rt.Camera([0, 1.0, 4.9], [0, 0.0, 0.0], aspect_ratio=1.0, z_near=0.1, z_far=100.0)
    mvp = jnp.asarray(cam.get_projection() @ cam.get_view())
    clip = raster.transform_vertices(scene.positions, mvp)
    size = 64
    vis = jax.jit(lambda c: raster.rasterize(c, scene.indices, size, size))(clip)
    pos = np.asarray(
        jax.jit(lambda v: raster.interpolate(v, scene.indices, scene.positions))(vis)
    )
    # Every covered pixel must sit on the floor top plane y=0.05 (or border).
    tri = np.asarray(vis.tri)
    ys = pos[tri >= 0][:, 1]
    assert np.all(ys <= 0.051)
    assert (np.abs(ys - 0.05) < 1e-3).mean() > 0.9


def test_degenerate_and_empty():
    clip = jnp.zeros((3, 4))
    idx = jnp.asarray([[0, 1, 2]], jnp.int32)
    vis = jax.jit(lambda c: raster.rasterize(c, idx, 8, 8))(clip)
    assert np.all(np.asarray(vis.tri) == -1)
