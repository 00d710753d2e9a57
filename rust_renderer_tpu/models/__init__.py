"""Scene content builders (the reference's prototype/src/scenes.rs)."""

from rust_renderer_tpu.models.scenes import (
    create_scene,
    create_sponza_scene,
    create_sponza_scale_scene,
    create_cornell_box_scene,
    create_cornell_standin_scene,
    create_metal_rough_spheres,
    create_cube_scene,
    create_rtiow_scene,
)

__all__ = [
    "create_scene",
    "create_sponza_scene",
    "create_sponza_scale_scene",
    "create_cornell_box_scene",
    "create_cornell_standin_scene",
    "create_metal_rough_spheres",
    "create_cube_scene",
    "create_rtiow_scene",
]
