"""rust_renderer_tpu — a TPU-native renderer framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of simplerr/rust-renderer (a
single-GPU interactive Vulkan renderer, /root/reference) designed TPU-first:

- The per-frame render graph (reference: utopian/src/graph.rs) becomes a pure
  function ``render(scene, view, settings) -> image`` traced by `jax.jit`;
  pass dependencies become SSA dataflow, Vulkan barriers disappear.
- Bindless GPU resources (reference: utopian/src/bindless.rs) become packed
  HBM scene arrays indexed by integer handles (`scene.packed.PackedScene`).
- GLSL pipelines become Python kernel functions (jnp + Pallas); live shader
  recompilation becomes kernel swap + re-trace (`graph.Graph.recompile`).
- HW ray tracing (BLAS/TLAS) becomes our own BVH with vectorized wavefront
  traversal (`ops.bvh`).

Public API mirrors the reference's `utopian` crate where it makes sense:
`Renderer`, `Camera`, `Graph`, `gltf_loader.load_gltf`, `ModelLoader`.
"""

from rust_renderer_tpu.settings import RenderSettings, StaticConfig, RenderGraphMode
from rust_renderer_tpu.camera import Camera
from rust_renderer_tpu.renderer import Renderer
from rust_renderer_tpu.graph import Graph, PassBuilder

__version__ = "0.1.0"

__all__ = [
    "RenderSettings",
    "StaticConfig",
    "RenderGraphMode",
    "Camera",
    "Renderer",
    "Graph",
    "PassBuilder",
]
