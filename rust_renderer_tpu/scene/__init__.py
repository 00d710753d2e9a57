"""Scene assets: primitives, glTF loading, procedural models, textures.

Rebuilds the reference's asset layer (utopian/src/{primitive,gltf_loader,
model_loader,texture}.rs) as host-side numpy structures that pack into HBM
scene arrays (`renderer.PackedScene`) for the jitted render path.
"""

from rust_renderer_tpu.scene.primitive import Vertex, Primitive
from rust_renderer_tpu.scene.gltf_loader import (
    Material,
    MaterialType,
    Mesh,
    Model,
    DEFAULT_TEXTURE_MAP,
    load_gltf,
)
from rust_renderer_tpu.scene.model_loader import ModelLoader

__all__ = [
    "Vertex",
    "Primitive",
    "Material",
    "MaterialType",
    "Mesh",
    "Model",
    "DEFAULT_TEXTURE_MAP",
    "load_gltf",
    "ModelLoader",
]
