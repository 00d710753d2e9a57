"""Generate (or quick-check) the Cornell-standin diffuse-light golden.

Second independent-reference gate (VERDICT r3 #4): the procedural Cornell
box (models/scenes.py create_cornell_standin_scene — wall slabs, clutter
boxes, DIFFUSE_LIGHT emitter cube) rendered by the brute-force CPU triangle
tracer (tests/cpu_reference.py render_tris). `--check N` renders BOTH sides
at N spp / 64² and prints the block RMSE without writing anything; the
default run writes the committed 128² 384-spp golden.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZE = 128
SPP = 384
BOUNCES = 3


def tri_soup(scene):
    """Triangle soup + per-tri materials out of a PackedScene (shared scene
    DATA; the tracer code stays independent)."""
    pos = np.asarray(scene.positions, np.float64)
    idx = np.asarray(scene.indices)
    v0 = pos[idx[:, 0]]
    mesh = np.asarray(scene.tri_mesh)
    mat = np.asarray(scene.mesh_material)[mesh]
    return {
        "v0": v0,
        "e1": pos[idx[:, 1]] - v0,
        "e2": pos[idx[:, 2]] - v0,
        "mat_type": np.asarray(scene.mat_rt_type)[mat],
        "albedo": np.asarray(scene.mat_base_color)[mat][:, :3],
        "prop": np.asarray(scene.mat_rt_prop)[mat],
    }


def framework_render(size, spp):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import rust_renderer_tpu as rt
    from rust_renderer_tpu.models import create_cornell_standin_scene
    from rust_renderer_tpu.ops import pathtrace
    from rust_renderer_tpu.settings import RenderSettings, StaticConfig

    r = rt.Renderer()
    cam = rt.Camera([0, 0.9, 2], [0, 0.5, 0], fov_degrees=60.0, aspect_ratio=1.0)
    create_cornell_standin_scene(r, cam)
    scene = r.pack()
    cfg = StaticConfig(width=size, height=size, samples_per_frame=1,
                       num_bounces=BOUNCES)
    view = RenderSettings.default(num_lights=0).with_camera(cam, size, size)
    view = view.replace(lights_enabled=jnp.int32(0),
                        use_ris_light_sampling=jnp.int32(0))

    @jax.jit
    def frame(scene, view, accum):
        return pathtrace.path_trace(scene, view, cfg, accum)

    accum = jnp.zeros((size, size, 3), jnp.float32)
    for f in range(1, spp + 1):
        res = frame(scene, view.replace(total_samples=jnp.uint32(f)), accum)
        accum = res.accumulation
    return np.asarray(accum) / spp, tri_soup(scene)


def main() -> int:
    from tests import cpu_reference
    from rust_renderer_tpu.utils.image_io import save_png

    check = "--check" in sys.argv
    if check:
        i = sys.argv.index("--check")
        spp = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 64
        size = 64
    else:
        size, spp = SIZE, SPP

    t0 = time.time()
    ours, tris = framework_render(size, spp if check else 96)
    print(f"framework side done in {time.time()-t0:.0f}s "
          f"({tris['v0'].shape[0]} tris, mean {ours.mean():.4f})")
    t0 = time.time()
    ref = cpu_reference.render_tris(
        tris, width=size, height=size, spp=spp, bounces=BOUNCES,
        eye=(0, 0.9, 2), target=(0, 0.5, 0), fov_degrees=60.0,
    )
    print(f"cpu reference done in {time.time()-t0:.0f}s (mean {ref.mean():.4f})")

    b = 8 if size >= 128 else 4
    h = (size // b) * b
    blk = lambda im: im[:h, :h].reshape(h // b, b, h // b, b, 3).mean(axis=(1, 3))
    rmse = float(np.sqrt(np.mean((blk(ours) - blk(ref)) ** 2)))
    print(f"block({b}) RMSE {rmse:.5f}  (means {ours.mean():.4f} vs {ref.mean():.4f})")

    if not check:
        out = os.path.abspath(os.path.join(
            os.path.dirname(__file__), "..", "tests", "golden",
            f"cornell_{size}_cpu_{spp}spp.npy"))
        np.save(out, ref.astype(np.float32))
        save_png(out.replace(".npy", ".png"), np.clip(ref, 0, 1) ** (1 / 2.2))
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
