"""Production Pallas traversal kernels under shard_map (VERDICT r3 #5a).

test_parallel.py validates the multichip FLAGSHIP chain, but on the XLA
fallback traversal; a sharding bug specific to the Pallas call (e.g.
shard_map interaction with the closed-over VMEM tables or the SMEM meta)
would pass every other check. These tests run the PRODUCTION kernels —
row-cursor w16 (the shipped default) and the dual-expand steady-drain —
inside shard_map on the 8-virtual-device CPU mesh (interp mode) and assert
equality with the single-device launch.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rust_renderer_tpu.ops import bvh as bvhmod
from tests.test_pallas_traversal import _pallas_traverse, _rays, _soup_bvh

N_DEV = 8
N_RAYS = 8 * 1024  # one packet block per device


def _sharded_traverse(b, o, d, **kw):
    """traverse_packet_pallas per row-band inside shard_map (interp on CPU,
    native on TPU) — each device launches the kernel on its own block."""
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("rays",))

    def band(o_b, d_b):
        return _pallas_traverse(b, o_b, d_b, **kw)

    f = jax.shard_map(
        band, mesh=mesh,
        in_specs=(P("rays", None), P("rays", None)),
        out_specs=(P("rays"), P("rays"), P("rays"), P("rays")),
        check_vma=False,
    )
    return f(o, d)


def test_row_cursor_kernel_sharded_matches_single_device():
    b = _soup_bvh(n=120, seed=91)
    o, d = _rays(n=N_RAYS, seed=92)
    t1, p1, u1, v1 = _sharded_traverse(b, o, d, row_cursors=8, row_expand=2,
                                       steady_drain=3)
    t2, p2, u2, v2 = _pallas_traverse(b, o, d, row_cursors=8, row_expand=2,
                                      steady_drain=3)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_sdd_kernel_sharded_matches_single_device():
    b = _soup_bvh(n=100, seed=93)
    o, d = _rays(n=N_RAYS, seed=94)
    t1, p1, _, _ = _sharded_traverse(b, o, d, dual=True, steady_drain=3)
    t2, p2, _, _ = _pallas_traverse(b, o, d, dual=True, steady_drain=3)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_row_cursor_anyhit_sharded_matches():
    b = _soup_bvh(n=100, seed=95)
    o, d = _rays(n=N_RAYS, seed=96)
    t1, p1, _, _ = _sharded_traverse(b, o, d, row_cursors=8, any_hit=True)
    t2, p2, _, _ = _pallas_traverse(b, o, d, row_cursors=8, any_hit=True)
    np.testing.assert_array_equal(np.asarray(p1) >= 0, np.asarray(p2) >= 0)


def test_q32_kernel_sharded_matches():
    b = _soup_bvh(n=100, seed=97)
    o, d = _rays(n=N_RAYS, seed=98)
    t1, p1, _, _ = _sharded_traverse(b, o, d, row_cursors=8, q32=True)
    t2, p2, _, _ = _pallas_traverse(b, o, d, row_cursors=8, q32=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
