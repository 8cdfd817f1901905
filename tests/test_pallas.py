"""Fused Pallas solve kernel: interpret-mode equivalence on CPU.

The kernel itself targets TPU (lane-aligned HBM slices, VMEM residency);
interpret mode validates the level-stream schedule, the DMA choreography
and the masking logic against the XLA scan engine.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sparse_lu import ParallelSparseLU, SolverConfig
from tpu_sparse_lu.models import fe_block_matrix, laplacian_1d, poisson_2d
from tpu_sparse_lu.ops.pallas_solve import (
    build_stream,
    pallas_tri_solve,
    supports_pallas_plan,
)
from tpu_sparse_lu.solve import block_rhs, blocked_tri_solve, prepare_tri_kernel


def _data_with_stream(F):
    ld = prepare_tri_kernel(
        F.plan.lplan, F.ldata.diag, F.ldata.offdiag,
        tri_mode="inv", build_pallas_stream=True,
    )
    ud = prepare_tri_kernel(
        F.plan.uplan, F.udata.diag, F.udata.offdiag,
        tri_mode="inv", build_pallas_stream=True,
    )
    return ld, ud


@pytest.mark.parametrize("make", [
    lambda rng: poisson_2d(10, 8),
    lambda rng: laplacian_1d(50),
    lambda rng: fe_block_matrix(rng, 10, 5),
])
@pytest.mark.parametrize("R", [1, 4])
def test_pallas_matches_xla(rng, make, R):
    A = make(rng)
    n = A.shape[0]
    F = ParallelSparseLU(
        A, config=SolverConfig(chunk_size=8, tri_mode="inv", dtype="float32")
    )
    ld, ud = _data_with_stream(F)
    b = jnp.asarray(rng.random((n, R)), dtype=jnp.float32)
    xw = block_rhs(b, n, F.plan.lplan.K, F.plan.cs)

    ref_l = blocked_tri_solve(F.plan.lplan, F.ldata, xw, tri_mode="inv",
                              schedule="scan")
    got_l = pallas_tri_solve(F.plan.lplan, ld, xw, interpret=True)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               rtol=1e-5, atol=1e-6)

    ref_u = blocked_tri_solve(F.plan.uplan, F.udata, ref_l, tri_mode="inv",
                              schedule="scan")
    got_u = pallas_tri_solve(F.plan.uplan, ud, got_l, interpret=True)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=1e-5, atol=1e-6)


def test_stream_layout(rng):
    """Grouped stream: every real tile appears exactly once, tiles of a
    group share the destination chunk, and the wide slab holds the right
    tile data in the right sub-column."""
    from tpu_sparse_lu.ops.pallas_solve import GROUP, build_grouped_schedule

    A = poisson_2d(12, 12)
    F = ParallelSparseLU(A, chunk_size=8)
    plan = F.plan.lplan
    cs = plan.cs
    group_ids, g_src, g_dst = build_grouped_schedule(plan)
    NL, MG, G = group_ids.shape
    assert G == GROUP
    # coverage: every real tile exactly once
    real = group_ids[group_ids < plan.T]
    assert sorted(real.tolist()) == list(range(plan.T))
    # group invariants
    for l in range(NL):
        for j in range(MG):
            for g in range(G):
                t = group_ids[l, j, g]
                if t < plan.T:
                    assert g_dst[l, j] == plan.tile_brow[t]
                    assert g_src[l, j, g] == plan.tile_bcol[t]
                else:
                    assert g_src[l, j, g] == plan.K
    # wide stream data layout
    off_stream, src, dst = build_stream(plan, F.ldata.offdiag)
    assert off_stream.shape == (NL * MG, cs, G * cs)
    off_np = np.asarray(F.ldata.offdiag)
    stream_np = np.asarray(off_stream)
    for l in range(NL):
        for j in range(MG):
            for g in range(G):
                t = group_ids[l, j, g]
                np.testing.assert_array_equal(
                    stream_np[l * MG + j][:, g * cs:(g + 1) * cs], off_np[t]
                )


def test_supports_pallas_plan_gates(rng):
    A = poisson_2d(10, 10)
    F8 = ParallelSparseLU(A, chunk_size=8)
    assert not supports_pallas_plan(F8.plan.lplan, 16)  # not lane-aligned
