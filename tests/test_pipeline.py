"""Halo-pipelined distributed solve tests (SURVEY §5.7; BASELINE config 5)
on the simulated 8-device CPU mesh."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from _approx import assert_isapprox
from tpu_sparse_lu import ParallelSparseLU
from tpu_sparse_lu.models import block_banded, laplacian_1d, poisson_2d
from tpu_sparse_lu.parallel.mesh import make_mesh
from tpu_sparse_lu.parallel.pipeline_solve import (
    build_pipeline_plan,
    make_pipeline_ldiv,
)

TOL = 1e-12


@pytest.mark.parametrize("D", [1, 2, 4, 8])
@pytest.mark.parametrize("make", [
    lambda rng: laplacian_1d(256),
    lambda rng: block_banded(rng, 32, 16),
])
def test_pipeline_matches_scipy(rng, make, D):
    A = make(rng)
    n = A.shape[0]
    F = ParallelSparseLU(A, chunk_size=8)
    solve = make_pipeline_ldiv(F, make_mesh(D), micro_panels=2)
    assert solve is not None
    b = rng.random((n, 4))
    X = np.asarray(solve(b))
    Xs = spla.spsolve(A, b)
    for j in range(4):
        assert_isapprox(X[:, j], Xs[:, j], rtol=TOL, atol=TOL)
    # and the single-device path agrees
    np.testing.assert_allclose(X, np.asarray(F.ldiv(b)), rtol=1e-12, atol=1e-12)


def test_pipeline_single_rhs(rng):
    A = laplacian_1d(200)
    F = ParallelSparseLU(A, chunk_size=8)
    solve = make_pipeline_ldiv(F, make_mesh(4))
    b = rng.random(200)
    assert_isapprox(np.asarray(solve(b)), spla.spsolve(A, b), rtol=TOL, atol=TOL)


@pytest.mark.parametrize("micro", [1, 3, 4])
def test_pipeline_micro_panels(rng, micro):
    A = block_banded(rng, 24, 12)
    n = A.shape[0]
    F = ParallelSparseLU(A, chunk_size=8)
    solve = make_pipeline_ldiv(F, make_mesh(4), micro_panels=micro)
    b = rng.random((n, 6))
    X = np.asarray(solve(b))
    for j in range(6):
        assert_isapprox(X[:, j], spla.spsolve(A, b[:, j]), rtol=TOL, atol=TOL)


def test_pipeline_rejects_wide_patterns(rng):
    """Poisson/COLAMD scatters dependencies across the partition: the
    planner must reject and callers fall back to the psum engine."""
    A = poisson_2d(16, 16)
    F = ParallelSparseLU(A, chunk_size=8)
    # with 8 devices the scattered pattern crosses multiple boundaries
    assert (build_pipeline_plan(F.plan.lplan, 8) is None
            or build_pipeline_plan(F.plan.uplan, 8) is None
            or make_pipeline_ldiv(F, make_mesh(8)) is not None)


def test_overlapped_pair_matches_sequential(rng):
    """pipeline_ldiv_pair (overlapped L/U waves) == running the two
    pipelined solves back to back == the single-device engine."""
    import jax.numpy as jnp

    from tpu_sparse_lu import ParallelSparseLU
    from tpu_sparse_lu.models import block_banded
    from tpu_sparse_lu.parallel.mesh import make_mesh
    from tpu_sparse_lu.parallel.pipeline_solve import (
        build_pipeline_plan,
        pipeline_ldiv_pair,
        pipeline_tri_solve,
    )
    from tpu_sparse_lu.solve import block_rhs

    A = block_banded(rng, 24, 8)
    n = A.shape[0]
    F = ParallelSparseLU(A, chunk_size=8)
    mesh = make_mesh(4)
    lp = build_pipeline_plan(F.plan.lplan, 4)
    up = build_pipeline_plan(F.plan.uplan, 4)
    assert lp is not None and up is not None
    b = rng.random((n, 8))
    xw = block_rhs(jnp.asarray(b), n, F.plan.lplan.K, F.plan.cs)

    seq = pipeline_tri_solve(mesh, "chunks", F.plan.lplan, lp, F.ldata, xw,
                             micro_panels=4, tri_mode="trsm")
    seq = pipeline_tri_solve(mesh, "chunks", F.plan.uplan, up, F.udata, seq,
                             micro_panels=4, tri_mode="trsm")
    fused = pipeline_ldiv_pair(mesh, "chunks", F.plan.lplan, lp, F.ldata,
                               F.plan.uplan, up, F.udata, xw,
                               micro_panels=4, tri_mode="trsm")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(seq),
                               rtol=1e-12, atol=1e-12)


def test_pipeline_sharded_output(rng):
    """VERDICT r2 #5: replicate=False keeps the solution distributed.

    Checks (a) the gathered shards match the replicated solve, (b) the
    output is genuinely sharded over the mesh axis, and (c) the compiled
    program contains NO all-reduce — only the halo collective-permutes
    plus the boundary exchange of the sharded un-pivot."""
    import jax

    A = block_banded(rng, 32, 16)
    n = A.shape[0]
    D = 4
    F = ParallelSparseLU(A, chunk_size=8)
    mesh = make_mesh(D)
    solve_r = make_pipeline_ldiv(F, mesh, micro_panels=2)
    solve_s = make_pipeline_ldiv(F, mesh, micro_panels=2, replicate=False)
    assert solve_s is not None
    b = rng.random((n, 4))
    x_ref = np.asarray(solve_r(b))
    xs = solve_s(b)
    assert xs.shape[0] >= n and xs.shape[0] % D == 0  # padded, sharded rows
    spec = xs.sharding.spec
    assert spec[0] is not None  # row axis actually partitioned
    got = np.asarray(xs)  # gathers the shards
    np.testing.assert_allclose(got[:n], x_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[n:], 0.0)
    # no psum anywhere: collective-permute only — lower the inner jitted
    # run directly for the HLO check
    import jax.numpy as jnp
    run = None
    for cell in solve_s.__closure__ or ():
        v = cell.cell_contents
        if callable(v) and getattr(v, "__name__", "") == "run":
            run = v
    assert run is not None
    args = (F.ldata, F.udata, F._pperm, F._qperm, F._rs_blk,
            jnp.asarray(b, jnp.float64))
    txt = run.lower(*args).compile().as_text()
    assert "all-reduce" not in txt, "sharded pipeline must not psum"
    assert "collective-permute" in txt


def test_pipeline_sharded_output_single_rhs(rng):
    A = laplacian_1d(200)
    F = ParallelSparseLU(A, chunk_size=8)
    solve = make_pipeline_ldiv(F, make_mesh(4), replicate=False)
    b = rng.random(200)
    x = np.asarray(solve(b))
    assert_isapprox(x[:200], spla.spsolve(A, b), rtol=TOL, atol=TOL)


def test_sharded_apply_perm_boundary_exchange(rng):
    """Direct check of the owner-computes sharded un-pivot when the
    permutation CROSSES device boundaries (both directions) — the test
    matrices' block-local pivots never exercise the fwd/bwd ppermute
    branches."""
    import jax.numpy as jnp

    from tpu_sparse_lu.ops.permute import build_perm_plan
    from tpu_sparse_lu.parallel.pipeline_solve import (
        build_sharded_perm_plan,
        sharded_apply_perm,
    )

    cs = 8
    D = 4
    Kl = 3                      # source chunks per device
    K = D * Kl                  # 12 chunks, n = 96
    n = K * cs
    # rolled permutation: out[i] = v[(i + cs) % n] — every chunk draws
    # from its successor, so device-boundary chunks cross FORWARD and the
    # wraparound chunk crosses BACKWARD (last device reads block 0)
    perm = (np.arange(n) + cs) % n
    qperm = build_perm_plan(perm, n, cs)
    spp = build_sharded_perm_plan(qperm, Kl, D)
    if spp is None:
        # wraparound spans D-1 boundaries -> correctly refused; drop it
        perm = np.minimum(np.arange(n) + cs, n - 1)
        perm[-cs:] = np.arange(n - cs, n)  # identity tail
        qperm = build_perm_plan(perm, n, cs)
        spp = build_sharded_perm_plan(qperm, Kl, D)
    assert spp is not None
    assert spp.use_dir[1] or spp.use_dir[2]  # crossings actually present
    mesh = make_mesh(D)
    v = rng.random((n, 3))
    xw = jnp.asarray(v.reshape(K, cs, 3))
    got = np.asarray(sharded_apply_perm(mesh, "chunks", qperm, spp, xw))
    want = v[perm]
    np.testing.assert_allclose(
        got.reshape(-1, 3)[:n], want, rtol=1e-12, atol=1e-12)
