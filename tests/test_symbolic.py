"""Symbolic-layer tests: factorization convention, planner invariants,
level-schedule validity, plan serialization."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpu_sparse_lu import factorize_host, plan_triangular, SymbolicPlan, build_symbolic_plan
from tpu_sparse_lu.models import (
    dense_random,
    fe_block_matrix,
    laplacian_1d,
    poisson_2d,
    random_sparse,
)


def _check_convention(A):
    """L @ U == (Rs .* A)[p, q] — the reference's factorization contract
    (src/SharedMemSparseLU.jl:292-316)."""
    f = factorize_host(A)
    lhs = (f.L @ f.U).toarray()
    scaled = (sp.diags(f.Rs) @ A).toarray()
    rhs = scaled[f.p][:, f.q]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12, atol=1e-12)
    # L unit lower, U upper
    L = f.L.toarray()
    U = f.U.toarray()
    np.testing.assert_allclose(np.diag(L), 1.0, rtol=1e-14)
    assert np.allclose(np.triu(L, 1), 0)
    assert np.allclose(np.tril(U, -1), 0)


@pytest.mark.parametrize("n", [1, 2, 5, 17, 64, 100])
def test_factorization_convention_dense(rng, n):
    _check_convention(dense_random(rng, n))


@pytest.mark.parametrize("nel", [1, 3, 10, 40])
def test_factorization_convention_fe(rng, nel):
    _check_convention(fe_block_matrix(rng, nel, 5))


def test_factorization_convention_poisson():
    _check_convention(poisson_2d(12, 9))


def test_factorize_rejects_nonsquare():
    A = sp.random(4, 5, density=0.5, format="csc")
    with pytest.raises(ValueError):
        factorize_host(A)


@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("cs", [1, 3, 8, 32])
def test_plan_invariants(rng, lower, cs):
    A = fe_block_matrix(rng, 20, 5)
    f = factorize_host(A)
    M = f.L if lower else f.U
    plan = plan_triangular(M, cs, lower=lower)
    n = M.shape[0]
    assert plan.K == -(-n // plan.cs)
    # every real chunk appears exactly once in the schedule
    sched = plan.level_chunks[plan.level_chunks < plan.K]
    assert sorted(sched.tolist()) == list(range(plan.K))
    # every real tile appears exactly once
    tiles = plan.level_tiles[plan.level_tiles < plan.T]
    assert sorted(tiles.tolist()) == list(range(plan.T))
    # topological validity: a tile's source chunk level < dest chunk level
    level_of = np.zeros(plan.K + 1, dtype=int)
    for l in range(plan.num_levels):
        for k in plan.level_chunks[l]:
            if k < plan.K:
                level_of[k] = l
    for t in range(plan.T):
        src = plan.tile_bcol[t]
        dst = plan.tile_brow[t]
        assert level_of[src] < level_of[dst]
        if lower:
            assert dst > src
        else:
            assert dst < src


def test_banded_plan_is_a_chain():
    """Tridiagonal L with cs>=bandwidth gives width-1 levels (the
    reference's serial chain, SURVEY.md §3.2)."""
    A = laplacian_1d(64)
    f = factorize_host(A)
    plan = plan_triangular(f.L, 8, lower=True)
    assert plan.max_chunks_per_level == 1


def test_plan_serialization_roundtrip(tmp_path, rng):
    A = fe_block_matrix(rng, 10, 5)
    f = factorize_host(A)
    plan = build_symbolic_plan(f, 8)
    path = str(tmp_path / "plan.npz")
    plan.save(path)
    loaded = SymbolicPlan.load(path)
    assert loaded.n == plan.n and loaded.cs == plan.cs
    np.testing.assert_array_equal(loaded.p, plan.p)
    np.testing.assert_array_equal(loaded.qinv, plan.qinv)
    for a, b in ((loaded.lplan, plan.lplan), (loaded.uplan, plan.uplan)):
        assert a.lower == b.lower and a.K == b.K and a.T == b.T
        np.testing.assert_array_equal(a.level_chunks, b.level_chunks)
        np.testing.assert_array_equal(a.level_tiles, b.level_tiles)
        np.testing.assert_array_equal(a.diag_dest, b.diag_dest)
        np.testing.assert_array_equal(a.offdiag_dest, b.offdiag_dest)


def test_nested_dissection_perm_valid(rng):
    from tpu_sparse_lu.ordering import nested_dissection
    from tpu_sparse_lu.models import poisson_2d

    A = poisson_2d(20, 17)
    perm = nested_dissection(A)
    assert np.array_equal(np.sort(perm), np.arange(A.shape[0]))


def test_staged_extension_structure(rng):
    """Chunk-aligned nd embedding: valid maps, identity pads, and a chunk
    DAG that is tree-height shallow instead of a chain."""
    from tpu_sparse_lu.ordering import staged_extension
    from tpu_sparse_lu.models import poisson_2d
    from tpu_sparse_lu import factorize_host, plan_triangular

    A = poisson_2d(30, 30)
    cs = 32
    A_ext, ext_src, ext_pos, data_src = staged_extension(A, cs)
    n, n_ext = A.shape[0], A_ext.shape[0]
    assert n_ext % cs == 0
    # bijection between original rows and their extended positions
    real = ext_src >= 0
    assert real.sum() == n
    assert np.array_equal(np.sort(ext_src[real]), np.arange(n))
    assert np.array_equal(ext_src[ext_pos], np.arange(n))
    # data map reproduces the values; pads are exactly 1.0 diagonals
    vals = np.where(data_src >= 0, A.data[np.maximum(data_src, 0)], 1.0)
    np.testing.assert_array_equal(vals, A_ext.data)
    # level depth is tree-like, not chain-like
    f = factorize_host(A_ext, permc_spec="NATURAL", diag_pivot_thresh=0.0)
    lp = plan_triangular(f.L, cs, lower=True)
    assert lp.num_levels <= 14, lp.num_levels


def test_plan_maps_native_matches_numpy(rng):
    """The C++ plan_maps pass (utils/_symcore.cpp) against the NumPy
    fallback, over both factors, with and without extra closure tiles."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from tpu_sparse_lu import symbolic
    from tpu_sparse_lu.models import fe_block_matrix, poisson_2d

    try:
        from tpu_sparse_lu.utils import _symcore
    except ImportError:
        pytest.skip("native core not built")

    for A in (poisson_2d(30, 30), fe_block_matrix(rng, 40, 5)):
        lu = spla.splu(sp.csc_matrix(A).astype(float), permc_spec="COLAMD")
        for M, lower in ((lu.L.tocsc(), True), (lu.U.tocsc(), False)):
            M.sort_indices()
            extras = [None, [(5, 2), (7, 1)] if lower else [(2, 5), (1, 7)]]
            for extra in extras:
                p_nat = symbolic.plan_triangular(
                    M, 8, lower=lower, extra_tiles=extra)
                orig = _symcore.plan_maps

                def bomb(*a):
                    raise ImportError("forced fallback")

                _symcore.plan_maps = bomb
                try:
                    p_np = symbolic.plan_triangular(
                        M, 8, lower=lower, extra_tiles=extra)
                finally:
                    _symcore.plan_maps = orig
                assert p_nat.K == p_np.K and p_nat.T == p_np.T
                for f in ("tile_brow", "tile_bcol", "diag_dest",
                          "offdiag_dest", "level_chunks", "level_tiles",
                          "pad_idx"):
                    np.testing.assert_array_equal(
                        np.asarray(getattr(p_nat, f)),
                        np.asarray(getattr(p_np, f)), err_msg=f)


@pytest.mark.parametrize("ordering", ["colamd", "nd"])
def test_save_from_saved_lifecycle(rng, tmp_path, ordering):
    """Full-state persistence roundtrip (VERDICT r3 #5): construct →
    save → from_saved (no splu, no planning) → ldiv → refactor_numeric →
    ldiv. Also: value-change auto-refactor and pattern-mismatch error."""
    import scipy.sparse.linalg as spla

    from tpu_sparse_lu import ParallelSparseLU, SolverConfig
    from tpu_sparse_lu.models import poisson_2d

    A = poisson_2d(12, 10)
    n = A.shape[0]
    cfg = SolverConfig(chunk_size=16, tri_mode="inv", dtype="float32",
                       ordering=ordering)
    F = ParallelSparseLU(A, config=cfg)
    path = str(tmp_path / "state.npz")
    F.save(path)
    b = rng.random((n, 3))
    want = np.asarray(F.ldiv(b))

    # reload without re-running the backend: splu must NOT be called
    import tpu_sparse_lu.symbolic as sym
    calls = []
    orig = sym.factorize_host
    sym.factorize_host = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        G = ParallelSparseLU.from_saved(A, path)
    finally:
        sym.factorize_host = orig
    assert not calls, "from_saved re-ran the factorization backend"
    assert G.chunk_size == F.chunk_size
    np.testing.assert_allclose(np.asarray(G.ldiv(b)), want,
                               rtol=1e-5, atol=1e-6)

    # lifecycle continues: same-pattern numeric refactorization + solve
    A2 = A.copy()
    A2.data = A2.data * (1.0 + 0.01 * rng.random(A2.nnz))
    G.refactor_numeric(A2)
    x2 = np.asarray(G.ldiv(b, refine_steps=1))
    xe = spla.spsolve(A2.tocsc(), b)
    np.testing.assert_allclose(x2, xe, rtol=1e-4, atol=1e-5)

    # value change at load time: auto device refactor makes solves track A2
    H = ParallelSparseLU.from_saved(A2, path)
    x3 = np.asarray(H.ldiv(b, refine_steps=1))
    np.testing.assert_allclose(x3, xe, rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match="values differ"):
        ParallelSparseLU.from_saved(A2, path, on_value_change="error")

    # pattern change: clear error (reference reallocate path src:265-273)
    A3 = A.copy().tolil()
    A3[0, n - 1] = 7.0
    with pytest.raises(ValueError, match="pattern"):
        ParallelSparseLU.from_saved(sp.csc_matrix(A3), path)
