"""Device-side same-pattern numeric refactorization tests.

The reference's ``lu!`` path (src:245-279) re-runs UMFPACK's numeric
phase; our static-pivot device path must reproduce the factor-then-solve
results within the reference tolerances for same-pattern value changes.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from _approx import assert_isapprox
from tpu_sparse_lu import ParallelSparseLU, SolverConfig
from tpu_sparse_lu.models import (
    block_banded,
    fe_block_matrix,
    laplacian_1d,
    poisson_2d,
)

TOL = 1e-12


def _perturb_values(rng, A, scale=0.3):
    """New values, same pattern (the reference lifecycle's lu! case when
    sparsity is unchanged, runtests.jl:129-131)."""
    A2 = A.copy()
    A2.data = A2.data * (1.0 + scale * rng.standard_normal(A2.data.shape))
    return A2


@pytest.mark.parametrize("cs", [4, 8, 16])
def test_refactor_numeric_banded(rng, cs):
    A = laplacian_1d(100)
    F = ParallelSparseLU(A, chunk_size=cs)
    A2 = _perturb_values(rng, A, scale=0.05)
    F.refactor_numeric(A2)
    b = rng.random(100)
    assert_isapprox(np.asarray(F.ldiv(b)), spla.spsolve(A2, b), rtol=TOL, atol=TOL)


def test_refactor_numeric_poisson(rng):
    A = poisson_2d(10, 8)
    F = ParallelSparseLU(A, chunk_size=8)
    A2 = _perturb_values(rng, A, scale=0.05)
    F.refactor_numeric(A2)
    n = A.shape[0]
    b = rng.random(n)
    assert_isapprox(np.asarray(F.ldiv(b)), spla.spsolve(A2, b), rtol=TOL, atol=TOL)


def test_refactor_numeric_block_banded(rng):
    A = block_banded(rng, 12, 6)
    F = ParallelSparseLU(A, chunk_size=8)
    A2 = _perturb_values(rng, A, scale=0.1)
    F.refactor_numeric(A2)
    n = A.shape[0]
    b = rng.random(n)
    assert_isapprox(np.asarray(F.ldiv(b)), spla.spsolve(A2, b), rtol=TOL, atol=TOL)


def test_refactor_numeric_identical_values_matches_host(rng):
    """Refactorizing with the SAME values must reproduce the host
    factorization's solve to full precision."""
    A = fe_block_matrix(rng, 10, 5)
    n = A.shape[0]
    b = rng.random(n)
    F = ParallelSparseLU(A, chunk_size=8)
    x_host = np.asarray(F.ldiv(b))
    F.refactor_numeric(A)
    x_dev = np.asarray(F.ldiv(b))
    assert_isapprox(x_dev, x_host, rtol=TOL, atol=TOL)


def test_refactor_numeric_repeated(rng):
    """Many refactor→solve cycles (the library's raison d'être,
    runtests.jl:108-188) stay accurate."""
    A = laplacian_1d(64)
    F = ParallelSparseLU(A, chunk_size=8)
    for _ in range(4):
        A = _perturb_values(rng, A, scale=0.02)
        F.refactor_numeric(A)
        b = rng.random(64)
        # one refinement step absorbs the static-pivot conditioning loss
        # (SURVEY.md §7 hard part 2)
        assert_isapprox(
            np.asarray(F.ldiv(b, refine_steps=1)),
            spla.spsolve(A, b), rtol=TOL, atol=TOL,
        )


def test_refactor_numeric_rejects_pattern_change(rng):
    A = laplacian_1d(32)
    F = ParallelSparseLU(A)
    A2 = A.tolil()
    A2[0, 31] = 1.0  # new nonzero → pattern change
    with pytest.raises(ValueError):
        F.refactor_numeric(A2.tocsc())


def test_refactor_numeric_then_host_refactor(rng):
    """Host refactor after device refactor resets the static schedule."""
    A = laplacian_1d(48)
    F = ParallelSparseLU(A, chunk_size=8)
    F.refactor_numeric(_perturb_values(rng, A, 0.05))
    assert F.has_device_refactor
    A3 = _perturb_values(rng, A, 0.5)
    F.refactor(A3)
    assert not F.has_device_refactor
    b = rng.random(48)
    assert_isapprox(np.asarray(F.ldiv(b)), spla.spsolve(A3, b), rtol=TOL, atol=TOL)


@pytest.mark.parametrize("tri_mode", ["trsm", "inv_refine"])
def test_refactor_numeric_tri_modes(rng, tri_mode):
    A = poisson_2d(8, 8)
    F = ParallelSparseLU(A, config=SolverConfig(chunk_size=8, tri_mode=tri_mode))
    A2 = _perturb_values(rng, A, scale=0.05)
    F.refactor_numeric(A2)
    b = rng.random(A.shape[0])
    assert_isapprox(np.asarray(F.ldiv(b)), spla.spsolve(A2, b), rtol=TOL, atol=TOL)


def test_fused_refactor_solve_step(rng):
    """make_refactor_solve_step: one jitted program doing device
    refactorization + full ldiv, matching the two-call path."""
    A = poisson_2d(8, 8)
    n = A.shape[0]
    F = ParallelSparseLU(A, chunk_size=8)
    step = F.make_refactor_solve_step()
    A2 = _perturb_values(rng, A, scale=0.05)
    b = rng.random((n, 3))
    x = np.asarray(step(A2.data, b))
    for j in range(3):
        assert_isapprox(x[:, j], spla.spsolve(A2, b[:, j]), rtol=TOL, atol=TOL)
    # F's cached state untouched: plain ldiv still solves the ORIGINAL A
    b1 = rng.random(n)
    assert_isapprox(np.asarray(F.ldiv(b1)), spla.spsolve(A, b1),
                    rtol=TOL, atol=TOL)
