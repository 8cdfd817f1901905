"""Round-5 features: tri_mode="auto" fast-path default, the
make_f64_ldiv generation guard, factorize="device" (first factorization
on device), and host-factor materialization after device
refactorizations.

Reference anchors: default-constructor parity (src:64-72), the
UMFPACK construct-time dependency being replaced (src:74), the factor
identity ``L @ U == (Rs .* A)[p, q]`` (src:292-316), and ``lu!`` keeping
solves correct after refactorization (src:245-279).
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from _approx import assert_isapprox
from tpu_sparse_lu import ParallelSparseLU, SolverConfig
from tpu_sparse_lu.models import fe_block_matrix, poisson_2d
from tpu_sparse_lu.utils.config import default_chunk_size, resolve_tri_mode


# ---------------------------------------------------------------------------
# tri_mode="auto" / default fast path (VERDICT r4 #7)
# ---------------------------------------------------------------------------


def test_tri_mode_auto_resolution():
    """"auto" picks the fused-kernel-eligible mode on TPU, exact trsm
    elsewhere; explicit modes pass through unchanged."""
    assert resolve_tri_mode("auto", "tpu", np.float32) == "inv"
    assert resolve_tri_mode("auto", "cpu", np.float64) == "trsm"
    assert resolve_tri_mode("auto", "gpu", np.float32) == "trsm"
    for m in ("trsm", "inv", "inv_refine"):
        assert resolve_tri_mode(m, "tpu", np.float32) == m


def test_default_chunk_size_backend():
    """TPU default is 128 (the fused kernel's lane requirement) so the
    no-config constructor lands on the fast path; CPU policy unchanged."""
    assert default_chunk_size(10_000, "tpu") == 128
    assert default_chunk_size(64, "tpu") == 64  # clamped to n
    assert default_chunk_size(100, "cpu") == 8
    assert default_chunk_size(1000, "cpu") == 32
    assert default_chunk_size(10_000, "cpu") == 64


def test_default_config_resolves_concrete_mode(rng):
    """The stored config always carries a concrete tri_mode after
    construction (on this CPU suite: trsm), and solves at the reference
    bar with no boilerplate — default-constructor parity (src:64-72)."""
    A = fe_block_matrix(rng, 10, 5)
    F = ParallelSparseLU(A)
    assert F.config.tri_mode == "trsm"  # CPU backend under conftest
    b = rng.random(A.shape[0])
    assert_isapprox(np.asarray(F.ldiv(b)), spla.spsolve(A, b),
                    rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# make_f64_ldiv generation guard (VERDICT r4 #6)
# ---------------------------------------------------------------------------


def test_f64_ldiv_stale_after_refactor(rng):
    """make_f64_ldiv -> refactor -> call raises; the silent-stale
    failure mode is the one a solver API must never have."""
    A = fe_block_matrix(rng, 5, 5)
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=8, tri_mode="inv", dtype="float32"))
    solve = F.make_f64_ldiv(refine_steps=1)
    b = rng.random(A.shape[0])
    x = np.asarray(solve(b))  # works before the refactorization
    assert_isapprox(x, spla.spsolve(A.tocsc(), b), rtol=1e-10, atol=1e-10)
    A2 = A.copy()
    A2.data = A2.data * 1.05
    F.refactor(A2)
    with pytest.raises(RuntimeError, match="stale make_f64_ldiv"):
        solve(b)
    # a fresh callable serves the new values
    solve2 = F.make_f64_ldiv(refine_steps=1)
    assert_isapprox(np.asarray(solve2(b)), spla.spsolve(A2.tocsc(), b),
                    rtol=1e-10, atol=1e-10)


def test_f64_ldiv_stale_after_refactor_none(rng):
    """Even the re-pack path (refactor(None), reference src:246) bumps
    the generation: the baked streams were rebuilt."""
    A = fe_block_matrix(rng, 5, 5)
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=8, tri_mode="inv", dtype="float32"))
    solve = F.make_f64_ldiv(refine_steps=1)
    solve(rng.random(A.shape[0]))
    F.refactor(None)
    with pytest.raises(RuntimeError, match="stale make_f64_ldiv"):
        solve(rng.random(A.shape[0]))


# ---------------------------------------------------------------------------
# factorize="device" — first factorization on device (VERDICT r4 #3)
# ---------------------------------------------------------------------------


def test_factorize_device_requires_static_pivots(rng):
    A = fe_block_matrix(rng, 10, 5)
    with pytest.raises(ValueError, match="static-diagonal-pivot"):
        ParallelSparseLU(A, config=SolverConfig(
            chunk_size=8, factorize="device"))


def test_factorize_auto_resolution(rng):
    """"auto" picks "device" exactly when the ordering freezes diagonal
    pivots (pattern-only pivot order), else "host"."""
    A = poisson_2d(10, 10)
    F_nd = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=16, ordering="nd", factorize="auto"))
    assert F_nd.config.factorize == "device"
    F_co = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=16, factorize="auto"))
    assert F_co.config.factorize == "host"


def test_factorize_device_lifecycle(rng):
    """Construct WITHOUT SuperLU (pattern-only host work + one device
    elimination, replacing the reference's construct-time lu(A),
    src:74), then the full reference lifecycle: solve -> new RHS ->
    device refactor with new values -> solve."""
    A = poisson_2d(20, 20)
    n = A.shape[0]
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=16, ordering="nd", factorize="device"))
    assert F.config.factorize == "device"
    assert F.has_device_refactor  # the construct built/ran the pipeline
    b = rng.random(n)
    xe = spla.spsolve(A.tocsc(), b)
    x = np.asarray(F.ldiv(b, refine_steps=1))
    assert_isapprox(x, xe, rtol=1e-9, atol=1e-9)
    # new RHS, same factorization
    b2 = rng.random(n)
    assert_isapprox(np.asarray(F.ldiv(b2, refine_steps=1)),
                    spla.spsolve(A.tocsc(), b2), rtol=1e-9, atol=1e-9)
    # value change, device refactorization (same pattern)
    A2 = A.copy()
    A2.data = A2.data * (1 + 0.05 * rng.standard_normal(A2.data.shape))
    F.refactor_numeric(A2)
    assert_isapprox(np.asarray(F.ldiv(b, refine_steps=1)),
                    spla.spsolve(A2.tocsc(), b), rtol=1e-9, atol=1e-9)


def test_factorize_device_factor_identity(rng):
    """The materialized factors satisfy the reference identity
    ``L @ U == (Rs .* A)[p, q]`` (src:292-316) even though no host
    factorization ever ran."""
    A = poisson_2d(12, 12)
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=16, ordering="nd", factorize="device"))
    L, U = F.L, F.U  # lazy materialization from the device tiles
    nf = F.n_factor
    # under nd the factored matrix is the chunk-aligned extension
    indptr, indices = F._a_factor_pattern
    Af = sp.csc_matrix(
        (F._ext_values(sp.csc_matrix(A)), indices, indptr), shape=(nf, nf)
    )
    B = (sp.diags(np.asarray(F.Rs)) @ Af)[F.p][:, F.q]
    err = abs(L @ U - B).max()
    assert err < 1e-5  # f32 elimination
    # L carries an explicit unit diagonal (reference convention)
    assert np.allclose(L.diagonal(), 1.0)


def test_materialized_LU_after_refactor_numeric(rng):
    """F.L/F.U refresh lazily after a device refactorization (the host
    csc values would otherwise be stale — worse than the reference,
    which updates its factors in place on every lu!, src:261-276)."""
    A = poisson_2d(14, 14)
    F = ParallelSparseLU(A, config=SolverConfig(chunk_size=16,
                                                ordering="nd"))
    A2 = A.copy()
    A2.data = A2.data * (1 + 0.1 * rng.standard_normal(A2.data.shape))
    F.refactor_numeric(A2)
    L, U = F.L, F.U
    nf = F.n_factor
    indptr, indices = F._a_factor_pattern
    Af = sp.csc_matrix(
        (F._ext_values(sp.csc_matrix(A2)), indices, indptr), shape=(nf, nf)
    )
    B = (sp.diags(np.asarray(F.Rs)) @ Af)[F.p][:, F.q]
    assert abs(L @ U - B).max() < 1e-5


def test_factorize_device_save_roundtrip(rng, tmp_path):
    """save() under factorize="device" defaults to the values-less light
    save (the solver has a device refactor schedule, so the load
    recomputes values from A's nonzeros — VERDICT r4 #8); from_saved
    solves at the same accuracy."""
    A = poisson_2d(12, 12)
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=16, ordering="nd", factorize="device"))
    b = rng.random(A.shape[0])
    x0 = np.asarray(F.ldiv(b, refine_steps=1))
    path = str(tmp_path / "state.npz")
    F.save(path)
    z = np.load(path)
    assert "light" in z.files and "L_data" not in z.files
    F2 = ParallelSparseLU.from_saved(A, path)
    x1 = np.asarray(F2.ldiv(b, refine_steps=1))
    assert_isapprox(x1, x0, rtol=1e-6, atol=1e-6)
    assert_isapprox(x1, spla.spsolve(A.tocsc(), b), rtol=1e-8, atol=1e-8)
    # values=True keeps the universally-loadable full save
    full = str(tmp_path / "full.npz")
    F.save(full, values=True)
    assert "L_data" in np.load(full).files
    x2 = np.asarray(ParallelSparseLU.from_saved(A, full).ldiv(
        b, refine_steps=1))
    assert_isapprox(x2, x0, rtol=1e-6, atol=1e-6)


def test_save_light_from_host_solver(rng, tmp_path):
    """values=False on a host-factorized solver builds the device
    schedule at save time; the reload never calls the host backend and
    recomputes the values via the device elimination. The light file
    drops the nnz(LU)-sized value arrays (the dominant bytes)."""
    A = poisson_2d(14, 14)
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=16, ordering="nd", dtype="float32", tri_mode="inv"))
    assert not F.has_device_refactor
    light = str(tmp_path / "light.npz")
    F.save(light, values=False)
    assert F.has_device_refactor  # built to serialize the schedule
    full = str(tmp_path / "full.npz")
    F.save(full, values=True)

    import tpu_sparse_lu.symbolic as sym
    calls = []
    orig = sym.factorize_host
    sym.factorize_host = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        G = ParallelSparseLU.from_saved(A, light)
    finally:
        sym.factorize_host = orig
    assert not calls, "light reload re-ran the host factorization backend"
    b = rng.random(A.shape[0])
    xe = spla.spsolve(A.tocsc(), b)
    assert_isapprox(np.asarray(G.ldiv(b, refine_steps=1), dtype=np.float64),
                    xe, rtol=1e-4, atol=1e-5)
    # the lifecycle continues after a light reload
    A2 = A.copy()
    A2.data = A2.data * (1 + 0.02 * rng.standard_normal(A2.data.shape))
    G.refactor_numeric(A2)
    assert_isapprox(np.asarray(G.ldiv(b, refine_steps=1), dtype=np.float64),
                    spla.spsolve(A2.tocsc(), b), rtol=1e-4, atol=1e-5)
    # on_value_change="error" still sanity-checks values in light mode
    with pytest.raises(ValueError, match="values differ"):
        ParallelSparseLU.from_saved(A2, light, on_value_change="error")
    # value change at load: the light reload factors A2 directly
    H = ParallelSparseLU.from_saved(A2, light)
    assert_isapprox(np.asarray(H.ldiv(b, refine_steps=1), dtype=np.float64),
                    spla.spsolve(A2.tocsc(), b), rtol=1e-4, atol=1e-5)


def test_span_gather_smem_gate():
    """supports_span_gather bounds the scalar-prefetch schedules against
    the 1 MB SMEM space (measured v5e failure at n=40k nd: 3 x 924 KB
    prefetched scalars -> 'Used 2.71M of 1.00M smem'). Oversized
    assemblies must route to the windowed XLA fallback."""
    from tpu_sparse_lu.ops.pallas_span import supports_span_gather

    # small schedules fit (interpret mode bypasses the backend check)
    assert supports_span_gather(4096, 64 * 128, 128, interpret=True)
    # the measured failing size: n_rows=235776 -> 2.77 MB of scalars
    assert not supports_span_gather(235776, 64 * 128, 128, interpret=True)


def test_light_save_preserves_config(rng, tmp_path):
    """The reload reconstructs the solver from the persisted config —
    stream dtype, factorize mode, nd cutoff, chunk size all survive the
    light roundtrip (a dropped config field would silently rebuild the
    solver with defaults)."""
    A = poisson_2d(12, 12)
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=16, ordering="nd", factorize="device",
        stream_dtype="bfloat16", nd_cutoff=32))
    path = str(tmp_path / "cfg.npz")
    F.save(path)
    assert "light" in np.load(path).files
    G = ParallelSparseLU.from_saved(A, path)
    assert G.config.stream_dtype == "bfloat16"
    assert G.config.factorize == "device"
    assert G._nd_cutoff == F._nd_cutoff
    assert G.chunk_size == F.chunk_size
    assert str(G._stream_dt) == "bfloat16"


def test_save_values_at_working_precision(rng, tmp_path):
    """Factor values persist at the solver dtype (f32 halves the file's
    dominant bytes, VERDICT r4 #8) and the reload still solves at the
    f32 accuracy tier."""
    A = fe_block_matrix(rng, 20, 5)
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=16, tri_mode="inv", dtype="float32"))
    path = str(tmp_path / "f32.npz")
    F.save(path)
    z = np.load(path)
    assert z["L_data"].dtype == np.float32
    assert z["U_data"].dtype == np.float32
    F2 = ParallelSparseLU.from_saved(A, path)
    b = rng.random(A.shape[0])
    x = np.asarray(F2.ldiv(b, refine_steps=1), dtype=np.float64)
    xe = spla.spsolve(A.tocsc(), b)
    assert np.linalg.norm(x - xe) / np.linalg.norm(xe) < 1e-5
    # f64 solvers keep full-precision values on disk
    F64 = ParallelSparseLU(A, chunk_size=16)
    p64 = str(tmp_path / "f64.npz")
    F64.save(p64)
    assert np.load(p64)["L_data"].dtype == np.float64
