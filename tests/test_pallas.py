"""Fused Pallas ldiv kernel: interpret-mode equivalence on CPU.

The op-stream kernel (ops/pallas_ldiv.py) targets TPU (lane-aligned pages,
VMEM-resident panels); interpret mode validates the op ordering, the page
DMA choreography, the phase-boundary zeroing and the panel routing against
the XLA engine's full ``ldiv`` on the same factorization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_sparse_lu import ParallelSparseLU, SolverConfig
from tpu_sparse_lu.models import fe_block_matrix, laplacian_1d, poisson_2d
from tpu_sparse_lu.ops.pallas_ldiv import (
    PAGE,
    SRC_LDINV,
    SRC_LOFF,
    SRC_PERMP,
    SRC_PERMQ,
    SRC_SHIFT,
    SRC_UDINV,
    SRC_UOFF,
    build_ldiv_ops,
    build_lu_stream,
    build_perm_stream,
    pallas_fused_ldiv,
    stream_gather_spec,
    supports_fused_ldiv,
)
from tpu_sparse_lu.solve import block_rhs, unblock_rhs


def _build_ops(F):
    ops = build_ldiv_ops(
        F._pvec, F.plan.lplan, F.plan.uplan, F._qvec, KA=F._K_in
    )
    assert ops is not None
    sizes = {
        SRC_PERMP: ops.res_p.shape[0],
        SRC_LDINV: F.plan.lplan.K + 1,
        SRC_LOFF: F.plan.lplan.T + 1,
        SRC_UDINV: F.plan.uplan.K + 1,
        SRC_UOFF: F.plan.uplan.T + 1,
        SRC_PERMQ: ops.res_q.shape[0],
    }
    s_perm = build_perm_stream(
        jnp.asarray(stream_gather_spec(ops, sizes, 0)),
        jnp.asarray(ops.res_p), jnp.asarray(ops.res_q),
    )
    s_lu = build_lu_stream(
        jnp.asarray(stream_gather_spec(ops, sizes, 1)),
        F.ldata.diag_inv, F.ldata.offdiag,
        F.udata.diag_inv, F.udata.offdiag,
        dtype=F._stream_dt,  # honours SolverConfig.stream_dtype
    )
    return ops, s_perm, s_lu


def _fused_ldiv(F, b):
    ops, s_perm, s_lu = _build_ops(F)
    xw = block_rhs(b, F.n, F._K_in, F.plan.cs) * F._rs_blk
    out = pallas_fused_ldiv(ops, s_perm, s_lu, xw, interpret=True)
    return unblock_rhs(out, F.n)


@pytest.mark.parametrize("make", [
    lambda rng: poisson_2d(10, 8),
    lambda rng: laplacian_1d(50),
    lambda rng: fe_block_matrix(rng, 10, 5),
])
@pytest.mark.parametrize("R", [1, 4])
def test_fused_ldiv_matches_xla(rng, make, R):
    A = make(rng)
    n = A.shape[0]
    F = ParallelSparseLU(
        A, config=SolverConfig(chunk_size=8, tri_mode="inv", dtype="float32")
    )
    b = jnp.asarray(rng.random((n, R)), dtype=jnp.float32)
    ref = np.asarray(F.ldiv(b))  # XLA path (CPU backend -> not fused)
    got = np.asarray(_fused_ldiv(F, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_fused_ldiv_nd_embedding(rng):
    """Rectangular perm maps (input space != factor space) through the
    nested-dissection embedding."""
    A = poisson_2d(12, 12)
    F = ParallelSparseLU(
        A, config=SolverConfig(chunk_size=16, tri_mode="inv",
                               dtype="float32", ordering="nd")
    )
    assert F.n_factor > F.n  # the embedding actually extended
    b = jnp.asarray(rng.random((A.shape[0], 3)), dtype=jnp.float32)
    ref = np.asarray(F.ldiv(b))
    got = np.asarray(_fused_ldiv(F, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_op_stream_structure(rng):
    """Every tile op appears exactly once, in dependency order."""
    A = poisson_2d(12, 12)
    F = ParallelSparseLU(A, chunk_size=8, config=None)

    ops = build_ldiv_ops(
        F._pvec, F.plan.lplan, F.plan.uplan, F._qvec, KA=F._K_in
    )
    lplan, uplan = F.plan.lplan, F.plan.uplan
    # coverage: each factor's diag ops == K (SET), off-diag ops == T (ADD)
    is_diag = np.isin(ops.tile_base, (SRC_LDINV, SRC_UDINV))
    is_off = np.isin(ops.tile_base, (SRC_LOFF, SRC_UOFF))
    assert int(np.sum(is_diag)) == lplan.K + uplan.K
    assert int(np.sum(is_off)) == lplan.T + uplan.T
    # set-ops: the diag solves (in place, src == dst) plus the un-pivot
    # phase's first write per output block (the output space aliases the
    # dead input space, so first writes must SET over stale values)
    acc0 = np.asarray(ops.acc) == 0
    assert np.all(acc0[is_diag])
    out_sets = acc0 & ~is_diag
    assert np.all(ops.dst[out_sets] <= ops.KA)   # only output blocks
    assert np.all(ops.src[is_diag] == ops.dst[is_diag])
    # padding (one run per page-aligned segment) points at the dummy
    # panel block with a zero tile
    dummy = ops.panel_blocks - 1
    pad = ops.tile_base == -1
    assert int(np.sum(~pad)) == ops.n_ops
    assert np.all(ops.src[pad] == dummy)
    assert np.all(ops.dst[pad] == dummy)
    assert ops.src.shape[0] % PAGE == 0
    # pages are single-kind: int8 perm residue on kind-0 pages, L/U on
    # f32 kind-1 pages, zero-byte shift ops on kind-2 pages
    kind_of_slot = np.repeat(ops.page_kind, PAGE)
    perm_slot = np.isin(ops.tile_base, (SRC_PERMP, SRC_PERMQ))
    lu_slot = np.isin(ops.tile_base, (SRC_LDINV, SRC_LOFF,
                                      SRC_UDINV, SRC_UOFF))
    shift_slot = ops.tile_base == SRC_SHIFT
    assert np.all(kind_of_slot[perm_slot] == 0)
    assert np.all(kind_of_slot[lu_slot] == 1)
    assert np.all(kind_of_slot[shift_slot] == 2)
    # every perm (dst_chunk, src_chunk) pair is covered exactly once: as
    # shift runs (with valid lane ranges) or as an int8 residue tile, and
    # the vector decomposition reproduces the dense one-hot tiles exactly
    from tpu_sparse_lu.ops.pallas_ldiv import perm_spec

    cs8 = F.plan.cs
    for vec, pp, K_in in ((F._pvec, F._pperm, F._K_in),
                          (F._qvec, F._qperm, F.plan.lplan.K)):
        shifts, mm, res = perm_spec(vec, cs8, K_in)
        covered = {(d, s) for d, s, *_ in shifts} | {(d, s) for d, s, _ in mm}
        dense = np.asarray(pp.tiles)          # (K, S, cs, cs)
        srcs = np.asarray(pp.src)
        real = {(k, int(srcs[k, a]))
                for k, a in zip(*np.nonzero(dense.any(axis=(2, 3))))}
        assert covered == real
        # rebuild each pair's one-hot from runs+residue; compare to dense
        for k in range(dense.shape[0]):
            for a in range(dense.shape[1]):
                sc = int(srcs[k, a])
                if sc >= pp.K_in:
                    continue
                want = dense[k, a]
                got = np.zeros_like(want)
                for (d, s, dl, l, h) in shifts:
                    if (d, s) == (k, sc):
                        lanes = np.arange(l, h)
                        got[lanes, (lanes - dl) % cs8] = 1
                for (d, s, t) in mm:
                    if (d, s) == (k, sc):
                        got |= res[t]
                np.testing.assert_array_equal(got, want)
    # real shift runs have non-empty lane ranges; block-zeroing ops
    # (src = dummy, acc = 0 — the un-pivot SET of partially covered
    # output blocks) legitimately carry lo == hi == 0
    dummy_blk = ops.panel_blocks - 1
    zero_op = shift_slot & (ops.src == dummy_blk) & (ops.acc == 0)
    run_op = shift_slot & ~zero_op
    assert np.all(ops.lo[run_op] < ops.hi[run_op])
    assert np.all(ops.hi[run_op] <= ops.cs)
    assert np.all(ops.hi[zero_op] == 0)
    # dependency order within L: a chunk's diag solve precedes every op
    # consuming it as source, and follows every op targeting it
    seen_solved = set()
    for i in range(ops.src.shape[0]):
        s, d = int(ops.src[i]), int(ops.dst[i])
        if ops.tile_base[i] == SRC_LDINV:
            seen_solved.add(d)
        if ops.tile_base[i] == SRC_LOFF:
            assert s in seen_solved  # source chunk already solved
            assert d not in seen_solved  # destination not yet solved


def test_supports_fused_ldiv_gates(rng):
    A = poisson_2d(10, 10)
    F8 = ParallelSparseLU(
        A, config=SolverConfig(chunk_size=8, tri_mode="inv", dtype="float32")
    )
    ops = build_ldiv_ops(
        F8._pvec, F8.plan.lplan, F8.plan.uplan, F8._qvec, KA=F8._K_in
    )
    assert not supports_fused_ldiv(ops, 16)          # cs=8 not lane-aligned
    assert not supports_fused_ldiv(None, 16)
    assert not supports_fused_ldiv(ops, 16, itemsize=8)  # f64


def test_lu_tile_interpret_matches_nopivot(rng):
    """The Pallas masked-reduction LU kernel (ops/pallas_factor.py) vs the
    XLA reference `_lu_nopivot` on random diagonally-dominant batches —
    interpret mode, so the TPU elimination kernel is CI-covered
    (supports_lu_tile gates the real backend)."""
    from tpu_sparse_lu.ops.pallas_factor import lu_tile
    from tpu_sparse_lu.refactor import _lu_nopivot

    cs = 16
    D = rng.standard_normal((5, cs, cs)).astype(np.float32)
    D += cs * np.eye(cs, dtype=np.float32)  # no-pivot-stable
    want = np.asarray(_lu_nopivot(jnp.asarray(D)))
    got = np.asarray(lu_tile(jnp.asarray(D), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_ldiv_gather_fallback_perm(rng):
    """Vector-decomposed perms keep the fused path available when the
    block-one-hot PermPlan itself falls back to gather (high fan-in —
    the n ~ 1e5 regime where one-hot tile grids exceed the memory cap).
    Forces the fallback via max_fanin and checks the interpret-mode fused
    solve against scipy."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from tpu_sparse_lu.ops import permute as pm

    A = poisson_2d(12, 10)
    n = A.shape[0]
    orig = pm.build_perm_plan

    def tiny_fanin(perm, n_, cs, **kw):
        kw["max_fanin"] = 1  # force the gather fallback for every plan
        return orig(perm, n_, cs, **kw)

    pm.build_perm_plan = tiny_fanin
    try:
        F = ParallelSparseLU(A, config=SolverConfig(
            chunk_size=8, tri_mode="inv", dtype="float32"))
    finally:
        pm.build_perm_plan = orig
    assert F._pperm.gather_idx is not None  # fallback actually engaged
    b = jnp.asarray(rng.random((n, 4)), dtype=jnp.float32)
    got = np.asarray(_fused_ldiv(F, b))
    want = spla.spsolve(sp.csc_matrix(A), np.asarray(b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_ldiv_fuzz(rng):
    """Property fuzz across sizes, chunk sizes, RHS widths and orderings
    (reference-style randomized sweep, runtests.jl:31-34): the fused
    interpret solve must match scipy on every instance — hardens the
    vector perm decomposition (shift runs + residues) against ragged
    tails, non-divisible n, and scrambled pivots."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from tpu_sparse_lu.models import random_sparse

    cases = 0
    for trial in range(12):
        n = int(rng.integers(17, 90))
        cs = int(rng.choice([4, 8, 16]))
        R = int(rng.choice([1, 3, 8]))
        A = random_sparse(rng, n, density=0.08) + sp.eye(n) * 3.0
        A = sp.csc_matrix(A)
        try:
            F = ParallelSparseLU(A, config=SolverConfig(
                chunk_size=cs, tri_mode="inv", dtype="float32"))
        except RuntimeError:
            continue  # singular draw
        b = jnp.asarray(rng.random((n, R)), dtype=jnp.float32)
        got = np.asarray(_fused_ldiv(F, b))
        want = spla.spsolve(A, np.asarray(b))
        if R == 1:
            want = want.reshape(n, 1)
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(got / scale, want / scale,
                                   rtol=2e-4, atol=2e-4)
        cases += 1
    assert cases >= 8  # the sweep must mostly run, not skip


def test_fused_ldiv_strip_paging(rng, monkeypatch):
    """R-strip panel paging (VERDICT r3 #3): when the full RHS panel
    exceeds the VMEM budget, fused_ldiv_auto pages it through the kernel
    in max_fused_rhs-wide strips and the concatenated result matches the
    XLA engine. Forced here by shrinking the module's VMEM budget."""
    from tpu_sparse_lu.ops import pallas_ldiv as pld

    A = poisson_2d(10, 8)
    n = A.shape[0]
    F = ParallelSparseLU(
        A, config=SolverConfig(chunk_size=8, tri_mode="inv", dtype="float32")
    )
    ops, s_perm, s_lu = _build_ops(F)
    monkeypatch.setattr(pld, "_LANES", 8)  # test-size chunks
    pages = 2 * pld.PAGE * 8 * 8 * 5
    panel8 = ops.panel_blocks * 8 * 8 * 4  # Rp = 8 panel bytes
    monkeypatch.setattr(pld, "_VMEM_BUDGET", pages + panel8 + panel8 // 2)
    assert pld.supports_fused_ldiv(ops, 1)
    assert not pld.supports_fused_ldiv(ops, 20)  # full panel over budget
    assert pld.max_fused_rhs(ops) == 8
    R = 20  # 3 strips: 8 + 8 + 4
    b = jnp.asarray(rng.random((n, R)), dtype=jnp.float32)
    xw = block_rhs(b, F.n, F._K_in, F.plan.cs) * F._rs_blk
    out = pld.fused_ldiv_auto(ops, s_perm, s_lu, xw, interpret=True)
    got = np.asarray(unblock_rhs(out, F.n))
    ref = np.asarray(F.ldiv(b))  # XLA path (CPU backend -> not fused)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("R", [1, 4])
def test_fused_ldiv_bf16_stream(rng, R):
    """bf16 L/U stream (VERDICT r3 #4): the fused solve with half-width
    tile pages must match the f32 XLA engine to bf16 tile precision, and
    one f64-residual refinement sweep restores full accuracy."""
    import scipy.sparse.linalg as spla

    A = poisson_2d(10, 8)
    n = A.shape[0]
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=8, tri_mode="inv", dtype="float32",
        stream_dtype="bfloat16"))
    b = jnp.asarray(rng.random((n, R)), dtype=jnp.float32)
    ops, s_perm, s_lu = _build_ops(F)
    assert s_lu.dtype == jnp.bfloat16  # the stream is actually half-width
    xw = block_rhs(b, F.n, F._K_in, F.plan.cs) * F._rs_blk
    got = np.asarray(unblock_rhs(
        pallas_fused_ldiv(ops, s_perm, s_lu, xw, interpret=True), F.n))
    want = spla.spsolve(A.tocsc(), np.asarray(b)).reshape(n, R)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 3e-2, f"bf16 direct solve rel err {rel}"  # ~8-bit tiles
    assert rel > 1e-6  # sanity: the stream really was quantized

    # f64-residual IR sweeps THROUGH the bf16 fused kernel recover well
    # past f32 accuracy (the production pairing: stream_dtype="bfloat16"
    # + make_f64_ldiv / refine_steps)
    def bf16_solve(v64):
        vw = block_rhs(jnp.asarray(v64, jnp.float32),
                       F.n, F._K_in, F.plan.cs) * F._rs_blk
        out = pallas_fused_ldiv(ops, s_perm, s_lu, vw, interpret=True)
        return np.asarray(unblock_rhs(out, F.n), dtype=np.float64)

    b64 = np.asarray(b, np.float64)
    x = got.astype(np.float64)
    for _ in range(4):
        x = x + bf16_solve(b64 - A @ x)
    rel2 = np.linalg.norm(x - want) / np.linalg.norm(want)
    # contraction ~kappa*eps_bf16 per sweep (slower than the f32 tier's,
    # which reaches 1e-13 in one sweep); 4 sweeps land far below f32
    assert rel2 < 1e-11, f"bf16+IR rel err {rel2}"
