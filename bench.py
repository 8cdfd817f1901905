"""Benchmark harness (SURVEY.md §6, M4) — the five BASELINE.json configs.

Default run (what the driver records): config 4, the 2D Poisson
level-scheduled solve, printing ONE JSON line
  {"metric": "poisson100_ldiv_throughput", "value": N, "unit": "nnz/s",
   "vs_baseline": N}
against the reference-equivalent algorithm measured locally (SuperLU
factor + solve via scipy — the reference delegates to UMFPACK + chunked
BLAS, SURVEY.md C8/C9, and publishes no numbers of its own).

``python bench.py --all`` additionally runs configs 1-3 and 5 and writes
the detail to BENCH_DETAIL.json. ``--config N`` runs a single config.

Timing method: solves chained INSIDE one jit (x_{i+1} = solve(x_i)/|..| —
the PDE time-stepper pattern) at two chain lengths, reporting the
TWO-POINT SLOPE (t(N2)-t(N1))/(N2-N1): the marginal steady-state cost of
one more solve. Through this RPC-tunneled device the only real sync is a
host pull costing a FLAT ~35 ms regardless of payload (measured;
block_until_ready returns before the device finishes) — 20-400x the
solve itself, identical for both chain lengths, and cancelled exactly by
the slope. On directly-attached hardware the slope converges to ordinary
per-solve timing. The two chains' reps are interleaved so drift cannot
masquerade as slope.
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse.linalg as spla

from tpu_sparse_lu.utils.profiling import (  # noqa: F401 (re-exported)
    slope_time as _slope_time,
)
from tpu_sparse_lu.utils.profiling import chain_time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _chain_time(exe_args_fn, b, reps=5, name="solve"):
    """Marginal steady-state seconds per solve (utils/profiling.py)."""
    return chain_time(exe_args_fn, b, reps=reps)


def _chain_time_short(exe_args_fn, b, n1=4, n2=16, reps=5):
    """Slope timing with SHORT chains (axon HTTP 413 workaround): the
    remote-compile request length limit rejects deep-chain programs for
    very large plans (n ~ 1e5 op streams), so bracket with n1/n2-deep
    chains instead. Same flat-sync cancellation as slope_time, less
    signal — fine when one solve costs >= ~0.3 ms."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    f, args = exe_args_fn

    def make_chain(N):
        # args as jit ARGUMENTS (closure captures become HLO constants
        # — see utils/profiling.chain_time)
        @jax.jit
        def chain(v, *a):
            def body(i, v):
                w = f(v, *a)
                return w / (jnp.max(jnp.abs(w)) + 1e-30)
            return lax.fori_loop(0, N, body, v)
        return lambda x0: chain(x0, *args)

    c1, c2 = make_chain(n1), make_chain(n2)
    np.asarray(c1(b)), np.asarray(c2(b))  # compile + warmup
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(c1(b))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(c2(b))
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def _chain_time_robust(exe_args_fn, b, reps=5):
    """chain_time with the short-chain fallback for plans whose deep
    chains exceed the axon remote-compile request limit (HTTP 413)."""
    try:
        return chain_time(exe_args_fn, b, reps=reps)
    except Exception as e:  # XlaRuntimeError INTERNAL: ... HTTP 413
        if "413" not in str(e):
            raise
        log(f"deep chains rejected (HTTP 413) — short-chain bracketing: "
            f"{str(e)[:80]}")
        return _chain_time_short(exe_args_fn, b, reps=reps)


def _per(num, t):
    """num/t, or None when the timing never resolved (slope_time NaN) —
    keeps the JSON artifacts valid and flags the entry as unresolved."""
    if t is None or not np.isfinite(t) or t <= 0:
        return None
    return num / t


def _ldiv_fn(F):
    exe, args = F._ldiv_callable()
    return (lambda v, *a: exe(*a, v)), args


def _scipy_panel_time(A, R, reps=20):
    lu = spla.splu(A.tocsc())
    bb = np.random.default_rng(1).random((A.shape[0], R))
    lu.solve(bb)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        lu.solve(bb)
        ts.append(time.perf_counter() - t0)
    # min: the baseline must not be inflated by transient host CPU load
    return float(np.min(ts))


def _make_F(A, cs, **kw):
    from tpu_sparse_lu import ParallelSparseLU, SolverConfig

    cfg = SolverConfig(chunk_size=cs, tri_mode="inv", dtype="float32", **kw)
    return ParallelSparseLU(A, config=cfg)


def _phase_breakdown(F, b, t_full):
    """Per-phase timing (perm / lsolve / rsolve) via the standalone
    engines, plus a tile-level MFU estimate for the full solve.

    The phases are timed as separate programs, so their sum exceeds the
    fused ldiv when fusion is winning — that gap IS the fusion benefit.
    """
    import jax
    import jax.numpy as jnp

    from tpu_sparse_lu.ops.permute import apply_perm
    from tpu_sparse_lu.solve import block_rhs, unblock_rhs

    plan = F.plan
    cs, K_in, n_in = plan.cs, F._K_in, F._n_orig
    bf = jnp.zeros((plan.n, b.shape[1]), b.dtype)  # factor-space RHS

    def perm_only(pperm, qperm, rs_blk, v):
        xw = apply_perm(pperm, block_rhs(v, n_in, K_in, cs) * rs_blk)
        return unblock_rhs(apply_perm(qperm, xw), n_in)

    exe_p = jax.jit(perm_only)
    exe_l, exe_u = F._exe("lsolve"), F._exe("rsolve")
    phases = {
        "perm": _chain_time(
            ((lambda v, pp, qp, rs: exe_p(pp, qp, rs, v)),
             (F._pperm, F._qperm, F._rs_blk)), b, name="perm"),
        "lsolve": _chain_time(
            ((lambda v, ld: exe_l(ld, v)), (F.ldata,)), bf, name="lsolve"),
        "rsolve": _chain_time(
            ((lambda v, ud: exe_u(ud, v)), (F.udata,)), bf, name="rsolve"),
    }
    # MFU: every scheduled tile op is a cs x cs x R matmul. NOTE the
    # ceiling: at R RHS the fused solve's arithmetic intensity is 2R/4
    # flops per streamed byte vs the machine balance ~57 (49 TF/s /
    # 855 GB/s) — an HBM-bound solve caps MFU at ~R/114 no matter how
    # good the kernel is, so the speed-of-light metric is hbm_eff below.
    R = b.shape[1]
    n_tiles = (plan.lplan.K + plan.lplan.T + plan.uplan.K + plan.uplan.T)
    if F._ldiv_ops is not None:
        n_tiles = int(F._ldiv_ops.n_ops)
    tile_flops = 2.0 * n_tiles * cs * cs * R
    PEAK_F32 = 49e12  # v5e ~197 TFLOP/s bf16 -> ~49 full-f32
    phases["mfu_est"] = tile_flops / t_full / PEAK_F32
    phases["tile_ops"] = n_tiles
    if F._ldiv_ops is not None:
        # stream bytes actually DMA'd per solve + HBM efficiency vs the
        # ~819 GB/s v5e spec — the honest utilization figure for a
        # byte-bound direct solve (round-3 cost model: ~12 ns/op fixed
        # + bytes at ~855 GB/s, see ops/pallas_ldiv.py)
        from tpu_sparse_lu.ops.pallas_ldiv import PAGE, SRC_SHIFT

        ops = F._ldiv_ops
        pk = np.asarray(ops.page_kind)
        slots = {
            "f32": int((pk == 1).sum()) * PAGE,
            "int8": int((pk == 0).sum()) * PAGE,
            "shift": int((pk == 2).sum()) * PAGE,
        }
        panel_io = 2 * (F._K_in + 1) * cs * max(8, R) * 4
        stream_bytes = (slots["f32"] * cs * cs * 4
                        + slots["int8"] * cs * cs + panel_io)
        phases["stream_slots"] = slots
        phases["stream_bytes"] = stream_bytes
        phases["hbm_eff"] = stream_bytes / t_full / 819e9
    return phases


def _check_residual(F, A, b, tol=1e-3):
    """Normwise backward error ||Ax-b|| / (||A|| ||x|| + ||b||): ~eps for a
    backward-stable solve regardless of conditioning (the relative-to-b
    residual scales with kappa(A) and is meaningless for e.g. the 1D
    Laplacian at n=20k, kappa ~ 4e8, in fp32)."""
    x = np.asarray(F.ldiv(b))
    bn = np.asarray(b)
    r = np.linalg.norm(A @ x - bn) / (
        spla.norm(A) * np.linalg.norm(x) + np.linalg.norm(bn)
    )
    assert r < tol, f"solve inaccurate: backward error {r}"
    return r


def bench_config(cfg_id: int) -> dict:
    import jax
    import jax.numpy as jnp

    from tpu_sparse_lu.models import (
        block_banded,
        laplacian_1d,
        poisson_2d,
        random_sparse,
    )

    rng = np.random.default_rng(0)

    if cfg_id == 1:
        # 1D Laplacian tridiagonal, single RHS. Natural ordering keeps the
        # factors bidiagonal, so the solver dispatches to the log-depth
        # associative-scan substitution (ops/scan_solve.py) — a chain has
        # no level width for the tile engines, but composes into O(log n)
        # parallel depth as affine maps.
        A = laplacian_1d(20000)
        F = _make_F(A, 128, ordering="natural", pivot_threshold=0.0)
        assert F._scan_bands is not None and F._scan_perm_id
        b = jnp.asarray(rng.random((A.shape[0], 1)), dtype=jnp.float32)
        resid = _check_residual(F, A, b)
        t = _chain_time(_ldiv_fn(F), b)
        nnz = F.L.nnz + F.U.nnz
        t_base = _scipy_panel_time(A, 1)
        return dict(config="laplace1d_single_rhs", n=A.shape[0], nnz_lu=nnz,
                    t_ours=t, t_scipy=t_base, resid=resid,
                    nnz_per_s=_per(nnz, t), vs_baseline=_per(t_base, t))

    if cfg_id == 2:
        # repeated same-sparsity refactorization + solve (device-side lu!
        # reuse): the fused refactor+solve step chained inside one jit —
        # the PDE-stepper inner loop
        from jax import lax

        A = block_banded(rng, 120, 30)
        # colamd: measured faster end-to-end than nd here. Re-measured
        # 2026-08-19 with the nd value-map folded into the windowed
        # assembly: nd 3.32 ms/step vs colamd 1.87 (was 4.67 before the
        # fold) — nd's extra fill (TF 192 vs 85 merged tiles) still
        # outweighs its shallower elimination (6 levels vs 29), and the
        # fused Pallas elimination has since removed the per-level cost
        # that made depth matter
        F = _make_F(A, 128)
        step = F.make_refactor_solve_step()
        data0 = jnp.asarray(A.data, dtype=jnp.float32)
        b = jnp.asarray(rng.random((A.shape[0], 8)), dtype=jnp.float32)
        # accuracy gate on the step itself: refactorize with perturbed
        # values and check the solve against scipy on that exact matrix
        A_chk = A.copy()
        A_chk.data = A_chk.data * 1.01
        x_chk = np.asarray(step(jnp.asarray(A_chk.data, jnp.float32), b))
        bn = np.asarray(b)
        r = np.linalg.norm(A_chk @ x_chk - bn) / (
            spla.norm(A_chk) * np.linalg.norm(x_chk) + np.linalg.norm(bn)
        )
        assert r < 1e-3, f"fused step inaccurate: backward error {r}"

        def make_chain(N):
            @jax.jit
            def chain(b, data0):
                # feed the solution back as the next RHS (renormalized so
                # deep chains stay finite), and perturb the matrix values
                # by the carry so the refactorization is loop-variant —
                # XLA's while-loop LICM would otherwise hoist a
                # loop-invariant refactorization out of the body and time
                # only the solves
                def body(i, v):
                    w = step(data0 * (1 + 1e-6 * v[0, 0]), v)
                    return w / (jnp.max(jnp.abs(w)) + 1e-30)
                return lax.fori_loop(0, N, body, b)
            return (lambda x0: chain(x0, data0)), b

        # scipy baseline: full splu factorization (it has no numeric-only
        # path); sampled before AND after our timing, min kept, so
        # transient host load cannot inflate the ratio
        Acsc = A.tocsc()

        def splu_time(M, **kw):
            ts_b = []
            for _ in range(5):
                t0 = time.perf_counter()
                spla.splu(M, **kw)
                ts_b.append(time.perf_counter() - t0)
            return float(np.min(ts_b))

        # tighter numeric-only bound (VERDICT r3 #6): factor the COLAMD-
        # preordered matrix with permc_spec="NATURAL" — identical fill
        # and flops, zero ordering cost; still pays SuperLU's structural
        # symbolic phase (etree, supernode detection), so it remains an
        # UPPER bound on a true numeric-only lu! (UMFPACK src:247).
        # scikit-umfpack (a real lu!) is not installed in this image
        # (import checked 2026-08-19), so this is the tightest measurable
        # comparator available.
        Aq = Acsc[:, spla.splu(Acsc).perm_c].tocsc()
        t_base_pre = splu_time(Acsc)
        t_pre_pre = splu_time(Aq, permc_spec="NATURAL")
        t = _slope_time(make_chain)
        t_base = min(t_base_pre, splu_time(Acsc))
        t_preord = min(t_pre_pre, splu_time(Aq, permc_spec="NATURAL"))
        nnz = F.L.nnz + F.U.nnz
        return dict(config="refactor_same_pattern", n=A.shape[0], nnz_lu=nnz,
                    t_ours=t, t_scipy=t_base,
                    t_scipy_preordered=t_preord, resid=float(r),
                    baseline_note=(
                        "scipy has no numeric-only refactorization; "
                        "vs_baseline compares a FULL splu, "
                        "vs_preordered_splu a splu on the pre-ordered "
                        "matrix (no ordering cost) — a measured upper "
                        "bound on what UMFPACK lu! (src:247) could do"
                    ),
                    nnz_per_s=_per(nnz, t), vs_baseline=_per(t_base, t),
                    vs_preordered_splu=_per(t_preord, t))

    if cfg_id == 3:
        # multi-RHS SpSM on a random sparse matrix. Served by the fused
        # op-stream kernel (A/B on v5e, 2026-08-19: fused 305 us vs XLA
        # scan 1732 us at R=64) — scattered COLAMD perms ride the int8
        # residue stream, runs the shift ops.
        A = random_sparse(rng, 4096, density=0.002)
        R = 64
        F = _make_F(A, 128)
        b = jnp.asarray(rng.random((A.shape[0], R)), dtype=jnp.float32)
        resid = _check_residual(F, A, b)
        t = _chain_time(_ldiv_fn(F), b)
        nnz = F.L.nnz + F.U.nnz
        t_base = _scipy_panel_time(A, R)
        return dict(config="spsm_multi_rhs", n=A.shape[0], R=R, nnz_lu=nnz,
                    t_ours=t, t_scipy=t_base, resid=resid,
                    nnz_per_s=_per(nnz * R, t), vs_baseline=_per(t_base, t))

    if cfg_id == 4:
        # 2D Poisson 5-point, level-scheduled solve (HEADLINE).
        # Chunk-aligned nested dissection turns the chunk DAG from a
        # 69-level chain (COLAMD) into ~9 wide levels; the fused op-stream
        # Pallas kernel runs the whole perm→L→U→perm as one program.
        from tpu_sparse_lu.ops.pallas_ldiv import supports_fused_ldiv

        A = poisson_2d(100, 100)
        R = 16
        # schedule left at "auto": on TPU the XLA engine always scans
        # (solve._prefers_unrolled) and the fused Pallas kernel ignores it.
        # nd_cutoff=512 (4-chunk subdomains): the fused solve is stream-
        # byte-bound, so FEWER/denser tiles beat less fill — swept slot
        # model on this matrix (f32/shift slots, 88.9/20 ns):
        #   cutoff 128: 672/640 -> 73 us   256: 576/384 -> 59 us
        #   cutoff 512: 544/320 -> 55 us   768: plateau
        # at +30% factor nnz (2.6M -> 3.4M), which the byte model says is
        # the right trade
        F = _make_F(A, 128, ordering="nd", nd_cutoff=512)
        fused = F._ldiv_ops is not None and supports_fused_ldiv(
            F._ldiv_ops, R)
        log(f"config4: n={A.shape[0]} nnzLU={F.L.nnz + F.U.nnz} "
            f"levels={F.plan.lplan.num_levels}/{F.plan.uplan.num_levels} "
            f"fused_pallas={fused}")
        b = jnp.asarray(rng.random((A.shape[0], R)), dtype=jnp.float32)
        resid = _check_residual(F, A, b)
        # host-load robustness: sample the scipy baseline BEFORE and
        # AFTER our timing and keep the min — transient host load (e.g.
        # concurrent compiles) otherwise inflates the ratio
        t_base_pre = _scipy_panel_time(A, R)
        t_fused = _chain_time(_ldiv_fn(F), b)
        # kernel-vs-scan A/B (VERDICT r1 #1): measure both engines and
        # serve the faster — with the banded dissection the two are within
        # noise of each other (~1.3-1.8 ms band), so this is a measured
        # autotune, not a preference
        t_scan = None
        if fused:
            F_scan = _make_F(A, 128, ordering="nd", use_pallas="never")
            t_scan = _chain_time(_ldiv_fn(F_scan), b)
            log(f"config4 A/B: fused {t_fused*1e3:.3f} ms vs XLA scan "
                f"{t_scan*1e3:.3f} ms")
        t = t_fused if t_scan is None else min(t_fused, t_scan)
        nnz = F.L.nnz + F.U.nnz
        t_base = min(t_base_pre, _scipy_panel_time(A, R))
        out = dict(config="poisson100_ldiv_throughput", n=A.shape[0], R=R,
                   nnz_lu=nnz, t_ours=t, t_fused=t_fused, t_xla_scan=t_scan,
                   t_scipy=t_base, resid=resid, fused_pallas=fused,
                   nnz_per_s=_per(nnz * R, t),
                   vs_baseline=_per(t_base, t))
        # single-RHS (R=1) through the SAME general fused kernel — the
        # reference's primary calling pattern, a vector per timestep
        # (src:286); VERDICT r2 #4. The sublane-packed panel (Rp=8) keeps
        # the op stream identical, so this isolates the R-scaling.
        b1 = b[:, :1]
        r1 = _check_residual(F, A, b1)
        t1r = _chain_time(_ldiv_fn(F), b1)
        t1_base = _scipy_panel_time(A, 1)
        out["single_rhs"] = dict(t_ours=t1r, t_scipy=t1_base, resid=r1,
                                 nnz_per_s=_per(nnz, t1r),
                                 vs_baseline=_per(t1_base, t1r))
        log(f"config4 R=1: ours {t1r*1e3:.3f} ms, scipy "
            f"{t1_base*1e3:.3f} ms")
        # wide panel (R=64) — fused since the in/out panel aliasing
        # halved VMEM; the stream bytes amortize over 4x the RHS work
        b64 = jnp.asarray(rng.random((A.shape[0], 64)), dtype=jnp.float32)
        r64 = _check_residual(F, A, b64)
        t64 = _chain_time(_ldiv_fn(F), b64)
        t64_base = _scipy_panel_time(A, 64)
        out["wide_rhs_64"] = dict(t_ours=t64, t_scipy=t64_base, resid=r64,
                                  nnz_per_s=_per(nnz * 64, t64),
                                  vs_baseline=_per(t64_base, t64))
        log(f"config4 R=64: ours {t64*1e3:.3f} ms, scipy "
            f"{t64_base*1e3:.3f} ms")
        # bf16-stream A/B (VERDICT r3 #4): half-width L/U tile pages
        # (the solve is byte-bound), with and without one IR sweep
        from tpu_sparse_lu.ops.spmv import apply_spmv

        F_bf = _make_F(A, 128, ordering="nd", nd_cutoff=512,
                       stream_dtype="bfloat16")
        r_bf = _check_residual(F_bf, A, b, tol=1e-1)
        t_bf = _chain_time(_ldiv_fn(F_bf), b)
        exe_bf, args_bf = F_bf._ldiv_callable()
        F_bf.matvec(b)  # materialize the SpMV tiles

        def refined(v, spmv, *a):
            x = exe_bf(*a, v)
            return x + exe_bf(*a, v - apply_spmv(spmv, x))

        x_ir = np.asarray(refined(b, F_bf._spmv, *args_bf))
        bn4 = np.asarray(b)
        r_bf_ir = float(np.linalg.norm(A @ x_ir - bn4) / (
            spla.norm(A) * np.linalg.norm(x_ir) + np.linalg.norm(bn4)))
        t_bf_ir = _chain_time(
            ((lambda v, spmv, *a: refined(v, spmv, *a)),
             (F_bf._spmv,) + args_bf), b)
        out["bf16_stream"] = dict(
            t_ours=t_bf, resid=r_bf,
            with_one_ir=dict(t_ours=t_bf_ir, resid=r_bf_ir),
            note=("kind-1 (L/U tile) pages at 2 bytes/word; int8 perm "
                  "and shift pages unchanged. with_one_ir pairs bf16 "
                  "with an f32-RESIDUAL sweep, which cannot beat the "
                  "bf16 tile noise floor (the r4 'IR made it worse' "
                  "line) — the accuracy pairing is f64_tier.bf16_mixed "
                  "(f64 DIA residual), itself a recorded dead-end for "
                  "the 1e-12 bar; bf16's niche is this fast low-"
                  "accuracy tier"))
        log(f"config4 bf16: {t_bf*1e3:.3f} ms resid {r_bf:.1e}; "
            f"+1 IR {t_bf_ir*1e3:.3f} ms resid {r_bf_ir:.1e}")
        # per-phase breakdown + MFU (VERDICT r1 #9)
        out["phases"] = _phase_breakdown(F, b, t)
        log(f"config4: ours {t*1e3:.3f} ms, scipy {t_base*1e3:.3f} ms, "
            f"resid {resid:.2e}")
        return out

    if cfg_id == 5:
        # block-banded matrix, row-partitioned across N>=2 devices.
        # Sized like a real PDE step (VERDICT r3 #2c): n >= 1e5 rows,
        # nnzLU ~ 20M — fill/drain no longer dominates the proxy by
        # construction the way the old n=5120 toy did.
        from tpu_sparse_lu.parallel.mesh import make_mesh
        from tpu_sparse_lu.parallel.sharded_solve import make_sharded_ldiv

        ndev = len(jax.devices())
        A = block_banded(rng, 1600, 64)
        R = 16
        F = _make_F(A, 128)
        b = jnp.asarray(rng.random((A.shape[0], R)), dtype=jnp.float32)
        out = dict(config="block_banded_sharded", n=A.shape[0], R=R,
                   n_devices=ndev, nnz_lu=F.L.nnz + F.U.nnz)
        resid = _check_residual(F, A, b)
        out["resid"] = resid
        t1 = _chain_time_robust(_ldiv_fn(F), b)
        out["t_single"] = t1
        t_base = _scipy_panel_time(A, R, reps=5)
        out["t_scipy"] = t_base
        out["nnz_per_s"] = _per((F.L.nnz + F.U.nnz) * R, t1)
        out["vs_baseline"] = _per(t_base, t1)
        # single-RHS single-chip time (the reference's primary calling
        # pattern, src:286) — input to the R=1 multi-chip projections
        b1 = b[:, :1]
        t1_r1 = _chain_time_robust(_ldiv_fn(F), b1)
        out["t_single_r1"] = t1_r1
        # checkable virtual-mesh scaling proxy (VERDICT r2 #6): exact
        # collective/halo/round counts from the static pipeline plans,
        # plus a projected efficiency model a reviewer can audit
        out["scaling_proxy"] = _pipeline_scaling_proxy(F, R, t1)
        # wide panel (R=64): M can reach 64, holding >=0.7 projected
        # efficiency out to D~8 where R=16 (M capped by divisibility)
        # falls below the bar at D>=4
        b64 = jnp.asarray(rng.random((A.shape[0], 64)), dtype=jnp.float32)
        t64 = _chain_time_robust(_ldiv_fn(F), b64)
        out["t_single_r64"] = t64
        out["scaling_proxy_r64"] = _pipeline_scaling_proxy(F, 64, t64)
        # psum-engine projection at R=1 on the SAME banded plan: the
        # chunk DAG is a chain (level width 1), so this documents the
        # single-RHS dead-end quantitatively (VERDICT r4 #2c)
        out["psum_proxy_r1_colamd"] = _psum_scaling_proxy(F, 1, t1_r1)
        out["chunk_wave_note"] = (
            "Chunk-wave pipelining within ONE RHS on the banded chain is "
            "a modelled dead-end: under COLAMD the factor's chunk DAG is "
            "a path (chunk k's rhs needs chunk k-1's gemm update, "
            "reference src:355-364), so device d+1's FIRST chunk depends "
            "on device d's LAST chunk — the critical path stays 2K chunk "
            "steps regardless of D and efficiency is bounded by 1/D + "
            "comm. The implemented escape is reordering, not waving: "
            "ordering='nd' gives the level schedule D-wide levels (see "
            "psum_proxy_r1_nd), which is where single-RHS multi-chip "
            "solves ride."
        )
        # nd ordering: level width from dissection — the implemented
        # single-RHS multi-chip story (VERDICT r4 #2b)
        F_nd = _make_F(A, 128, ordering="nd")
        r_nd = _check_residual(F_nd, A, b1, tol=1e-2)
        t1_nd_r1 = _chain_time_robust(_ldiv_fn(F_nd), b1)
        out["nd_single_chip"] = dict(
            t_r1=t1_nd_r1, resid=r_nd,
            levels=(F_nd.plan.lplan.num_levels, F_nd.plan.uplan.num_levels),
        )
        out["psum_proxy_r1_nd"] = _psum_scaling_proxy(F_nd, 1, t1_nd_r1)
        out["psum_proxy_r16_nd"] = _psum_scaling_proxy(
            F_nd, R, _chain_time_robust(_ldiv_fn(F_nd), b))
        if ndev >= 2:
            from tpu_sparse_lu.parallel.pipeline_solve import make_pipeline_ldiv

            solve = make_pipeline_ldiv(F, make_mesh(ndev)) or make_sharded_ldiv(
                F, make_mesh(ndev)
            )
            np.asarray(solve(b))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(solve(b))
                ts.append(time.perf_counter() - t0)
            tN = float(np.min(ts))
            out["t_sharded"] = tN
            out["scaling_efficiency"] = t1 / (tN * ndev)
        else:
            out["note"] = "single device: sharded path covered by tests on a virtual mesh"
        return out

    raise ValueError(cfg_id)


def _pipeline_scaling_proxy(F, R, t1):
    """Static multi-chip cost model for the overlapped halo pipeline
    (parallel/pipeline_solve.py) at D = 2..8, from the REAL per-device
    schedules — the honest stand-in while only one physical chip exists.
    Target: >= 70% scaling efficiency at N >= 2 (BASELINE.md; the
    reference's latent MPI design, src:31).

    Checkable quantities (no timing involved): pipeline rounds
    ``M + 2D - 1`` vs the non-overlapped ``2(M + D - 1)``, ppermute count
    (2 per round: L forward + U backward), and halo bytes per round
    ``(HL + HU) * cs * (R/M) * 4``. ``M`` is the autotuned micro-panel
    count (parallel/pipeline_solve.autotune_micro_panels, VERDICT r3
    #2b). The efficiency projection divides per-device compute (measured
    single-chip solve time scaled by the device's share of chunks,
    Kl/K) across rounds and charges each round one ICI hop.

    Also reports the level-striped psum engine's COMPACT per-level
    collective bytes (sharded_solve.ShardedTriPlan, VERDICT r3 #2a) —
    the engine single-RHS solves scale through.
    """
    from tpu_sparse_lu.parallel.pipeline_solve import (
        autotune_micro_panels,
        build_pipeline_plan,
    )
    from tpu_sparse_lu.parallel.sharded_solve import build_sharded_tri_plan

    cs = F.plan.cs
    K = F.plan.lplan.K
    # ICI constants: public "How to Scale Your Model" roofline numbers
    # (jax-ml.github.io/scaling-book, TPU v5e): one-way ICI bandwidth
    # 4.5e10 B/s per link, ~1 us per-hop latency rule of thumb. Not
    # locally measurable — this host tunnels to a single chip, so no
    # second ICI endpoint exists to microbenchmark against.
    ICI_LAT = 1e-6       # per-ppermute hop latency (s)
    ICI_BW = 45e9        # per-link one-way bandwidth (B/s)
    rows = []
    for D in range(2, 9):
        lp = build_pipeline_plan(F.plan.lplan, D)
        up = build_pipeline_plan(F.plan.uplan, D)
        if lp is None or up is None:
            rows.append(dict(D=D, note="pattern crosses >1 boundary"))
            continue
        M = autotune_micro_panels(R, D)
        rounds = M + 2 * D - 1
        seq_rounds = 2 * (M + D - 1)
        halo_bytes = (lp.H + up.H) * cs * (R // M) * 4
        # per-round compute: one L sweep + one U sweep over Kl chunks =
        # the single-device solve time scaled to the device's chunk share
        # and split over M panels
        t_round = (t1 * (lp.Kl / K)) / M if np.isfinite(t1) else None
        t_comm = ICI_LAT + halo_bytes / ICI_BW
        tD = rounds * (t_round + t_comm) if t_round else None
        # psum engine: compact exchange payload per solve (all levels)
        lsp = build_sharded_tri_plan(F.plan.lplan, D)
        usp = build_sharded_tri_plan(F.plan.uplan, D)
        psum_bytes = (lsp.psum_bytes_per_solve(cs, R)
                      + usp.psum_bytes_per_solve(cs, R))
        full_bytes = ((lsp.level_touched.shape[0]
                       + usp.level_touched.shape[0])
                      * (K + 1) * cs * R * 4)
        rows.append(dict(
            D=D, Kl=lp.Kl, halo_depth_L=lp.H, halo_depth_U=up.H,
            micro_panels=M,
            rounds=rounds, seq_rounds_no_overlap=seq_rounds,
            ppermutes=2 * rounds, halo_bytes_per_round=halo_bytes,
            pipeline_eff=M / rounds,
            projected_t=tD,
            projected_efficiency=(t1 / (tD * D)) if tD else None,
            psum_engine_collective_bytes_per_solve=psum_bytes,
            psum_engine_fullcarrier_bytes_per_solve=full_bytes,
        ))
    return dict(ici_latency_s=ICI_LAT, ici_bw_Bps=ICI_BW,
                efficiency_target="BASELINE.md >=70% at N>=2",
                per_D=rows)


def _scale_probe() -> dict:
    """Wide RHS panels at n=90k through the R-strip fused path
    (VERDICT r4 #4): measure what the paging actually costs at the scale
    it was built for, plus the stream-bytes multiplier paid per strip.

    The op stream at this scale holds ~0.4 GB of tile pages; the panel
    VMEM ceiling (ops/pallas_ldiv.max_fused_rhs) caps the per-invocation
    RHS width, and wider panels re-stream ALL tile pages once per strip
    — S strips pay ~S x the dominant HBM bytes. The alternative (XLA
    level-scan engine) measured ~10x slower at n=10k; this probe records
    the strip path's real numbers at n=90k.
    """
    import jax.numpy as jnp

    from tpu_sparse_lu.models import poisson_2d
    from tpu_sparse_lu.ops.pallas_ldiv import (
        PAGE, max_fused_rhs, supports_fused_ldiv,
    )

    rng = np.random.default_rng(0)
    A = poisson_2d(300, 300)
    F = _make_F(A, 128, ordering="nd", nd_cutoff=512)
    ops = F._ldiv_ops
    nnz = F.L.nnz + F.U.nnz
    out = dict(n=A.shape[0], nnz_lu=nnz,
               fused=ops is not None,
               levels=(F.plan.lplan.num_levels, F.plan.uplan.num_levels))
    if ops is None:
        out["note"] = "fused op stream unavailable at this scale"
        return out
    Rmax = max_fused_rhs(ops)
    out["max_fused_rhs"] = Rmax
    pk = np.asarray(ops.page_kind)
    f32_pages = int((pk == 1).sum())
    stream_bytes_1 = f32_pages * PAGE * ops.cs * ops.cs * 4
    out["stream_bytes_per_strip"] = stream_bytes_1
    for R in (8, 16, 64):
        b = jnp.asarray(rng.random((A.shape[0], R)), dtype=jnp.float32)
        strips = 1 if supports_fused_ldiv(ops, R) else -(-R // Rmax)
        resid = _check_residual(F, A, b)
        t = _chain_time_robust(_ldiv_fn(F), b)
        t_base = _scipy_panel_time(A, R, reps=5)
        out[f"R{R}"] = dict(
            t_ours=t, t_scipy=t_base, resid=resid, strips=strips,
            stream_bytes_paid=strips * stream_bytes_1,
            nnz_per_s=_per(nnz * R, t), vs_baseline=_per(t_base, t),
            hbm_eff=(strips * stream_bytes_1 / t / 819e9)
            if (t and np.isfinite(t)) else None,
        )
        log(f"scale n=90k R={R}: ours "
            f"{(t * 1e3 if t and np.isfinite(t) else float('nan')):.3f} ms "
            f"({strips} strips), scipy {t_base*1e3:.1f} ms")
    return out


def _psum_scaling_proxy(F, R, t1) -> dict:
    """Efficiency projection for the level-striped psum engine
    (parallel/sharded_solve.py) at D = 2..8 — the quantified multi-chip
    story for the single-RHS calling pattern (VERDICT r4 #2b; reference
    src:286), where the halo pipeline has no RHS axis to micro-panel.

    Model, fully checkable from the static plans:
    * compute: each level's chunk solves + tile applies stripe
      round-robin over D devices; per-level parallel work is
      ``ceil(ops_l / D)`` of the level's ``ops_l``, and the single-chip
      measured time t1 is attributed to levels proportionally to ops —
      tD_comp = t1 * sum_l ceil(ops_l/D) / sum_l ops_l.
    * communication: one psum of the COMPACT ``(MW+1, cs, R)`` f32
      buffer per level (what sharded_solve actually sends) — ring
      all-reduce cost 2*(D-1)/D * bytes / ICI_BW + 2*(D-1) hops of
      ICI_LAT, per level, both sweeps.
    The scaling-efficiency bar is BASELINE.md >= 70% at N >= 2.
    """
    from tpu_sparse_lu.parallel.sharded_solve import build_sharded_tri_plan

    ICI_LAT = 1e-6
    ICI_BW = 45e9
    cs = F.plan.cs
    rows = []
    plans = (F.plan.lplan, F.plan.uplan)
    tot_ops = sum(
        int(p.level_chunk_counts.sum() + p.level_tile_counts.sum())
        for p in plans
    )
    NL_tot = sum(p.num_levels for p in plans)
    for D in range(2, 9):
        par_ops = 0
        comm = 0.0
        bytes_total = 0
        n_segments = 0
        for plan_ in plans:
            sp_ = build_sharded_tri_plan(plan_, D)
            n_segments += len(sp_.segments)
            # comm follows the SEGMENTED buffers the engine actually
            # psums: narrow levels pay narrow payloads
            for seg in sp_.segments:
                lvl_bytes = (seg.MW + 1) * cs * R * 4
                NLs = seg.level_touched.shape[0]
                comm += NLs * (2 * (D - 1) * ICI_LAT
                               + 2 * (D - 1) / D * lvl_bytes / ICI_BW)
                bytes_total += NLs * lvl_bytes
            for l in range(plan_.num_levels):
                ops_l = int(plan_.level_chunk_counts[l]
                            + plan_.level_tile_counts[l])
                par_ops += -(-ops_l // D)
        t_comp = (t1 * par_ops / tot_ops) if (t1 and np.isfinite(t1)) else None
        tD = (t_comp + comm) if t_comp else None
        rows.append(dict(
            D=D,
            parallel_op_fraction=par_ops / tot_ops,
            levels=NL_tot,
            width_segments=n_segments,
            collective_bytes_per_solve=bytes_total,
            projected_t=tD,
            projected_efficiency=(t1 / (tD * D)) if tD else None,
        ))
    return dict(R=R, t_single=t1, ici_latency_s=ICI_LAT, ici_bw_Bps=ICI_BW,
                efficiency_target="BASELINE.md >=70% at N>=2",
                per_D=rows)


def _persist_probe() -> dict:
    """save()/from_saved() costs at scale (VERDICT r3 #5, r4 #8; ADVICE
    r4 #2: persistence numbers belong in the committed artifact, not
    roadmap prose). Runs on the CPU backend in its own subprocess — the
    round-4 methodology: host-path costs with no tunnel-upload
    distortion, comparable to the r4 prose numbers (31.5 s construct /
    15.2 s reload at n=90k with f64 values).

    Two points:

    * n=90k nd Poisson, FULL save: the nd closure at this n exceeds the
      device-refactor HBM budget (~42 GB estimated store), so factor
      values MUST persist; the r5 lever is storing them at the solver
      dtype (f32 halves the round-4 file and its reload bytes).
    * n=40k nd Poisson, LIGHT save (values-less, VERDICT r4 #8): the
      solver is constructed with factorize="device" (no SuperLU at all
      — the r5 device-first construct, replacing the reference's
      construct-time UMFPACK call, src:74), save() persists pattern +
      plans + the refactor schedule only, and from_saved recomputes the
      factor values from A's nonzeros via the device elimination.
      ``from_saved_warm`` excludes the one-time XLA compile (persistent
      cache in deployment); ``from_saved_cold`` includes it.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpu_sparse_lu import ParallelSparseLU, SolverConfig
    from tpu_sparse_lu.models import poisson_2d

    path = "/tmp/tpu_sparse_lu_persist.npz"
    rng = np.random.default_rng(0)

    def sync(F):
        # CPU backend: block_until_ready is truthful here (unlike the
        # axon tunnel) — without it the cold load's async device work
        # (pack, tile inverses, the light path's elimination) drains
        # during the NEXT timed section
        jax.block_until_ready(
            [x for x in jax.tree.leaves((F.ldata, F.udata))
             if hasattr(x, "block_until_ready")])
        return F

    def roundtrip(A, cfg, extra=()):
        t0 = time.perf_counter()
        F = sync(ParallelSparseLU(A, config=cfg))
        t_construct = time.perf_counter() - t0
        t0 = time.perf_counter()
        F.save(path)
        t_save = time.perf_counter() - t0
        size = os.path.getsize(path)
        light = bool("light" in np.load(path).files)
        t0 = time.perf_counter()
        G = sync(ParallelSparseLU.from_saved(A, path))
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        G = sync(ParallelSparseLU.from_saved(A, path))
        t_warm = time.perf_counter() - t0
        b = rng.random(A.shape[0])
        resid = _check_residual(G, A, b)
        r = dict(n=A.shape[0], nnz_lu=int(G.L.nnz + G.U.nnz),
                 light_save=light, construct=t_construct, save=t_save,
                 file_bytes=size, from_saved_cold=t_cold,
                 from_saved_warm=t_warm, resid=resid)
        r.update(extra)
        return r

    out = {}
    cfg90 = SolverConfig(chunk_size=128, tri_mode="inv", dtype="float32",
                         ordering="nd", nd_cutoff=512)
    out["n90k_full"] = roundtrip(poisson_2d(300, 300), cfg90, extra=(
        ("note", "values at solver dtype (f32) — the nd closure at this "
                 "n exceeds the device-refactor budget, so the light "
                 "save is ineligible and values must persist"),))
    cfg40 = SolverConfig(chunk_size=128, tri_mode="inv", dtype="float32",
                         ordering="nd", nd_cutoff=512, factorize="device")
    out["n40k_light"] = roundtrip(poisson_2d(200, 200), cfg40, extra=(
        ("note", "values-less save: construct never runs SuperLU "
                 "(factorize='device') and the load recomputes factor "
                 "values via the device elimination"),))
    if os.path.exists(path):
        os.remove(path)
    return out


def _f64_probe() -> dict:
    """f64 accuracy/perf tier on the device (VERDICT r2 #7, r3 #1)
    against the reference's full-f64 UMFPACK bar (runtests.jl:25-26).

    Runs in THIS process, which must have been started with
    ``--f64-probe`` (x64 is process-global and cannot be toggled around
    cached f32 executables) — see main().

    Two tiers measured:

    * ``mixed`` (headline, VERDICT r3 #1): f32 fused Pallas solve +
      float64 DIA-residual iterative refinement
      (``ParallelSparseLU.make_f64_ldiv``) — every hot op stays on the
      MXU; only the O(nd * n) residual runs under XLA's f64 emulation.
    * ``native``: dtype='float64', tri_mode='inv' — every matmul f64-
      emulated (the MXU has no f64). Meets the bar but loses to the CPU
      baseline; kept for reference. tri_mode='trsm' in f64 crashes this
      TPU runtime (XLA triangular_solve kernel fault, axon v5e,
      2026-08-19), so 'inv'/'inv_refine' are the supported native tiers.
    """
    import jax
    import jax.numpy as jnp

    from tpu_sparse_lu import ParallelSparseLU, SolverConfig
    from tpu_sparse_lu.models import poisson_2d

    assert jax.config.jax_enable_x64
    rng = np.random.default_rng(0)
    A = poisson_2d(100, 100)
    R = 16
    bn = rng.random((A.shape[0], R))
    xs = spla.spsolve(A.tocsc(), bn)
    t_base = _scipy_panel_time(A, R)
    nrmA = spla.norm(A)

    def errs(x):
        resid = float(np.linalg.norm(A @ x - bn) / (
            nrmA * np.linalg.norm(x) + np.linalg.norm(bn)))
        rel = float(np.linalg.norm(x - xs) / np.linalg.norm(xs))
        return resid, rel

    # --- mixed tier (headline) ---------------------------------------
    F32 = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=128, tri_mode="inv", dtype="float32",
        ordering="nd", nd_cutoff=512))
    b64 = jnp.asarray(bn, jnp.float64)
    mixed = {}
    for steps in (1, 2):
        solve = F32.make_f64_ldiv(refine_steps=steps)
        resid, rel = errs(np.asarray(solve(b64)))
        t = _chain_time(((lambda v: solve(v)), ()), b64)
        mixed[f"ir{steps}"] = dict(
            refine_steps=steps, t_ours=t, bwd_err=resid,
            rel_err_vs_scipy_f64=rel, meets_1e12_bar=rel < 1e-12,
            vs_baseline=_per(t_base, t))
    # headline: fewest sweeps that meet the bar
    head = next((m for m in mixed.values() if m["meets_1e12_bar"]),
                mixed["ir2"])

    # --- bf16 stream + f64 residual IR (the production pairing,
    # VERDICT r4 #5): the committed r4 bf16+f32-IR line got WORSE — the
    # correct pairing refines the half-width stream against the FLOAT64
    # residual, which both restores the digits bf16 drops and keeps the
    # byte win on every direct sub-solve ------------------------------
    F_bf = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=128, tri_mode="inv", dtype="float32",
        ordering="nd", nd_cutoff=512, stream_dtype="bfloat16"))
    bf16 = {}
    for steps in (2, 3, 4):
        solve_bf = F_bf.make_f64_ldiv(refine_steps=steps)
        resid, rel = errs(np.asarray(solve_bf(b64)))
        t = _chain_time(((lambda v, s=solve_bf: s(v)), ()), b64)
        bf16[f"ir{steps}"] = dict(
            refine_steps=steps, t_ours=t, bwd_err=resid,
            rel_err_vs_scipy_f64=rel, meets_1e12_bar=rel < 1e-12,
            vs_baseline=_per(t_base, t))
        if rel < 1e-12:
            break
    bf_head = next((m for m in bf16.values() if m["meets_1e12_bar"]), None)
    f32_head = head

    # --- native f64 tier ----------------------------------------------
    F = ParallelSparseLU(A, config=SolverConfig(
        chunk_size=128, tri_mode="inv", dtype="float64", ordering="nd"))
    b = jnp.asarray(bn, jnp.float64)
    resid, rel = errs(np.asarray(F.ldiv(b)))
    exe, fargs = F._ldiv_callable()
    t = _chain_time(((lambda v, *a: exe(*a, v)), fargs), b)
    native = dict(tri_mode="inv", t_ours=t, bwd_err=resid,
                  rel_err_vs_scipy_f64=rel,
                  meets_1e12_bar=rel < 1e-12 or resid < 1e-12,
                  vs_baseline=_per(t_base, t))

    return dict(n=A.shape[0], R=R, t_scipy=t_base,
                tier="mixed (f32 fused solve + f64 DIA-residual IR)",
                t_ours=head["t_ours"], bwd_err=head["bwd_err"],
                rel_err_vs_scipy_f64=head["rel_err_vs_scipy_f64"],
                refine_steps=head["refine_steps"],
                meets_1e12_bar=head["meets_1e12_bar"],
                vs_baseline=head["vs_baseline"],
                mixed=mixed, native=native,
                bf16_mixed=dict(
                    tiers=bf16,
                    beats_f32_tier=(
                        bf_head is not None
                        and bf_head["t_ours"] < f32_head["t_ours"]
                    ),
                    note=("bf16 L/U stream + make_f64_ldiv (f64 DIA "
                          "residual) — the production pairing; the r4 "
                          "bf16+f32-IR line is superseded")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--f64-probe", action="store_true")
    ap.add_argument("--scale", action="store_true")
    ap.add_argument("--persist", action="store_true")
    args = ap.parse_args()

    if args.persist:
        # own process: forces the CPU backend (see _persist_probe)
        print(json.dumps(_persist_probe()))
        return

    import jax

    if args.f64_probe:
        # own process: x64 must be set before any trace exists
        jax.config.update("jax_enable_x64", True)

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_sparse_lu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    if args.f64_probe:
        print(json.dumps(_f64_probe()))
        return

    if args.scale:
        print(json.dumps(_scale_probe()))
        return

    if args.all:
        detail = {}
        for c in (1, 2, 3, 4, 5):
            try:
                detail[c] = bench_config(c)
                log(f"config {c}: {detail[c]}")
            except Exception as e:  # keep the suite going
                detail[c] = {"error": str(e)}
                log(f"config {c} FAILED: {e}")
        try:
            detail["scale_90k"] = _scale_probe()
            log(f"scale_90k: {detail['scale_90k']}")
        except Exception as e:
            detail["scale_90k"] = {"error": str(e)}
            log(f"scale_90k FAILED: {e}")
        # f64 tier in a SUBPROCESS: jax_enable_x64 is process-global and
        # cannot be flipped under this process's cached f32 executables
        import subprocess
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--f64-probe"],
                capture_output=True, text=True, timeout=1200, check=True,
            )
            detail["f64_tier"] = json.loads(out.stdout.strip().splitlines()[-1])
            log(f"f64 tier: {detail['f64_tier']}")
        except Exception as e:
            detail["f64_tier"] = {"error": str(e)}
            log(f"f64 probe FAILED: {e}")
        # persistence probe in a SUBPROCESS: it forces the CPU backend
        # (host-path timing methodology; no tunnel-upload distortion)
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--persist"],
                capture_output=True, text=True, timeout=3600, check=True,
            )
            detail["persistence"] = json.loads(
                out.stdout.strip().splitlines()[-1])
            log(f"persistence: {detail['persistence']}")
        except Exception as e:
            detail["persistence"] = {"error": str(e)}
            log(f"persistence probe FAILED: {e}")
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=2)
        r = detail.get(4, {})
    elif args.config:
        r = bench_config(args.config)
        log(json.dumps(r, indent=2))
    else:
        r = bench_config(4)

    print(json.dumps({
        "metric": r.get("config", "poisson100_ldiv_throughput"),
        "value": r.get("nnz_per_s", 0.0),
        "unit": "nnz/s",
        "vs_baseline": r.get("vs_baseline", 0.0),
    }))


if __name__ == "__main__":
    main()
