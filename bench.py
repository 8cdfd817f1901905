"""Benchmark harness (SURVEY.md §6, M4).

Measures repeated-solve throughput in factor-nonzeros/second — the
BASELINE.json headline metric — on the 2D Poisson config (BASELINE
config 4) and compares against the reference-equivalent algorithm on this
host: SuperLU factor + solve via scipy (the reference delegates to
UMFPACK + chunked BLAS, SURVEY.md C8/C9; no numbers are published so the
baseline is measured locally, per SURVEY.md §6).

Timing method: N solves chained INSIDE one jit (x_{i+1} = solve(x_i)) with
a single device sync — how a real PDE time-stepper embeds the solve, and
the only honest timing through an RPC-tunneled device (per-dispatch
overhead here is ~0.7 ms, several times the solve itself).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np
import scipy.sparse.linalg as spla

N_CHAIN = 32
NRHS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_sparse_lu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_sparse_lu import ParallelSparseLU, SolverConfig
    from tpu_sparse_lu.models import poisson_2d

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    nx = ny = 100  # n = 10_000
    A = poisson_2d(nx, ny)
    n = A.shape[0]

    cfg = SolverConfig(chunk_size=128, tri_mode="inv", dtype="float32")
    t0 = time.perf_counter()
    F = ParallelSparseLU(A, config=cfg)
    log(f"factor+plan: {time.perf_counter() - t0:.2f}s  "
        f"n={n} nnzLU={F.L.nnz + F.U.nnz} "
        f"levels L={F.plan.lplan.num_levels} U={F.plan.uplan.num_levels} "
        f"K={F.plan.lplan.K} pallas={F._pallas_eligible()}")

    rng = np.random.default_rng(0)
    b = jax.device_put(np.asarray(rng.random((n, NRHS)), dtype=np.float32))

    # correctness guard before timing
    x = np.asarray(F.ldiv(b))
    resid = np.linalg.norm(A @ x - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    log(f"relative residual: {resid:.2e}")
    assert resid < 1e-3, f"solve inaccurate: {resid}"

    # chained in-jit timing
    exe = F._exe("ldiv")
    args = (F.ldata, F.udata, F._p_dev, F._qinv_dev, F._rs_p_dev)

    @jax.jit
    def chain(ldata, udata, p, qinv, rs_p, b):
        def body(i, v):
            return exe(ldata, udata, p, qinv, rs_p, v)  # inlined nested jit
        return lax.fori_loop(0, N_CHAIN, body, b)

    np.asarray(chain(*args, b))  # compile + warmup
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(chain(*args, b))
        ts.append((time.perf_counter() - t0) / N_CHAIN)
    t_ours = float(np.median(ts))

    nnz_lu = F.L.nnz + F.U.nnz
    value = nnz_lu * NRHS / t_ours
    log(f"ours: {t_ours*1e3:.3f} ms / {NRHS}-RHS ldiv -> {value:.3e} nnz/s")

    # --- reference-equivalent baseline: SuperLU factor once, solve many ----
    lu = spla.splu(A.tocsc())
    bb = np.asarray(rng.random((n, NRHS)))

    def base():
        return lu.solve(bb)

    base()
    tsb = []
    for _ in range(20):
        t0 = time.perf_counter()
        base()
        tsb.append(time.perf_counter() - t0)
    t_base = float(np.median(tsb))
    base_value = nnz_lu * NRHS / t_base
    log(f"scipy splu baseline: {t_base*1e3:.3f} ms -> {base_value:.3e} nnz/s")

    print(json.dumps({
        "metric": "poisson100_ldiv_throughput",
        "value": value,
        "unit": "nnz/s",
        "vs_baseline": value / base_value,
    }))


if __name__ == "__main__":
    main()
