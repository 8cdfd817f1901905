"""Benchmark harness (SURVEY.md §6, M4).

Measures repeated-solve throughput in factor-nonzeros/second — the
BASELINE.json headline metric — on the 2D Poisson config (BASELINE
config 4) and compares against the reference-equivalent algorithm on this
host: scipy SuperLU factor + solve (the reference delegates to
UMFPACK + chunked BLAS, SURVEY.md C8/C9; scipy splu.solve is the closest
available stand-in since the reference publishes no numbers).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}

Run with no env overrides: uses the default JAX platform (TPU when
present, CPU otherwise).
"""

import json
import sys
import time

import numpy as np
import scipy.sparse.linalg as spla


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def median_time(fn, iters, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    # persistent compile cache: repeated driver runs skip recompilation
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu_sparse_lu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpu_sparse_lu import ParallelSparseLU, SolverConfig
    from tpu_sparse_lu.models import poisson_2d

    dev = jax.devices()[0]
    log(f"device: {dev.platform} ({dev.device_kind})")

    nx = ny = 100  # n = 10_000
    nrhs = 16
    A = poisson_2d(nx, ny)
    n = A.shape[0]

    cfg = SolverConfig(chunk_size=64, tri_mode="inv", dtype="float32",
                       schedule="auto")
    t0 = time.perf_counter()
    F = ParallelSparseLU(A, config=cfg)
    log(f"factor+plan: {time.perf_counter() - t0:.2f}s  "
        f"n={n} nnzLU={F.L.nnz + F.U.nnz} "
        f"levels L={F.plan.lplan.num_levels} U={F.plan.uplan.num_levels} "
        f"K={F.plan.lplan.K}")

    rng = np.random.default_rng(0)
    b = np.asarray(rng.random((n, nrhs)), dtype=np.float32)
    b_dev = jax.device_put(b)

    def ours():
        jax.block_until_ready(F.ldiv(b_dev))

    t_ours = median_time(ours, iters=20)
    # correctness guard: fp32 relative residual must be small
    x = np.asarray(F.ldiv(b_dev))
    resid = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    log(f"relative residual: {resid:.2e}")
    assert resid < 1e-4, f"solve inaccurate: {resid}"
    nnz_lu = F.L.nnz + F.U.nnz
    # metric: factor-nonzeros touched per second across the RHS panel
    value = nnz_lu * nrhs / t_ours
    log(f"ours: {t_ours*1e3:.3f} ms / {nrhs}-RHS solve -> {value:.3e} nnz/s")

    # --- reference-equivalent baseline: SuperLU factor once, solve many ----
    lu = spla.splu(A.tocsc())
    bb = np.asarray(rng.random((n, nrhs)))

    def base():
        lu.solve(bb)

    t_base = median_time(base, iters=20)
    base_value = nnz_lu * nrhs / t_base
    log(f"scipy splu baseline: {t_base*1e3:.3f} ms -> {base_value:.3e} nnz/s")

    print(json.dumps({
        "metric": "poisson100_ldiv_throughput",
        "value": value,
        "unit": "nnz/s",
        "vs_baseline": value / base_value,
    }))


if __name__ == "__main__":
    main()
