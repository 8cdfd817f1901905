"""Solver configuration.

The reference keeps configuration minimal: a single ``chunk_size`` kwarg
(default 8, clamped to n — /root/reference/src/SharedMemSparseLU.jl:64-72)
plus type parameters ``{Tf, Ti}``. We mirror that restraint with one small
frozen dataclass; there is no global flag registry.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static configuration for a :class:`ParallelSparseLU` factorization.

    Attributes:
      chunk_size: dense tile edge for the block decomposition of L and U
        (the reference's ``chunk_size``, src:64-72). ``None`` → size-based
        policy in :func:`default_chunk_size`.
      tri_mode: how per-level diagonal-tile triangular systems are solved.
        * ``"auto"``      — (default) per-backend pick at construction:
                            ``"inv"`` on TPU (the fused Pallas fast path —
                            its accuracy story is carried by the fp32+IR
                            tests and the ``make_f64_ldiv`` tier), ``"trsm"``
                            elsewhere (exact to machine precision). Mirrors
                            the reference's zero-boilerplate default
                            constructor (src:64-72).
        * ``"trsm"``      — batched ``lax.linalg.triangular_solve`` (exact;
                            matches the reference's BLAS ``trsv!``,
                            src:359/:384, to machine precision).
        * ``"inv"``       — multiply by precomputed tile inverses: the whole
                            solve becomes batched matmul (MXU-only hot path).
        * ``"inv_refine"``— ``inv`` plus one residual-correction step per
                            tile solve (backward-stable at ~2x the matmuls).
      dtype: numeric dtype for factors and solves. ``None`` → inherit from
        the input matrix (float64 when x64 is enabled, else float32).
      matmul_precision: JAX matmul precision for all tile ops. TPU MXUs
        multiply f32 inputs in bf16 by default; a level-scheduled solve
        compounds that error across hundreds of dependent levels into O(1)
        garbage (measured), so the default here is "highest" (full-f32
        passes). "default" recovers raw bf16 speed for error-tolerant uses.
      schedule: level-schedule execution style.
        * ``"scan"``    — ``lax.scan`` over levels padded to the maximum
                          level width (compact program; best for long, thin
                          dependency chains such as banded matrices).
        * ``"unrolled"``— Python-unrolled levels with exact ragged widths
                          (no padding waste; best for wide, shallow DAGs).
        * ``"auto"``    — pick per-plan by a padding-waste heuristic.
    """

    chunk_size: Optional[int] = None
    tri_mode: str = "auto"
    dtype: Optional[str] = None
    matmul_precision: str = "highest"
    schedule: str = "auto"
    use_pallas: str = "auto"  # "auto" | "always" | "never"
    # Ordering: "colamd" (SuperLU default) or "nd" — chunk-aligned staged
    # nested dissection (ordering.py): embeds A with identity padding rows
    # so every chunk holds mutually-independent subdomain rows; measured on
    # 2D Poisson n=10k/cs=128: level depth 69 -> 9 with 6% row overhead and
    # less fill than COLAMD. "nd" factors WITHOUT row pivoting by default
    # (partial pivoting would scramble the alignment) — use
    # pivot_threshold to re-enable thresholded pivoting, and refine_steps
    # on ldiv for extra safety on non-diagonally-dominant matrices.
    ordering: str = "colamd"
    pivot_threshold: Optional[float] = None
    # nd base-subdomain size (default cs): larger -> fewer, denser
    # off-diagonal tiles (fewer stream bytes — the fused solve's cost) at
    # the price of more fill; see the measured sweep in docs/roadmap.md.
    # "auto" sweeps {cs, 2cs, 4cs} and keeps the byte-model minimum (one
    # trial factorization per candidate)
    nd_cutoff: object = None  # None | int | "auto"
    # device working-set ceiling (bytes) for enable_device_refactor's HBM
    # guard; None -> the 9 GB v5e-calibrated default in api.py
    refactor_store_budget: Optional[int] = None
    # dtype of the fused-ldiv L/U tile STREAM (the dominant HBM traffic of
    # a solve — the kernel is byte-bound, see docs/roadmap.md cost model).
    # "bfloat16" halves the f32 pages (diag inverses included) at ~3
    # decimal digits of tile precision; pair with ldiv(refine_steps=1) or
    # make_f64_ldiv to restore accuracy. Panel and XLA-engine tiles stay
    # at `dtype`.
    stream_dtype: str = "float32"

    # first-factorization backend: "host" (SuperLU via scipy, re-pivots;
    # the default) or "device" — skip SuperLU numeric entirely and run the
    # blocked device elimination (_refactor_pipeline) as the FIRST
    # factorization. "device" requires a static-diagonal-pivot ordering
    # ("nd", or "natural" with pivot_threshold=0.0): the pivot order is
    # then known from the pattern alone, so construction pays only
    # pattern planning + one device program instead of a full host
    # numeric factorization (the reference's construct-time C dependency,
    # src:74). "auto" picks "device" when eligible on TPU, else "host".
    factorize: str = "host"

    def __post_init__(self):
        if self.tri_mode not in ("auto", "trsm", "inv", "inv_refine"):
            raise ValueError(f"unknown tri_mode: {self.tri_mode!r}")
        if self.schedule not in ("scan", "unrolled", "auto"):
            raise ValueError(f"unknown schedule: {self.schedule!r}")
        if self.matmul_precision not in ("default", "high", "highest"):
            raise ValueError(
                f"unknown matmul_precision: {self.matmul_precision!r}"
            )
        if self.use_pallas not in ("auto", "always", "never"):
            raise ValueError(f"unknown use_pallas: {self.use_pallas!r}")
        if self.ordering not in ("colamd", "nd", "natural", "mmd"):
            raise ValueError(f"unknown ordering: {self.ordering!r}")
        if not (self.nd_cutoff is None or self.nd_cutoff == "auto"
                or isinstance(self.nd_cutoff, int)):
            raise ValueError(f"unknown nd_cutoff: {self.nd_cutoff!r}")
        if self.stream_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown stream_dtype: {self.stream_dtype!r}")
        if self.factorize not in ("host", "device", "auto"):
            raise ValueError(f"unknown factorize: {self.factorize!r}")


def resolve_tri_mode(tri_mode: str, backend: str, dtype) -> str:
    """Resolve ``tri_mode="auto"`` per backend (VERDICT r4 #7).

    TPU → ``"inv"``: the only mode the fused Pallas ldiv serves
    (api._pallas_eligible), ~10x faster than the XLA scan engine on the
    headline config (BENCH_r04: 59 us vs 635 us); its accuracy story is
    fp32+refine_steps / make_f64_ldiv. Everywhere else → ``"trsm"``:
    exact triangular solves, which the f64 CPU test bars (1e-12) assume.
    """
    if tri_mode != "auto":
        return tri_mode
    return "inv" if backend == "tpu" else "trsm"


def default_chunk_size(n: int, backend: str = "") -> int:
    """Chunk-size policy when the user does not pass one.

    The reference defaults to 8 and clamps to n (src:67-72). On TPU the
    fused Pallas ldiv requires ``cs % 128 == 0`` (lane tiling), so the
    default there is 128 whenever the problem is big enough to fill a
    tile — the no-config constructor must land on the fast path
    (VERDICT r4 #7). Elsewhere smaller tiles scale with problem size.
    """
    if backend == "tpu":
        return max(1, min(128, n))
    if n <= 256:
        cs = 8
    elif n <= 4096:
        cs = 32
    else:
        cs = 64
    return max(1, min(cs, n))
