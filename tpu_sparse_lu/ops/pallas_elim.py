"""Fused Pallas blocked-elimination kernel (device refactorization).

TPU-native replacement for the numeric phase of the reference's
``lu!(F, A)`` (UMFPACK numeric-only refactorization,
/root/reference/src/SharedMemSparseLU.jl:245-279, :247): same-pattern
values re-factored entirely on device under frozen pivots.

The XLA level-scan elimination (refactor._blocked_elimination) runs each
level as ~30 separate device ops (gather, Pallas LU, two triangular
inverses via blocked recursion, panel dots, Schur update, scatters); on a
29-level banded chain that is ~40 us of op overhead per level — 1.16 ms
of the 1.87 ms fused refactor+solve step (BASELINE config 2), while the
actual numeric work is tens of microseconds.

This kernel runs the ENTIRE elimination as ONE Pallas program:

* grid = (NL,) — one sequential grid step per dependency level (TPU grid
  steps share VMEM scratch, so the merged tile store is DMA'd HBM→VMEM
  once at level 0 and back once at the last level; between levels it
  never leaves VMEM);
* per level, python-unrolled over the (static, padded) schedule: dense
  no-pivot LU of each diagonal tile (the masked-reduction serial loop of
  ops/pallas_factor.py), then BOTH triangular inverses by log-depth
  Neumann squaring — for nilpotent strict-triangular N, (I − N)⁻¹ =
  (I+N)(I+N²)(I+N⁴)… — 12 static (cs,cs) MXU matmuls per inverse with
  no sub-lane slicing (the blocked-recursion inverse relayouts that made
  in-kernel panel LU slow, see roadmap, never appear);
* panel and Schur updates are dynamic-indexed VMEM reads/writes over the
  store, exactly mirroring the XLA path's dataflow (including its padded
  dummy-tile semantics), so the extraction maps are drop-in compatible.

Gated by :func:`supports_fused_elim` — the store and the per-level
inverse stacks must fit VMEM and the level width must be small (wide
levels unroll too much; they are the XLA path's good case anyway, since
batching amortizes its per-op overhead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["supports_fused_elim", "fused_elimination"]

_VMEM_BUDGET = 12 * 1024 * 1024
_SMEM_BUDGET = 256 * 1024
_BL_MAX = 4  # wider levels: the batched XLA path amortizes better


def supports_fused_elim(cs: int, TF: int, NL: int, BL: int,
                        MR: int, MU: int, MS: int,
                        *, interpret: bool = False) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    if not interpret and cs % 128 != 0:
        return False
    if BL > _BL_MAX:
        return False
    vmem = (TF + 2 + 2 * NL * BL) * cs * cs * 4 + cs * 4
    if vmem >= _VMEM_BUDGET:
        return False
    smem = 4 * NL * (2 * BL + 1 + 2 * MR + 2 * MU + 3 * MS)
    return smem < _SMEM_BUDGET


def _lu_nopivot_2d(T):
    """Dense no-pivot LU of one (cs, cs) tile in registers — merged L\\U.

    The loop is THROUGHPUT-bound on full-(cs,cs) vector passes (~14 ns
    each, ~13 per step at cs=128), so scalars (the pivot) are extracted
    from the (1,cs) urow — single-vreg ops, never full-tile reductions
    (measured 0.86 -> 0.73 ms on the config-2 elimination). Measured
    dead ends on v5e, do not retry: full fori unroll (icache, 0.93 ms),
    roll-based row extraction (0.99 ms), rank-2 steps with a combined
    K=2 MXU update (1.03 ms — small-K matmuls and lane concats cost more
    than the saved passes).
    """
    cs = T.shape[-1]
    ridx = lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    cidx = lax.broadcasted_iota(jnp.int32, (cs, cs), 1)

    def step(i, D):
        urow = jnp.sum(jnp.where(ridx == i, D, 0.0), axis=-2, keepdims=True)
        col = jnp.sum(jnp.where(cidx == i, D, 0.0), axis=-1, keepdims=True)
        piv = jnp.sum(
            jnp.where(cidx[:1, :] == i, urow, 0.0), axis=-1, keepdims=True
        )
        low = jnp.where(ridx[:, :1] > i, col / piv, 0.0)
        urow_m = jnp.where(cidx[:1, :] > i, urow, 0.0)
        D = D - low * urow_m
        return jnp.where((cidx == i) & (ridx > i), low, D)

    return lax.fori_loop(0, cs, step, T)


def _dot(a, b):
    return lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _neumann_inv(M):
    """(I - M)⁻¹ for nilpotent strictly-triangular M (M^cs = 0):
    (I+M)(I+M²)(I+M⁴)…(I+M^(cs/2)) = Σ_{k<cs} M^k — log2(cs) squarings
    + products, all full-tile MXU matmuls."""
    cs = M.shape[-1]
    eye = jnp.eye(cs, dtype=M.dtype)
    P = eye + M
    Q = M
    steps = max(int(np.ceil(np.log2(cs))) - 1, 0)
    for _ in range(steps):
        Q = _dot(Q, Q)
        P = P + _dot(P, Q)
    return P


def _kernel(
    diag_ids_ref, diag_cnt_ref,          # (NL, BL), (NL,)
    row_ids_ref, row_owner_ref,          # (NL, MR)
    col_ids_ref, col_owner_ref,          # (NL, MU)
    schur_ref,                           # (NL, MS, 3)
    tiles_hbm,                           # (TF+2, cs, cs) input store
    tiles_out, linv_out, uinv_out, minpiv_out,  # HBM outputs
    store,                               # (TF+2, cs, cs) VMEM
    invl, invu,                          # (NL*BL, cs, cs) VMEM
    minpiv,                              # (1, cs) VMEM
    sem,
    *,
    NL: int, BL: int, MR: int, MU: int, MS: int,
):
    # int32 explicitly: program_id is int64 under jax_enable_x64 and
    # Mosaic cannot lower the resulting i64 index arithmetic
    lvl = pl.program_id(0).astype(jnp.int32)
    cs = store.shape[-1]
    ridx = lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    cidx = lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    eye = (ridx == cidx).astype(store.dtype)

    @pl.when(lvl == 0)
    def _():
        cp = pltpu.make_async_copy(tiles_hbm, store, sem)
        cp.start()
        cp.wait()
        minpiv[:] = jnp.full((1, cs), jnp.inf, minpiv.dtype)

    # --- diagonal tiles: LU + both triangular inverses ----------------------
    for b in range(BL):
        d = diag_ids_ref[lvl, b]
        T = _lu_nopivot_2d(store[d])
        store[d] = T
        # diagonal of U as a (1, cs) row (masked reduce over rows)
        du = jnp.sum(jnp.where(ridx == cidx, T, 0.0), axis=-2, keepdims=True)
        real = b < diag_cnt_ref[lvl]
        minpiv[:] = jnp.minimum(
            minpiv[:], jnp.where(real, jnp.abs(du), jnp.inf)
        )
        # L = I + SL (unit diag): Linv = (I - (-SL))⁻¹
        SL = jnp.where(ridx > cidx, T, 0.0)
        invl[lvl * BL + b] = _neumann_inv(-SL)
        # U = Du (I + Du⁻¹ SU): Uinv = (I + Du⁻¹SU)⁻¹ Du⁻¹ — row-scale SU
        # by 1/du going in, column-scale the series coming out
        du_inv = 1.0 / du                       # (1, cs) — per COLUMN j
        du_inv_col = jnp.sum(
            jnp.where(ridx == cidx, du_inv * eye, 0.0), axis=-1,
            keepdims=True,
        )                                        # (cs, 1) — per ROW i
        SU = jnp.where(ridx < cidx, T, 0.0)
        invu[lvl * BL + b] = _neumann_inv(-(du_inv_col * SU)) * du_inv

    def sel_inv(buf, owner):
        # owner == BL is the identity pad slot (mirrors the XLA path)
        got = buf[lvl * BL + jnp.minimum(owner, BL - 1)]
        return jnp.where(owner >= BL, eye, got)

    # --- panels: L_ik = A_ik @ Ukk⁻¹ ; U_kj = Lkk⁻¹ @ A_kj ------------------
    for a in range(MR):
        i = row_ids_ref[lvl, a]
        store[i] = _dot(store[i], sel_inv(invu, row_owner_ref[lvl, a]))
    for a in range(MU):
        j = col_ids_ref[lvl, a]
        store[j] = _dot(sel_inv(invl, col_owner_ref[lvl, a]), store[j])

    # --- Schur: A_ij -= L_ik @ U_kj -----------------------------------------
    for s in range(MS):
        dst = schur_ref[lvl, s, 0]
        lt = schur_ref[lvl, s, 1]
        ut = schur_ref[lvl, s, 2]
        store[dst] = store[dst] - _dot(store[lt], store[ut])

    @pl.when(lvl == NL - 1)
    def _():
        for src, out in ((store, tiles_out), (invl, linv_out),
                         (invu, uinv_out), (minpiv, minpiv_out)):
            cp = pltpu.make_async_copy(src, out, sem)
            cp.start()
            cp.wait()


@functools.partial(
    jax.jit, static_argnames=("cs", "NL", "BL", "MR", "MU", "MS",
                              "interpret"),
)
def fused_elimination(tiles, diag_ids, diag_cnt, row_ids, row_owner,
                      col_ids, col_owner, schur, *,
                      cs: int, NL: int, BL: int, MR: int, MU: int, MS: int,
                      interpret: bool = False):
    """Run the whole blocked elimination in one Pallas program.

    Same contract as refactor._blocked_elimination: returns
    ``(tiles, min_piv, linv_lv, uinv_lv)`` with the per-level inverse
    stacks shaped (NL, BL, cs, cs).
    """
    TF2 = tiles.shape[0]
    dt = tiles.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(NL,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[
            pltpu.VMEM((TF2, cs, cs), dt),
            pltpu.VMEM((NL * BL, cs, cs), dt),
            pltpu.VMEM((NL * BL, cs, cs), dt),
            pltpu.VMEM((1, cs), dt),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kernel, NL=NL, BL=BL, MR=MR, MU=MU, MS=MS)
    from ..utils.x64 import x64_off_for

    with x64_off_for(dt):  # 32-bit trace for 4-byte kernels only
        tiles_out, linv, uinv, minpiv = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((TF2, cs, cs), dt),
                jax.ShapeDtypeStruct((NL * BL, cs, cs), dt),
                jax.ShapeDtypeStruct((NL * BL, cs, cs), dt),
                jax.ShapeDtypeStruct((1, cs), dt),
            ),
            input_output_aliases={7: 0},  # tile store updated in place
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(
            jnp.asarray(diag_ids), jnp.asarray(diag_cnt),
            jnp.asarray(row_ids), jnp.asarray(row_owner),
            jnp.asarray(col_ids), jnp.asarray(col_owner),
            jnp.asarray(schur),
            tiles,
        )
    return (
        tiles_out,
        jnp.min(minpiv),
        linv.reshape(NL, BL, cs, cs),
        uinv.reshape(NL, BL, cs, cs),
    )
