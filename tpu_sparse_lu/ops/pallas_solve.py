"""Fused Pallas triangular-solve kernel (SURVEY.md §7 M2).

The reference's hot loop crosses the BLAS boundary twice per chunk
(/root/reference/src/SharedMemSparseLU.jl:355-364). Here an ENTIRE
triangular solve — all levels of the chunk DAG — runs as one Pallas
program. A sparse triangular solve at these sizes is *latency*-bound (the
whole solve is ~20 MFLOP; the MXU needs microseconds), so the kernel is
organised around hiding memory latency along the level chain:

* grid = (num_levels,): TPU grid steps execute sequentially on a core,
  which is exactly the level-order dependency;
* the chunk-blocked solution panel ``xw (K+1, cs, R)`` stays resident in
  VMEM for the whole solve (loaded at level 0, flushed at the last level);
* diagonal-inverse tiles are VMEM-resident; each chunk solve is a single
  MXU matmul ``y = Tinv_k @ r_k`` (partitioned-inverse form — the
  reference's ``trsv!`` with zero sequential substitution);
* off-diagonal tiles are pre-gathered (at pack time) into a *level-major
  stream* so each level's tiles are one contiguous slab; the kernel DMAs
  one slab per level, double-buffered — level ``l+1``'s slab streams in
  while level ``l`` computes, so HBM latency is fully hidden;
* per-tile source/destination chunk slots arrive via scalar prefetch and
  dummy-padded slots are skipped with ``@pl.when``.

Constraints: ``cs`` must be lane-aligned (multiple of 128 for f32 — Mosaic
requires HBM slices aligned to the 128-lane tiling), and the resident
panel (K+1, cs, R) must fit VMEM. ``supports_pallas_plan`` checks both;
callers fall back to the XLA scan path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solve import TriKernelData
from ..symbolic import TriPlan

__all__ = [
    "supports_pallas",
    "supports_pallas_plan",
    "build_stream",
    "build_grouped_schedule",
    "pallas_tri_solve",
]

# Tiles per fused wide matmul (same destination chunk). Measured on v5e:
# grouping >1 loses — within a level destinations are mostly distinct
# chunks, so slabs just grow with zero padding (4x DMA for ~nothing).
GROUP = 1

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom out of ~16MB


def supports_pallas() -> bool:
    return jax.default_backend() == "tpu"


def grouped_schedule(plan: TriPlan):
    """Cached grouped schedule for a plan (host arrays)."""
    cached = getattr(plan, "_grouped_cache", None)
    if cached is None:
        cached = build_grouped_schedule(plan)
        plan._grouped_cache = cached
    return cached


def supports_pallas_plan(plan: TriPlan, R: int, itemsize: int = 4) -> bool:
    """Static feasibility: lane alignment + VMEM residency."""
    lanes = 128  # f32; bf16 would be 128 lanes too (sublane differs)
    if plan.cs % lanes != 0:
        return False
    _, _, g_dst = grouped_schedule(plan)
    MG = g_dst.shape[1]
    x_bytes = (plan.K + 1) * plan.cs * max(R, 1) * itemsize
    dinv_bytes = (plan.K + 1) * plan.cs * plan.cs * itemsize
    slab_bytes = 2 * MG * plan.cs * GROUP * plan.cs * itemsize
    xs_bytes = GROUP * plan.cs * max(R, 1) * itemsize
    return x_bytes + dinv_bytes + slab_bytes + xs_bytes < _VMEM_BUDGET


def build_grouped_schedule(plan: TriPlan):
    """Grouped level schedule: within a level, tiles sharing a destination
    chunk fuse into one wide matmul ``y_dst += [T1 .. TG] @ [x_s1; ..]`` —
    one RMW and one MXU op instead of up to GROUP of each.

    Returns host arrays:
      group_ids (NL, MG, GROUP) tile ids (T = dummy/zero tile),
      g_src     (NL, MG, GROUP) source chunks (K = dummy/zero rows),
      g_dst     (NL, MG)        destination chunk (K = dummy -> skip).
    """
    NL, MT = plan.level_tiles.shape
    K, T = plan.K, plan.T
    per_level = []
    for l in range(NL):
        cnt = int(plan.level_tile_counts[l])
        tiles = plan.level_tiles[l, :cnt]
        by_dst = {}
        for t in tiles:
            by_dst.setdefault(int(plan.tile_brow[t]), []).append(int(t))
        groups = []
        for dst, ts in sorted(by_dst.items()):
            for i in range(0, len(ts), GROUP):
                groups.append((dst, ts[i:i + GROUP]))
        per_level.append(groups)
    MG = max((len(g) for g in per_level), default=1) or 1
    group_ids = np.full((NL, MG, GROUP), T, dtype=np.int32)
    g_src = np.full((NL, MG, GROUP), K, dtype=np.int32)
    g_dst = np.full((NL, MG), K, dtype=np.int32)
    for l, groups in enumerate(per_level):
        for j, (dst, ts) in enumerate(groups):
            g_dst[l, j] = dst
            for g, t in enumerate(ts):
                group_ids[l, j, g] = t
                g_src[l, j, g] = plan.tile_bcol[t]
    return group_ids, g_src, g_dst


def stream_from_tiles(offdiag: jax.Array, group_ids: np.ndarray) -> jax.Array:
    """(T+1, cs, cs) tiles → (NL*MG, cs, GROUP*cs) wide group stream.

    Jit-friendly (one gather + transpose + reshape): used both at pack
    time and inside the fused refactorization pipeline.
    """
    NL, MG, G = group_ids.shape
    cs = offdiag.shape[-1]
    gathered = offdiag[jnp.asarray(group_ids.reshape(-1))]  # (NL*MG*G, cs, cs)
    gathered = gathered.reshape(NL * MG, G, cs, cs)
    return gathered.transpose(0, 2, 1, 3).reshape(NL * MG, cs, G * cs)


def build_stream(plan: TriPlan, offdiag: jax.Array):
    """Grouped stream + schedule arrays for :func:`pallas_tri_solve`."""
    group_ids, g_src, g_dst = grouped_schedule(plan)
    off_stream = stream_from_tiles(jnp.asarray(offdiag), group_ids)
    return off_stream, jnp.asarray(g_src), jnp.asarray(g_dst)


def _kernel(
    # scalar prefetch (SMEM)
    lc_ref,        # (NL, MC) chunk ids, K = dummy
    src_ref,       # (NL, MG, GROUP) group source chunks, K = dummy
    dst_ref,       # (NL, MG) group destination chunk, K = dummy
    # tensor inputs
    dinv_ref,      # (K+1, cs, cs) VMEM — diagonal-tile inverses
    stream_hbm,    # (NL*MG, cs, GROUP*cs) HBM — wide group stream
    xw_hbm,        # (K+1, cs, R) HBM — in
    out_hbm,       # (K+1, cs, R) HBM — out (aliased with xw)
    # scratch
    x_vmem,        # (K+1, cs, R) VMEM — resident solution panel
    slab_vmem,     # (2, MG, cs, GROUP*cs) VMEM — double-buffered slabs
    xs_vmem,       # (GROUP*cs, R) VMEM — gathered group sources
    load_sem,
    slab_sem,      # (2,)
    *,
    MC: int,
    MG: int,
    K: int,
):
    lvl = pl.program_id(0)
    nlvl = pl.num_programs(0)
    cs = dinv_ref.shape[-1]

    def slab_dma(slot, level):
        return pltpu.make_async_copy(
            stream_hbm.at[pl.ds(level * MG, MG)],
            slab_vmem.at[slot],
            slab_sem.at[slot],
        )

    # ---- level 0: load the panel + first slab ------------------------------
    @pl.when(lvl == 0)
    def _():
        slab_dma(0, 0).start()
        cp = pltpu.make_async_copy(xw_hbm, x_vmem, load_sem)
        cp.start()
        cp.wait()

    # ---- prefetch next level's slab while this level computes --------------
    @pl.when(lvl + 1 < nlvl)
    def _():
        slab_dma((lvl + 1) % 2, lvl + 1).start()

    # ---- diagonal solves: y_k = Tinv_k @ r_k -------------------------------
    for j in range(MC):
        k = lc_ref[lvl, j]

        @pl.when(k < K)
        def _():
            r = x_vmem[pl.ds(k, 1)][0]           # (cs, R)
            tinv = dinv_ref[pl.ds(k, 1)][0]      # (cs, cs)
            y = jnp.dot(tinv, r, preferred_element_type=r.dtype)
            x_vmem[pl.ds(k, 1)] = y[None].astype(x_vmem.dtype)

    # ---- grouped off-diagonal applies: one wide matmul per dst -------------
    slab_dma(lvl % 2, lvl).wait()
    for j in range(MG):
        dst = dst_ref[lvl, j]

        @pl.when(dst < K)
        def _():
            for g in range(GROUP):
                src = src_ref[lvl, j, g]
                xs_vmem[g * cs:(g + 1) * cs] = x_vmem[pl.ds(src, 1)][0]
            contrib = jnp.dot(
                slab_vmem[lvl % 2, j], xs_vmem[:],
                preferred_element_type=x_vmem.dtype,
            )
            x_vmem[pl.ds(dst, 1)] = (
                x_vmem[pl.ds(dst, 1)] + contrib[None].astype(x_vmem.dtype)
            )

    # ---- last level: flush the panel ---------------------------------------
    @pl.when(lvl == nlvl - 1)
    def _():
        cp = pltpu.make_async_copy(x_vmem, out_hbm, load_sem)
        cp.start()
        cp.wait()


def pallas_tri_solve(
    plan: TriPlan,
    data: TriKernelData,
    xw: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused solve. Requires ``data.diag_inv`` and stream arrays
    (``prepare_tri_kernel(..., build_pallas_stream=True)``)."""
    if data.diag_inv is None:
        raise ValueError("pallas_tri_solve requires tri_mode='inv'/'inv_refine'")
    if data.off_stream is None:
        raise ValueError("TriKernelData has no tile stream; pack with "
                         "build_pallas_stream=True")
    K, cs = plan.K, plan.cs
    NL, MC = plan.level_chunks.shape
    MG = data.dst_stream.shape[1]
    R = xw.shape[-1]
    dtype = xw.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NL,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dinv
            pl.BlockSpec(memory_space=pltpu.ANY),    # tile stream (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # xw (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((K + 1, cs, R), dtype),
            pltpu.VMEM((2, MG, cs, GROUP * cs), dtype),
            pltpu.VMEM((GROUP * cs, R), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_kernel, MC=MC, MG=MG, K=K)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K + 1, cs, R), dtype),
        input_output_aliases={5: 0},  # xw buffer reused as output
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        data.level_chunks,
        data.src_stream,
        data.dst_stream,
        data.diag_inv,
        data.off_stream,
        xw,
    )
