"""Pallas span-gather: build the transposed tile store from CSC values.

The device-side analogue of the reference's ``fill_chunks!`` scatter
(/root/reference/src/SharedMemSparseLU.jl:180-243): CSC nonzeros placed
into dense blocks, here for the refactorization's merged tile store.

The windowed XLA assembly (assemble.py) moves values in W=16-wide rows
because row gathers cost ~10-17 ns per ROW regardless of width — at
W=16 that is 8x more rows than necessary, and the gather+scatter pair
was 630 us of the 665 us assembly (BASELINE config 2, measured). XLA
cannot do better: a per-row-offset 128-span gather lowers to a
serialized gather (~1.1 us/row measured via vmapped dynamic_slice).

In Pallas the span gather is one dynamic two-row read plus a lane roll:
store row ``(tile, col)`` holds the tile-rows of one CSC column — a
CONTIGUOUS value run ``a[g : g+len)`` placed at lanes ``[lo, hi)``:

    r01  = a2[g >> 7 : (g >> 7) + 2]            # (2, 128) dynamic read
    roll = pltpu.roll(r01, -(g & 127), lanes)
    out  = where(lane < 128 - d, roll[0], roll[1])  # stitch the pair
    row  = where(lo <= lane < hi, out, 0)

Rows are grouped (reads, then rolls, then writes) like the ldiv shift
ops, giving ~20-25 ns/row. Output rows are emitted IN ORDER — the
gather's result *is* the transposed store, so the scatter disappears
entirely. Store columns whose tile-rows are not one contiguous run
(non-banded patterns) fall back to the planner's per-element leftover
scatter on top, and the whole kernel is gated on the padded value
stream fitting VMEM (assemble.plan & apply keep the windowed XLA path
as the general fallback).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["supports_span_gather", "span_gather"]

_VMEM_BUDGET = 10 * 1024 * 1024
# PrefetchScalarGridSpec loads the g/lo/hi schedules into SMEM WHOLE
# (1 MB on v5e); measured on hardware at n=40k nd: 3 x 924 KB of
# prefetched scalars -> "Ran out of memory in memory space smem. Used
# 2.71M of 1.00M". Leave headroom for control/spill slots.
_SMEM_BUDGET = 768 * 1024
PR = 256     # output rows per grid page
GROUP = 8    # rows per read/compute/write group


def supports_span_gather(n_rows: int, np2: int, cs: int,
                         *, interpret: bool = False) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    if cs != 128:
        return False
    # the three scalar-prefetch schedules live in SMEM in full (applied
    # in interpret mode too, so CPU tests reject exactly what the
    # hardware would); the windowed XLA assembly is the fallback
    npad = -(-n_rows // PR) * PR
    if 3 * npad * 4 > _SMEM_BUDGET:
        return False
    # the value stream stays VMEM-resident; one output page rides along
    vmem = np2 * 4 + PR * cs * 4
    return vmem < _VMEM_BUDGET


def _kernel(g_ref, lo_ref, hi_ref, a2_ref, out_ref):
    # int32 explicitly: program_id is int64 under jax_enable_x64 and
    # Mosaic cannot lower the resulting i64 index arithmetic
    pg = pl.program_id(0).astype(jnp.int32)
    cs = out_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cs), 1)
    for g0 in range(0, PR, GROUP):
        reads = []
        for j in range(GROUP):
            i = pg * PR + g0 + j
            gq = g_ref[i] // cs
            reads.append((a2_ref[pl.ds(gq, 2)], g_ref[i] % cs))
        ys = []
        for j in range(GROUP):
            i = pg * PR + g0 + j
            r01, d = reads[j]
            rolled = pltpu.roll(r01, -d, 1)
            out = jnp.where(lane < cs - d, rolled[0:1], rolled[1:2])
            m = (lane >= lo_ref[i]) & (lane < hi_ref[i])
            ys.append(jnp.where(m, out, jnp.zeros_like(out)))
        for j in range(GROUP):
            out_ref[g0 + j:g0 + j + 1] = ys[j]


@functools.partial(jax.jit, static_argnames=("n_rows", "interpret"))
def span_gather(a2, g, lo, hi, *, n_rows: int, interpret: bool = False):
    """``out[i, k] = a2.flat[g[i] + k]`` masked to ``lo[i] <= k < hi[i]``.

    ``a2``: (Nq, 128) the zero-padded value stream (one front pad row and
    one back pad row so ``g // 128 + 1`` stays in bounds);
    ``g/lo/hi``: (n_rows_padded,) int32, n_rows_padded a multiple of PR.
    Returns (n_rows, 128).
    """
    npad = g.shape[0]
    cs = a2.shape[1]
    assert npad % PR == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(npad // PR,),
        in_specs=[
            # constant index map: the value stream loads once and stays
            pl.BlockSpec(a2.shape, lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((PR, cs), lambda i, *_: (i, 0)),
    )
    from ..utils.x64 import x64_off_for

    with x64_off_for(a2.dtype):  # 32-bit trace for 4-byte kernels only
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((npad, cs), a2.dtype),
            interpret=interpret,
        )(g, lo, hi, a2)
    return out[:n_rows]
