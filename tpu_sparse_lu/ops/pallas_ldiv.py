"""Fully-fused Pallas ``ldiv``: perm → lsolve → rsolve → unperm in ONE kernel.

The reference's solve (/root/reference/src/SharedMemSparseLU.jl:286-342)
is a pipeline of four phases — row permute+scale, forward substitution,
backward substitution, column un-permute — each of which the round-1
engine ran as separate XLA ops (per-level gathers + batched matmuls +
einsum permutations), paying a ~1-2 µs op floor dozens of times per solve.
At these sizes a sparse triangular solve is *latency*-bound, so here the
whole ldiv collapses into one Pallas program built on a single primitive:

    the op stream.

Every unit of work — a diagonal-tile solve ``x_k = Tinv_k x_k`` (the
reference's ``trsv!``, src:359/:384), an off-diagonal update
``x_d += T x_s`` (the reference's ``gemm!``, src:362-363, tiles
pre-negated), and a block-one-hot permutation tile apply (ops/permute.py)
— is one ``(tile, src, dst, acc)`` quadruple over a single VMEM-resident
solution panel ``X``:

    X[dst] = X[src] @ tileᵀ + acc * X[dst]        (acc ∈ {0, 1})

``X`` is laid out ``(P, Rp, cs)`` with the blocks of all THREE spaces
concatenated — input blocks (the chunk-blocked scaled RHS), factor blocks
(where L/U run), output blocks (the un-permuted solution) and one dummy
block absorbing page padding — so ops need no routing: ``src``/``dst``
index one panel and the kernel body is completely BRANCHLESS (one dynamic
read, one MXU matmul, one fused multiply-add, one dynamic write; measured
~4x faster per op than the earlier 5-way ``pl.when`` dispatch). Panels
are stored TRANSPOSED — the lane dimension is ``cs`` (128) — so a
single-RHS solve (R=1, the reference's primary calling pattern) packs
VMEM sublanes instead of wasting 127/128 lanes.

The host emits the stream in dependency order (levels flattened — a
single core executes sequentially anyway, so level *batching* buys
nothing in-kernel; level *order* is all that matters): diagonal solves
are SET ops (``acc=0``, ``src == dst``), everything else accumulates into
a pre-zeroed panel. Tiles stream from HBM in fixed-size pages of ``PAGE``
tiles, double-buffered — page ``p+1`` DMAs in while page ``p`` computes
(the ring buffer that lets arbitrarily wide plans run in bounded VMEM).

Because the permutation tiles are 0/1 and value-independent, a device
refactorization only has to refresh the L/U slices of the stream
(see refactor.py) — the perm segments are reusable constants.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..symbolic import TriPlan

__all__ = [
    "LdivOps",
    "build_ldiv_ops",
    "build_ldiv_stream",
    "supports_fused_ldiv",
    "pallas_fused_ldiv",
]

PAGE = 16  # tiles per DMA page (PAGE * cs * cs * 4 bytes per buffer)

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom out of ~16MB
_SMEM_BUDGET = 256 * 1024

# tile-source component ids for the stream gather (build_ldiv_stream)
SRC_PERMP, SRC_LDINV, SRC_LOFF, SRC_UDINV, SRC_UOFF, SRC_PERMQ = range(6)


@dataclasses.dataclass
class LdivOps:
    """Host-side fused-ldiv schedule.

    ``src/dst/acc`` drive the kernel (scalar-prefetched; indices into the
    unified ``(P, Rp, cs)`` panel); ``tile_base`` / ``tile_idx`` say which
    component buffer each op's tile comes from, so the device stream can
    be (re)built with one concat + gather — both at pack time and inside
    the jitted refactorization pipeline.

    Panel layout: blocks ``[0, KA]`` input space, ``[KA+1, KA+KB+1]``
    factor space, ``[KA+KB+2, 2*KA+KB+2]`` output space, ``[P-1]`` dummy.
    """

    KA: int   # input-space chunks (KA+1 blocks incl. the padding dummy)
    KB: int   # factor-space chunks
    cs: int
    n_ops: int  # real ops (before page padding)
    src: np.ndarray        # (Npad,) int32 panel block index
    dst: np.ndarray        # (Npad,) int32 panel block index
    acc: np.ndarray        # (Npad,) int32: 1 = accumulate, 0 = set
    tile_base: np.ndarray  # (Npad,) int32 component id, -1 = zero tile
    tile_idx: np.ndarray   # (Npad,) int32 index within the component

    @property
    def n_pages(self) -> int:
        return self.src.shape[0] // PAGE

    @property
    def panel_blocks(self) -> int:
        """P: unified panel block count (input + factor + output + dummy)."""
        return 2 * (self.KA + 1) + (self.KB + 1) + 1

    @property
    def out_base(self) -> int:
        return self.KA + self.KB + 2


def _perm_pairs(pplan) -> list:
    """Real (dst_chunk, src_chunk, flat_tile_idx) triples of a PermPlan."""
    src = np.asarray(pplan.src)  # (K, S)
    K, S = src.shape
    out = []
    for k in range(K):
        for s in range(S):
            if src[k, s] < pplan.K_in:  # K_in is the dummy source
                out.append((k, int(src[k, s]), k * S + s))
    return out


def _tri_ops(plan: TriPlan, fac0: int, dinv_base: int, off_base: int):
    """Flatten one factor's level schedule into dependency-ordered ops."""
    src, dst, acc, base, idx = [], [], [], [], []
    for l in range(plan.num_levels):
        nc = int(plan.level_chunk_counts[l])
        for a in range(nc):
            k = int(plan.level_chunks[l, a])
            src.append(fac0 + k)
            dst.append(fac0 + k)
            acc.append(0)           # diagonal solve: x_k = Tinv_k x_k
            base.append(dinv_base)
            idx.append(k)
        nt = int(plan.level_tile_counts[l])
        for a in range(nt):
            t = int(plan.level_tiles[l, a])
            src.append(fac0 + int(plan.tile_bcol[t]))
            dst.append(fac0 + int(plan.tile_brow[t]))
            acc.append(1)           # off-diagonal update (tiles pre-negated)
            base.append(off_base)
            idx.append(t)
    return src, dst, acc, base, idx


def build_ldiv_ops(
    pperm, lplan: TriPlan, uplan: TriPlan, qperm, *, KA: int
) -> Optional[LdivOps]:
    """Emit the fused op stream: permP → (L levels) → (U levels) → permQ.

    ``pperm``/``qperm`` are the block-one-hot :class:`~..ops.permute.PermPlan`
    objects of the full ldiv; returns None when either uses the gather
    fallback (no tiles to fuse).
    """
    if pperm.gather_idx is not None or qperm.gather_idx is not None:
        return None
    if lplan.cs != uplan.cs:
        return None
    cs = lplan.cs
    KB = lplan.K
    fac0 = KA + 1          # factor-space block offset
    out0 = KA + KB + 2     # output-space block offset
    dummy = 2 * (KA + 1) + (KB + 1)  # last block
    src, dst, acc, base, idx = [], [], [], [], []
    # phase 1: wrk = P(Rs ⊙ b) — scale happens in XLA before the kernel;
    # the factor-space panel is pre-zeroed, so every perm tile accumulates
    for (d, s, t) in _perm_pairs(pperm):
        src.append(s)
        dst.append(fac0 + d)
        acc.append(1)
        base.append(SRC_PERMP)
        idx.append(t)
    # phase 2/3: the triangular solves (reference src:330, :333)
    for plan, db, ob in ((lplan, SRC_LDINV, SRC_LOFF),
                         (uplan, SRC_UDINV, SRC_UOFF)):
        s_, d_, a_, b_, i_ = _tri_ops(plan, fac0, db, ob)
        src += s_
        dst += d_
        acc += a_
        base += b_
        idx += i_
    # phase 4: x[q] = wrk (reference src:337-339), into the output blocks
    for (d, s, t) in _perm_pairs(qperm):
        src.append(fac0 + s)
        dst.append(out0 + d)
        acc.append(1)
        base.append(SRC_PERMQ)
        idx.append(t)
    n_ops = len(src)
    pad = (-n_ops) % PAGE
    src += [dummy] * pad
    dst += [dummy] * pad
    acc += [1] * pad
    base += [-1] * pad
    idx += [0] * pad
    return LdivOps(
        KA=KA, KB=KB, cs=cs, n_ops=n_ops,
        src=np.asarray(src, dtype=np.int32),
        dst=np.asarray(dst, dtype=np.int32),
        acc=np.asarray(acc, dtype=np.int32),
        tile_base=np.asarray(base, dtype=np.int32),
        tile_idx=np.asarray(idx, dtype=np.int32),
    )


def stream_gather_spec(ops: LdivOps, sizes: dict) -> np.ndarray:
    """Flat gather indices into the concatenated component buffer.

    ``sizes[base] = number of tiles component `base` contributes``; the
    concat order is SRC_PERMP..SRC_PERMQ followed by one zero tile.
    """
    offs = {}
    acc = 0
    for b in range(6):
        offs[b] = acc
        acc += int(sizes.get(b, 0))
    zero_slot = acc
    flat = np.full(ops.src.shape[0], zero_slot, dtype=np.int32)
    real = ops.tile_base >= 0
    flat[real] = ops.tile_idx[real] + np.array(
        [offs[b] for b in ops.tile_base[real]], dtype=np.int32
    )
    return flat


def build_ldiv_stream(
    gather_idx,      # device or host int32 (Npad,) from stream_gather_spec
    permp_tiles,     # (K*S, cs, cs) any dtype (one-hot)
    ldiag_inv, loff, udiag_inv, uoff,  # component buffers (·, cs, cs)
    permq_tiles,
    dtype=jnp.float32,
):
    """Assemble the device tile stream (transposed tiles). Jit-friendly —
    the refactorization pipeline calls this with refreshed L/U buffers."""
    cs = ldiag_inv.shape[-1]
    parts = [permp_tiles, ldiag_inv, loff, udiag_inv, uoff, permq_tiles,
             jnp.zeros((1, cs, cs), dtype)]
    big = jnp.concatenate([p.astype(dtype) for p in parts], axis=0)
    return big[jnp.asarray(gather_idx)].transpose(0, 2, 1)


def _rp(R: int) -> int:
    return max(8, -(-R // 8) * 8)


def supports_fused_ldiv(ops: Optional[LdivOps], R: int,
                        itemsize: int = 4) -> bool:
    """Static feasibility: lane alignment, VMEM panel + pages, SMEM."""
    if ops is None:
        return False
    cs = ops.cs
    if cs % 128 != 0:
        return False
    if itemsize != 4:
        return False
    Rp = _rp(R)
    panel = ops.panel_blocks * Rp * cs * itemsize
    pages = 2 * PAGE * cs * cs * itemsize
    if panel + pages >= _VMEM_BUDGET:
        return False
    if ops.src.shape[0] * 3 * 4 >= _SMEM_BUDGET:
        return False
    return True


def _kernel(
    src_ref, dst_ref, acc_ref,  # scalar prefetch (Npad,) each
    in_hbm,       # (KA+1, Rp, cs) HBM — scaled, blocked, transposed RHS
    stream_hbm,   # (Npad, cs, cs) HBM — transposed tile stream
    out_hbm,      # (KA+1, Rp, cs) HBM
    x,            # (P, Rp, cs) VMEM — unified input/factor/output panel
    pages,        # (2, PAGE, cs, cs) VMEM ring buffer
    io_sem, page_sem,
    *,
    NPAGES: int,
    KA: int,
    OUT0: int,
):
    pg = pl.program_id(0)

    def page_dma(slot, page):
        return pltpu.make_async_copy(
            stream_hbm.at[pl.ds(page * PAGE, PAGE)],
            pages.at[slot],
            page_sem.at[slot],
        )

    @pl.when(pg == 0)
    def _():
        page_dma(0, 0).start()
        x[:] = jnp.zeros_like(x)
        cp = pltpu.make_async_copy(
            in_hbm, x.at[pl.ds(0, KA + 1)], io_sem
        )
        cp.start()
        cp.wait()

    @pl.when(pg + 1 < NPAGES)
    def _():
        page_dma((pg + 1) % 2, pg + 1).start()

    page_dma(pg % 2, pg).wait()

    for j in range(PAGE):
        i = pg * PAGE + j
        s = src_ref[i]
        d = dst_ref[i]
        a = acc_ref[i]
        y = jnp.dot(x[s], pages[pg % 2, j],
                    preferred_element_type=jnp.float32)
        x[d] = y.astype(x.dtype) + a.astype(x.dtype) * x[d]

    @pl.when(pg == NPAGES - 1)
    def _():
        cp = pltpu.make_async_copy(
            x.at[pl.ds(OUT0, KA + 1)], out_hbm, io_sem
        )
        cp.start()
        cp.wait()


def pallas_fused_ldiv(
    ops: LdivOps,
    stream: jax.Array,   # (Npad, cs, cs) from build_ldiv_stream
    xw: jax.Array,       # (KA+1, cs, R) chunk-blocked SCALED rhs
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused solve; returns the solved ``(KA+1, cs, R)`` carrier."""
    KA, cs = ops.KA, ops.cs
    R = xw.shape[-1]
    Rp = _rp(R)
    dtype = xw.dtype
    xt = xw.transpose(0, 2, 1)  # (KA+1, R, cs)
    if Rp != R:
        xt = jnp.pad(xt, ((0, 0), (0, Rp - R), (0, 0)))
    NPAGES = ops.n_pages

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NPAGES,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xt (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # stream (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((ops.panel_blocks, Rp, cs), dtype),
            pltpu.VMEM((2, PAGE, cs, cs), dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, NPAGES=NPAGES, KA=KA, OUT0=ops.out_base
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KA + 1, Rp, cs), dtype),
        input_output_aliases={3: 0},  # xt buffer reused as output
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        jnp.asarray(ops.src),
        jnp.asarray(ops.dst),
        jnp.asarray(ops.acc),
        xt,
        stream,
    )
    return out[:, :R, :].transpose(0, 2, 1)
