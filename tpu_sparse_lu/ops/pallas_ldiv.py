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
single core executes sequentially anyway; level *order* is all that
matters): diagonal solves are SET ops (``acc=0``, ``src == dst``),
everything else accumulates into a pre-zeroed panel. Tiles stream from
HBM in fixed-size pages of ``PAGE`` tiles, double-buffered — page
``p+1`` DMAs in while page ``p`` computes (the ring buffer that lets
arbitrarily wide plans run in bounded VMEM).

Two further measured facts shape the op loop:

* batching independent ops as one ``dot_general`` (``GROUP_MM`` at a
  time) keeps reads ahead of writes so dynamic VMEM accesses don't
  serialize; the emitter pads every dependency wave to GROUP_MM so
  groups never span a read-after-write boundary;
* tile bytes still matter (the stream is the only HBM traffic), so
  tiles travel in TWO streams by value type: the permutation tiles are
  0/1 and value-independent, so they stream as **int8** (4x fewer
  bytes) and are widened on the VPU after the page DMA lands; the L/U
  tiles stream as f32. Pages are single-kind (each phase is padded to a
  page boundary) and each stream has its own VMEM ring buffer, so a
  per-page kind flag picks the buffer and the op loop stays branchless.
  The split also makes the perm stream a reusable constant: a device
  refactorization rebuilds only the f32 L/U stream (see refactor.py).

Third measured fact (v5e slope-timed synthetic streams, round 3): the
kernel runs at HBM speed-of-light — ~12 ns/op fixed plus stream bytes at
~850 GB/s (f32 tile 89 ns, int8 tile 31 ns). At that point the only
lever left is BYTES, and one-hot permutation tiles carry log2(cs) bits
of information in 16 KB. Under the chunk-aligned orderings almost every
perm tile is 1-2 *contiguous shifted runs* (measured: 198/246 tiles
single-run, 48/246 two-run on the nd Poisson plan), so they are emitted
as a third op kind — **shift ops** — executed entirely on the VPU with
ZERO stream bytes:

    X[dst] = where(lo <= lane < hi, roll(X[src], delta, lanes), 0)
             + acc * X[dst]

``(delta, lo, hi)`` ride the scalar-prefetch arrays; pages of shift ops
start no DMA at all. Tiles with more runs than ``_RUNS_MAX`` stay on the
int8 matmul path (hostile permutations degrade gracefully).
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
    "build_lu_stream",
    "build_perm_stream",
    "supports_fused_ldiv",
    "max_fused_rhs",
    "pallas_fused_ldiv",
    "fused_ldiv_auto",
]

PAGE = 32  # tiles per DMA page (PAGE * cs * cs * itemsize bytes per ring buffer; 16/32/64 measured within noise on v5e round-3 slope timing — the stream is HBM-byte-bound)
# Ops per batched dot_general group for the MATMUL kinds. The emitter
# pads every dependency WAVE to a multiple of GROUP_MM so a group never
# spans a read-after-write boundary; within a group all reads happen
# before any write, and same-dst accumulation stays sequential after the
# matmul. Round-3 slope timing on synthetic streams: f32 tile ops cost
# the same 88-90 ns/slot at G in {2,4,8,16,32} — the cost IS the HBM
# bytes — so GROUP_MM is set to the MINIMUM that preserves the
# read/write batching (2), which quarters the zero-tile padding every
# wave streams compared to the old G=8.
GROUP_MM = 2
# Shift ops move no bytes; their cost is per-op fixed latency, which
# grouping amortizes (measured 83 ns serial, 29 ns at G=4, 20 at G=8,
# 16 at G=16, 15.1 at G=32 = one group per page). They are never
# wave-padded (pages only) and a shift segment never reads a block it
# writes (perm phases read one panel space, write another), so the
# maximal group is free.
GROUP_SHIFT = 32
assert PAGE % GROUP_MM == 0 and PAGE % GROUP_SHIFT == 0

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom out of ~16MB
_SMEM_BUDGET = 256 * 1024
_LANES = 128  # panel lane width the kernel requires of cs

# tile-source component ids for the stream gathers; SRC_SHIFT marks
# tile-less lane-shift ops (op kind 2 — no stream slot, scalars only)
(SRC_PERMP, SRC_LDINV, SRC_LOFF, SRC_UDINV, SRC_UOFF, SRC_PERMQ,
 SRC_SHIFT) = range(7)
_PERM_COMPONENTS = (SRC_PERMP, SRC_PERMQ)          # int8 stream
_LU_COMPONENTS = (SRC_LDINV, SRC_LOFF, SRC_UDINV, SRC_UOFF)  # f32 stream

# a perm tile with more contiguous runs than this streams as an int8
# matmul tile (31 ns) instead of per-run shift ops (~12 ns each)
_RUNS_MAX = 2


@dataclasses.dataclass
class LdivOps:
    """Host-side fused-ldiv schedule.

    ``src/dst/acc`` drive the kernel (scalar-prefetched; indices into the
    unified ``(P, Rp, cs)`` panel); ``tile_base`` / ``tile_idx`` say which
    component buffer each op's tile comes from, so each device stream can
    be (re)built with one concat + gather — both at pack time and inside
    the jitted refactorization pipeline.

    Ops are emitted in page-aligned segments — perm-in (shift kind 2 +
    int8 residue), L+U (f32), perm-out (shift + int8 residue) — and
    ``page_kind``/``page_off`` say, per page, which stream it reads (kind
    2 = none) and at which page offset within it.

    Panel layout: blocks ``[0, KA]`` input space — REUSED as the output
    space (input blocks are dead once the perm-in phase ends, so the
    un-pivot phase SETs its first write per block and accumulates after,
    halving the panel and doubling the R/n VMEM ceiling) —
    ``[KA+1, KA+KB+1]`` factor space, ``[P-1]`` dummy.
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
    page_kind: np.ndarray  # (NPAGES,) int32: 0 int8 perm / 1 f32 / 2 shift
    page_off: np.ndarray   # (NPAGES,) int32 page index within its stream
    # shift-op scalars (kind 2; zeros elsewhere): lane roll amount and
    # half-open destination lane range of the run
    delta: np.ndarray      # (Npad,) int32
    lo: np.ndarray         # (Npad,) int32
    hi: np.ndarray         # (Npad,) int32
    # int8 one-hot residue tiles for runs-dense perm pairs (host arrays;
    # tile_idx of SRC_PERMP/SRC_PERMQ ops index into these)
    res_p: np.ndarray      # (n_res_p, cs, cs) int8
    res_q: np.ndarray      # (n_res_q, cs, cs) int8

    @property
    def n_pages(self) -> int:
        return self.src.shape[0] // PAGE

    @property
    def panel_blocks(self) -> int:
        """P: unified panel block count (in/out shared + factor + dummy)."""
        return (self.KA + 1) + (self.KB + 1) + 1

    @property
    def out_base(self) -> int:
        return 0  # the output space aliases the (dead) input space


def perm_spec(perm, cs: int, K_in: int):
    """Decompose ``out[i] = v[perm[i]]`` into shift runs + int8 residue,
    straight from the permutation VECTOR (``perm[i] = -1`` rows are
    zero). No (K, S, cs, cs) one-hot tiles are materialized — at
    n ~ 1e5 those hit the PermPlan memory cap and previously pushed the
    whole fused path onto the XLA fallback.

    A (dst_chunk, src_chunk) pair whose entries form at most
    ``_RUNS_MAX`` contiguous shifted runs becomes one kind-2 op per run;
    denser pairs become one-hot int8 tiles (``res``) for the matmul
    stream. Returns ``(shifts, mm, res)`` with shifts =
    [(d, c, delta, lo, hi)], mm = [(d, c, idx into res)], res
    (n_res, cs, cs) int8.
    """
    perm = np.asarray(perm, dtype=np.int64)
    i = np.nonzero(perm >= 0)[0]
    if not len(i):
        return [], [], np.zeros((0, cs, cs), np.int8)
    p = perm[i]
    d = i // cs
    li = i % cs
    c = p // cs
    ls = p % cs
    newrun = np.ones(len(i), dtype=bool)
    newrun[1:] = ((i[1:] != i[:-1] + 1) | (p[1:] != p[:-1] + 1)
                  | (d[1:] != d[:-1]) | (c[1:] != c[:-1]))
    starts = np.nonzero(newrun)[0]
    lens = np.diff(np.append(starts, len(i)))
    rd, rc = d[starts], c[starts]
    rdelta = (li[starts] - ls[starts]) % cs
    rlo = li[starts]
    rhi = rlo + lens
    keys = rd * np.int64(K_in + 1) + rc
    order = np.argsort(keys, kind="stable")  # stable: dst order per pair
    uk, counts = np.unique(keys[order], return_counts=True)
    shifts, mm, res_pairs = [], [], []
    pos = 0
    for u, cnt in zip(uk, counts):
        sel = order[pos:pos + cnt]
        pos += cnt
        dd, cc = int(u // (K_in + 1)), int(u % (K_in + 1))
        if cnt <= _RUNS_MAX:
            for r in sel:
                shifts.append((dd, cc, int(rdelta[r]),
                               int(rlo[r]), int(rhi[r])))
        else:
            mm.append((dd, cc, len(res_pairs)))
            res_pairs.append((dd, cc))
    res = np.zeros((len(res_pairs), cs, cs), np.int8)
    if res_pairs:
        tid = {pr: t for t, pr in enumerate(res_pairs)}
        sel_el = np.fromiter(
            (tid.get((int(a), int(b)), -1) for a, b in zip(d, c)),
            dtype=np.int64, count=len(d),
        )
        m = sel_el >= 0
        res[sel_el[m], li[m], ls[m]] = 1
    return shifts, mm, res


def _interleave(items: list, dst_of) -> list:
    """Round-robin a wave of independent ops across DISTINCT destinations.

    Ops accumulating into the same panel block form a serial read-modify-
    write chain; consecutive same-dst ops stall the whole pipeline on it
    (measured: banded-dissection streams, whose separator chunks receive
    dozens of back-to-back updates, ran ~2 µs/op vs ~0.4 µs interleaved).
    Within a wave every op is independent of the others' OUTPUTS, so any
    order is valid — emit one op per destination in rotation.
    """
    from collections import OrderedDict

    queues: "OrderedDict[int, list]" = OrderedDict()
    for it in items:
        queues.setdefault(dst_of(it), []).append(it)
    out = []
    while queues:
        for d in list(queues.keys()):
            out.append(queues[d].pop(0))
            if not queues[d]:
                del queues[d]
    return out


def _tri_ops(plan: TriPlan, fac0: int, dinv_base: int, off_base: int,
             dummy: int):
    """Flatten one factor's level schedule into dependency-ordered ops.

    Each level contributes two waves — the batched diagonal solves, then
    the off-diagonal updates pushed from this level's chunks — and each
    wave is destination-interleaved (see :func:`_interleave`) and padded
    to a multiple of GROUP_MM, so the kernel's batched-dot groups never
    span a read-after-write boundary (an off-diagonal op reads chunks
    the SAME level's diagonal wave just solved; the next level's
    diagonal wave reads chunks this level's off-diagonal wave wrote).
    """
    src, dst, acc, base, idx = [], [], [], [], []

    def pad_wave():
        pad = (-len(src)) % GROUP_MM
        src.extend([dummy] * pad)
        dst.extend([dummy] * pad)
        acc.extend([1] * pad)
        base.extend([-1] * pad)
        idx.extend([0] * pad)

    for l in range(plan.num_levels):
        nc = int(plan.level_chunk_counts[l])
        for k in plan.level_chunks[l, :nc].tolist():
            src.append(fac0 + k)
            dst.append(fac0 + k)
            acc.append(0)           # diagonal solve: x_k = Tinv_k x_k
            base.append(dinv_base)
            idx.append(k)
        pad_wave()
        nt = int(plan.level_tile_counts[l])
        tiles = _interleave(
            plan.level_tiles[l, :nt].tolist(),
            lambda t: int(plan.tile_brow[t]),
        )
        for t in tiles:
            src.append(fac0 + int(plan.tile_bcol[t]))
            dst.append(fac0 + int(plan.tile_brow[t]))
            acc.append(1)           # off-diagonal update (tiles pre-negated)
            base.append(off_base)
            idx.append(t)
        pad_wave()
    return src, dst, acc, base, idx


def build_ldiv_ops(
    pvec, lplan: TriPlan, uplan: TriPlan, qvec, *, KA: int
) -> Optional[LdivOps]:
    """Emit the fused op stream: permP → (L levels) → (U levels) → permQ.

    ``pvec``/``qvec`` are the raw permutation VECTORS of the full ldiv
    (``out[i] = v[vec[i]]``; -1 rows are zero): the perm phases are
    decomposed directly from them (:func:`perm_spec`), so the fused path
    never materializes one-hot tile grids and stays available at scales
    where the block-one-hot PermPlan falls back to gather.
    """
    if lplan.cs != uplan.cs:
        return None
    cs = lplan.cs
    KB = lplan.K
    fac0 = KA + 1          # factor-space block offset
    out0 = 0               # output space ALIASES the dead input space
    dummy = (KA + 1) + (KB + 1)  # last block
    src, dst, acc, base, idx = [], [], [], [], []
    dlt, lo, hi = [], [], []
    seg_pages = []  # (kind, n_pages) per segment

    def emit(s, d, a, b, i, dl=0, l=0, h=0):
        src.append(s)
        dst.append(d)
        acc.append(a)
        base.append(b)
        idx.append(i)
        dlt.append(dl)
        lo.append(l)
        hi.append(h)

    def close_segment(kind):
        """Pad the open segment to a page boundary and record its kind."""
        for _ in range((-len(src)) % PAGE):
            emit(dummy, dummy, 1, -1, 0)
        done = sum(p * PAGE for _, p in seg_pages)
        seg_pages.append((kind, (len(src) - done) // PAGE))

    def emit_perm(vec, K_src, src_of, dst_of, comp, set_first=False):
        """One permutation phase: a kind-2 shift segment (zero stream
        bytes; serial in-kernel, so no GROUP padding either) followed by
        the int8 matmul residue for runs-dense pairs.

        ``set_first``: the first op touching each destination block is a
        SET (acc=0) — the un-pivot phase writes over the input space's
        stale values rather than a pre-zeroed region. Shift ops with
        partial lane coverage cannot SET the untouched lanes, so the
        first toucher of a partially-covered block is a full-lane zeroed
        shift (lo=0, hi=cs with the mask folded in) — simpler: promote
        such blocks by emitting an explicit zeroing op first."""
        shifts, mm, res = perm_spec(vec, cs, K_src)
        seen = set()

        def first(d):
            if not set_first or d in seen:
                return 1
            seen.add(d)
            return 0

        for (d, s, dl, l, h) in _interleave(shifts, lambda it: it[0]):
            a = first(d)
            if a == 0 and not (l == 0 and h == cs):
                # partial-coverage SET: zero the block first (a shift op
                # with an empty lane range and acc=0 writes exact zeros),
                # then accumulate the run as usual
                emit(dummy, dst_of(d), 0, SRC_SHIFT, 0, 0, 0, 0)
                a = 1
            emit(src_of(s), dst_of(d), a, SRC_SHIFT, 0, dl, l, h)
        close_segment(2)
        for (d, s, t) in _interleave(mm, lambda it: it[0]):
            emit(src_of(s), dst_of(d), first(d), comp, t)
        close_segment(0)
        return res

    # phase 1: wrk = P(Rs ⊙ b) — scale happens in XLA before the kernel;
    # the factor-space panel is pre-zeroed, so every perm op accumulates
    res_p = emit_perm(pvec, KA, lambda s: s, lambda d: fac0 + d, SRC_PERMP)
    # phase 2/3: the triangular solves (reference src:330, :333)
    for plan, db, ob in ((lplan, SRC_LDINV, SRC_LOFF),
                         (uplan, SRC_UDINV, SRC_UOFF)):
        s_, d_, a_, b_, i_ = _tri_ops(plan, fac0, db, ob, dummy)
        for vals in zip(s_, d_, a_, b_, i_):
            emit(*vals)
    close_segment(1)
    # phase 4: x[q] = wrk (reference src:337-339), into the output blocks
    # (aliasing the dead input blocks: first write per block SETs)
    res_q = emit_perm(qvec, KB, lambda s: fac0 + s, lambda d: out0 + d,
                      SRC_PERMQ, set_first=True)

    page_kind, page_off = [], []
    off = {0: 0, 1: 0, 2: 0}
    for kind, n in seg_pages:
        for _ in range(n):
            page_kind.append(kind)
            page_off.append(off[kind])
            off[kind] += 1
    base = np.asarray(base, dtype=np.int32)
    return LdivOps(
        KA=KA, KB=KB, cs=cs, n_ops=int(np.sum(base >= 0)),
        src=np.asarray(src, dtype=np.int32),
        dst=np.asarray(dst, dtype=np.int32),
        acc=np.asarray(acc, dtype=np.int32),
        tile_base=np.asarray(base, dtype=np.int32),
        tile_idx=np.asarray(idx, dtype=np.int32),
        page_kind=np.asarray(page_kind, dtype=np.int32),
        page_off=np.asarray(page_off, dtype=np.int32),
        delta=np.asarray(dlt, dtype=np.int32),
        lo=np.asarray(lo, dtype=np.int32),
        hi=np.asarray(hi, dtype=np.int32),
        res_p=res_p,
        res_q=res_q,
    )


def stream_gather_spec(ops: LdivOps, sizes: dict, kind: int) -> np.ndarray:
    """Gather indices building one stream (``kind``: 0 perm / 1 L+U).

    ``sizes[base] = number of tiles component `base` contributes``; the
    concat order follows ``_PERM_COMPONENTS`` / ``_LU_COMPONENTS``
    followed by one zero tile. Output length = (pages of this kind)*PAGE,
    in page order.
    """
    comps = _PERM_COMPONENTS if kind == 0 else _LU_COMPONENTS
    offs = {}
    total = 0
    for b in comps:
        offs[b] = total
        total += int(sizes.get(b, 0))
    zero_slot = total
    page_sel = ops.page_kind == kind
    slot_sel = np.repeat(page_sel, PAGE)
    tb = ops.tile_base[slot_sel]
    ti = ops.tile_idx[slot_sel]
    flat = np.full(tb.shape[0], zero_slot, dtype=np.int32)
    real = np.isin(tb, comps)
    flat[real] = ti[real] + np.array(
        [offs[b] for b in tb[real]], dtype=np.int32
    )
    return flat


def build_perm_stream(gather_idx, permp_tiles, permq_tiles) -> jax.Array:
    """Assemble the int8 permutation stream (transposed one-hot tiles).
    Value-independent: built once per symbolic plan."""
    cs = permp_tiles.shape[-1]
    parts = [permp_tiles, permq_tiles, jnp.zeros((1, cs, cs), jnp.int8)]
    big = jnp.concatenate([p.astype(jnp.int8) for p in parts], axis=0)
    return big[jnp.asarray(gather_idx)].transpose(0, 2, 1)


def build_lu_stream(
    gather_idx,      # device or host int32 from stream_gather_spec(kind=1)
    ldiag_inv, loff, udiag_inv, uoff,  # component buffers (·, cs, cs)
    dtype=jnp.float32,
):
    """Assemble the f32 L/U tile stream (transposed tiles). Jit-friendly —
    the refactorization pipeline calls this with refreshed L/U buffers."""
    cs = ldiag_inv.shape[-1]
    parts = [ldiag_inv, loff, udiag_inv, uoff,
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
    if cs % _LANES != 0:
        return False
    if itemsize != 4:
        return False
    Rp = _rp(R)
    panel = ops.panel_blocks * Rp * cs * itemsize
    pages = 2 * PAGE * cs * cs * (itemsize + 1)  # f32 + int8 ring buffers
    if panel + pages >= _VMEM_BUDGET:
        return False
    # 3 scalar words per slot: src, dst, and the packed
    # (acc | delta | lo | hi) meta word (see _pack_meta)
    if (ops.src.shape[0] * 3 + ops.page_kind.shape[0] * 2) * 4 >= _SMEM_BUDGET:
        return False
    return True


def max_fused_rhs(ops: Optional[LdivOps], itemsize: int = 4) -> int:
    """Widest RHS panel (multiple of 8, the sublane pack unit) a single
    fused-kernel invocation can hold in VMEM; 0 when even R=1 doesn't fit
    (the XLA engine serves then). The R-strip router (fused_ldiv_auto)
    pages wider panels through the kernel in strips of this width."""
    if not supports_fused_ldiv(ops, 1, itemsize):
        return 0
    cs = ops.cs
    pages = 2 * PAGE * cs * cs * (itemsize + 1)
    rp = (_VMEM_BUDGET - pages - 1) // (ops.panel_blocks * cs * itemsize)
    return max(8, (rp // 8) * 8)


def fused_ldiv_auto(
    ops: Optional[LdivOps],
    stream_perm, stream_lu, xw,
    *,
    interpret: bool = False,
):
    """Route through the fused kernel, paging the solution panel in
    R-strips when the full ``(P, Rp, cs)`` panel exceeds VMEM
    (VERDICT r3 #3: n=90k-wide factor spaces fit only R ≤ 8 per
    invocation — strip paging keeps R=16-64 on the fused path instead of
    the ~10x-slower XLA level scan).

    The solve is independent per RHS column, so strips are exact; the
    cost is re-streaming the tile pages once per strip — the stream is
    the dominant HBM traffic, so S strips cost ~S x one solve, still far
    under the XLA engine. Returns the solved carrier or None when the
    fused kernel cannot serve even an 8-wide strip (caller falls back)."""
    if ops is None:
        return None
    R = xw.shape[-1]
    if supports_fused_ldiv(ops, R):
        return pallas_fused_ldiv(ops, stream_perm, stream_lu, xw,
                                 interpret=interpret)
    Rs = max_fused_rhs(ops)
    if Rs == 0:
        return None
    outs = [
        pallas_fused_ldiv(ops, stream_perm, stream_lu,
                          xw[..., i:min(i + Rs, R)], interpret=interpret)
        for i in range(0, R, Rs)
    ]
    return jnp.concatenate(outs, axis=-1)


def _pack_meta(ops: LdivOps) -> np.ndarray:
    """One int32 per slot: acc (bit 0) | delta (bits 1-8) | lo (9-17) |
    hi (18-26). Keeps the scalar-prefetch SMEM footprint at 3 words per
    slot (the shift-op scalars as separate arrays doubled it and pushed
    large plans off the fused path at n ~ 90k)."""
    assert ops.cs <= 256
    return (ops.acc | (ops.delta << 1) | (ops.lo << 9)
            | (ops.hi << 18)).astype(np.int32)


def _kernel(
    src_ref, dst_ref, meta_ref,   # scalar prefetch (Npad,) each; meta =
                                  # acc | delta<<1 | lo<<9 | hi<<18
    kind_ref, off_ref,            # scalar prefetch (NPAGES,) each
    in_hbm,        # (KA+1, Rp, cs) HBM — scaled, blocked, transposed RHS
    sperm_hbm,     # (N8, cs, cs) int8 HBM — transposed perm tile stream
    slu_hbm,       # (N32, cs, cs) f32 HBM — transposed L/U tile stream
    out_hbm,       # (KA+1, Rp, cs) HBM
    x,             # (P, Rp, cs) VMEM — unified input/factor/output panel
    pages8, pages32,  # VMEM ring buffers, one per stream
    io_sem, sem8, sem32,
    *,
    NPAGES: int,
    KA: int,
    OUT0: int,
):
    # int32 explicitly: under jax_enable_x64 program_id is int64, which
    # poisons every downstream index with i64 converts Mosaic can't lower
    # (the mixed-precision f64 tier runs this f32 kernel in an x64 process)
    pg = pl.program_id(0).astype(jnp.int32)

    def perm_dma(q):
        off = off_ref[q]
        return pltpu.make_async_copy(
            sperm_hbm.at[pl.ds(off * PAGE, PAGE)],
            pages8.at[off % 2],
            sem8.at[off % 2],
        )

    def lu_dma(q):
        off = off_ref[q]
        return pltpu.make_async_copy(
            slu_hbm.at[pl.ds(off * PAGE, PAGE)],
            pages32.at[off % 2],
            sem32.at[off % 2],
        )

    def start_dma(q):
        @pl.when(kind_ref[q] == 0)
        def _():
            perm_dma(q).start()

        @pl.when(kind_ref[q] == 1)
        def _():
            lu_dma(q).start()

    @pl.when(pg == 0)
    def _():
        start_dma(0)
        x[:] = jnp.zeros_like(x)
        cp = pltpu.make_async_copy(
            in_hbm, x.at[pl.ds(0, KA + 1)], io_sem
        )
        cp.start()
        cp.wait()

    @pl.when(pg + 1 < NPAGES)
    def _():
        start_dma(pg + 1)

    def op_loop(tiles_of):
        # groups of GROUP_MM independent ops (the emitter pads every
        # dependency wave to GROUP_MM): gather the sources, one batched
        # matmul, then sequential accumulate-writes (correct for
        # same-dst ops within a group)
        for g in range(0, PAGE, GROUP_MM):
            xs = jnp.stack(
                [x[src_ref[pg * PAGE + g + j]] for j in range(GROUP_MM)]
            )
            y = jax.lax.dot_general(
                xs, tiles_of(g),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            for j in range(GROUP_MM):
                i = pg * PAGE + g + j
                d = dst_ref[i]
                a = meta_ref[i] & 1
                x[d] = y[j].astype(x.dtype) + a.astype(x.dtype) * x[d]

    slot = off_ref[pg] % 2

    @pl.when(kind_ref[pg] == 0)
    def _():
        perm_dma(pg).wait()
        op_loop(
            lambda g: pages8[slot, g:g + GROUP_MM].astype(jnp.float32)
        )

    @pl.when(kind_ref[pg] == 1)
    def _():
        lu_dma(pg).wait()
        # bf16 streams widen on the VPU after the DMA lands, exactly like
        # the int8 perm pages (astype is a no-op for f32 streams)
        op_loop(
            lambda g: pages32[slot, g:g + GROUP_MM].astype(jnp.float32)
        )

    @pl.when(kind_ref[pg] == 2)
    def _():
        # shift ops: pure VPU data movement, no tile DMA, no MXU —
        # X[dst] = mask(lo,hi) * roll(X[src], delta, lanes) + acc * X[dst].
        # Grouped like the matmul ops (all reads, then independent rolls,
        # then writes): a strictly serial per-op loop serializes on the
        # dynamic VMEM accesses (~83 ns/op measured); grouping restores
        # instruction-level parallelism. The emitter's phase structure
        # guarantees a group never reads a block it also writes (perm
        # phases read one panel space and write another).
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[1], x.shape[2]), 1
        )
        for g in range(0, PAGE, GROUP_SHIFT):
            xs = [x[src_ref[pg * PAGE + g + j]] for j in range(GROUP_SHIFT)]
            ys = []
            for j in range(GROUP_SHIFT):
                i = pg * PAGE + g + j
                meta = meta_ref[i]
                r = pltpu.roll(xs[j], (meta >> 1) & 255, 1)
                m = (lane >= ((meta >> 9) & 511)) & (lane < (meta >> 18))
                ys.append(jnp.where(m, r, jnp.zeros_like(r)))
            for j in range(GROUP_SHIFT):
                i = pg * PAGE + g + j
                d = dst_ref[i]
                a = meta_ref[i] & 1
                x[d] = ys[j] + a.astype(x.dtype) * x[d]

    @pl.when(pg == NPAGES - 1)
    def _():
        cp = pltpu.make_async_copy(
            x.at[pl.ds(OUT0, KA + 1)], out_hbm, io_sem
        )
        cp.start()
        cp.wait()


def pallas_fused_ldiv(
    ops: LdivOps,
    stream_perm: jax.Array,  # (N8, cs, cs) int8 from build_perm_stream
    stream_lu: jax.Array,    # (N32, cs, cs) f32 from build_lu_stream
    xw: jax.Array,           # (KA+1, cs, R) chunk-blocked SCALED rhs
    *,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused solve; returns the solved ``(KA+1, cs, R)`` carrier.

    Contract: only rows ``< n`` of the flattened carrier are defined.
    Because the output space aliases the dead input space (first-write
    SETs), carrier rows never touched by the un-pivot — rows past ``n``
    in the last real block and the whole dummy block — retain stale
    scaled-RHS values rather than zeros. Slice with ``unblock_rhs(xw, n)``
    (as every in-tree caller does) before consuming; never psum or
    residual the padded blocked form directly."""
    KA, cs = ops.KA, ops.cs
    R = xw.shape[-1]
    Rp = _rp(R)
    dtype = xw.dtype
    xt = xw.transpose(0, 2, 1)  # (KA+1, R, cs)
    if Rp != R:
        xt = jnp.pad(xt, ((0, 0), (0, Rp - R), (0, 0)))
    NPAGES = ops.n_pages
    if stream_perm.shape[0] == 0:
        # all perm tiles became shift ops: keep a one-page placeholder —
        # the DMA slice must stay in bounds at TRACE time even though no
        # kind-0 page ever runs it
        stream_perm = jnp.zeros((PAGE, cs, cs), jnp.int8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(NPAGES,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xt (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # perm stream (HBM)
            pl.BlockSpec(memory_space=pl.ANY),  # L/U stream (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((ops.panel_blocks, Rp, cs), dtype),
            pltpu.VMEM((2, PAGE, cs, cs), jnp.int8),
            # L/U ring buffer in the STREAM dtype (bf16 halves its pages)
            pltpu.VMEM((2, PAGE, cs, cs), stream_lu.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, NPAGES=NPAGES, KA=KA, OUT0=ops.out_base
    )
    from ..utils.x64 import x64_off

    with x64_off():  # 32-bit kernel trace inside x64 processes
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((KA + 1, Rp, cs), dtype),
            input_output_aliases={5: 0},  # xt buffer reused as output
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(
            jnp.asarray(ops.src),
            jnp.asarray(ops.dst),
            jnp.asarray(_pack_meta(ops)),
            jnp.asarray(ops.page_kind),
            jnp.asarray(ops.page_off),
            xt,
            stream_perm,
            stream_lu,
        )
    return out[:, :R, :].transpose(0, 2, 1)
