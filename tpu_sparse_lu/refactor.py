"""Device-side same-pattern numeric refactorization (static pivots).

The reference's ``lu!(F, A)`` delegates numeric-only refactorization to
UMFPACK, reusing its symbolic analysis
(/root/reference/src/SharedMemSparseLU.jl:245-279). The TPU-native
equivalent keeps the *entire* numeric phase on device:

* Pivot order ``p, q`` is frozen from the first (host) factorization — the
  static-pivot prepass BASELINE.md specifies ("serial pivoting →
  static-pivot symbolic prepass").
* Host side (once): the chunk-grid tile pattern of ``B = (Rs·A)[p, q]`` is
  closed under blocked elimination (tile-level symbolic fill), and every
  per-step tile list (panel rows, panel cols, Schur updates) is emitted as
  a static padded schedule.
* Device side (every refactorization): recompute row scaling ``Rs``
  (UMFPACK recomputes it per-``lu!`` too, src:263), scatter ``A``'s
  nonzeros into the merged tile store, then run blocked right-looking LU as
  a ``lax.scan`` over block steps — each step: dense no-pivot LU of the
  diagonal tile, batched triangular solves for the row/column panels, and
  one batched-matmul Schur complement update (MXU work).

The factored tiles are extracted straight into the solve engine's
(diag, negated-offdiag) layout, so a refactorization feeds subsequent
``ldiv`` calls with zero host traffic.

Accuracy note: no numerical pivoting happens during refactorization (the
point of the static-pivot design); like cuSolverRF/NICSLU-style
refactorization this assumes the new values don't demand a different pivot
order. ``ParallelSparseLU.refactor`` (host path, re-pivoting) remains the
fallback for hostile value changes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax import lax

from .solve import TriKernelData  # noqa: F401  (re-exported for callers)
from .symbolic import TriPlan, plan_triangular

__all__ = ["RefactorPlan", "build_refactor_plan", "refactor_same_pattern"]


# ---------------------------------------------------------------------------
# Host-side symbolic closure + schedule
# ---------------------------------------------------------------------------


def blocked_fill(tiles: set, K: int) -> set:
    """Close a tile pattern under blocked elimination:
    (i,k) and (k,j) present with i,j > k  ⇒  (i,j) present.
    Also guarantees every diagonal tile.

    Uses the C++ core (utils/_symcore) when built — the pure-Python closure
    is the dominant host cost at scale (22s at n=250k, ~0.1s native).
    """
    try:
        from .utils import _symcore

        if tiles:
            br, bc = map(np.asarray, zip(*tiles))
        else:
            br = bc = np.zeros(0, dtype=np.int64)
        r, c = _symcore.blocked_fill(
            br.astype(np.int64), bc.astype(np.int64), K
        )
        return set(zip(r.tolist(), c.tolist()))
    except ImportError:
        pass
    S = set(tiles)
    for k in range(K):
        S.add((k, k))
    # per-step adjacency so each step is O(|rows_k| * |cols_k|), not O(|S|)
    col_of = [[] for _ in range(K)]
    row_of = [[] for _ in range(K)]
    for (i, j) in S:
        if i > j:
            col_of[j].append(i)
        elif i < j:
            row_of[i].append(j)
    for k in range(K):
        rows = list(col_of[k])
        cols = list(row_of[k])
        for i in rows:
            for j in cols:
                if (i, j) not in S:
                    S.add((i, j))
                    if i > j:
                        col_of[j].append(i)
                    else:
                        row_of[i].append(j)
    return S


@dataclasses.dataclass
class RefactorPlan:
    """Static schedule for the device-side blocked refactorization."""

    n: int
    cs: int
    K: int
    TF: int  # number of merged fill tiles (dummy id = TF)
    # per-step padded schedules (dummy tile id TF pads everything)
    diag_id: np.ndarray      # (K,) merged id of diagonal tile k
    row_ids: np.ndarray      # (K, MR) merged ids of L-panel tiles (i, k)
    col_ids: np.ndarray      # (K, MU) merged ids of U-panel tiles (k, j)
    schur: np.ndarray        # (K, MS, 3) (dst, l_tile, u_tile) merged ids
    # input scatter: for each nonzero of A (original CSC order), its flat
    # destination in the merged (TF+1, cs, cs) store, and its original row
    # (for the Rs gather); OOB dest = dropped
    a_dest: np.ndarray       # (nnzA,)
    a_rows: np.ndarray       # (nnzA,)
    pad_idx: np.ndarray      # flat indices of implicit-1.0 padding diagonals
    # extraction maps into the solve plans (built on the same closure)
    l_off_src: np.ndarray    # (TL+1,) merged id per L-solve offdiag tile
    u_off_src: np.ndarray    # (TU+1,) merged id per U-solve offdiag tile
    diag_src: np.ndarray     # (K+1,) merged id per chunk's diagonal tile


def _tile_pattern_of_permuted(
    A: sp.csc_matrix, p: np.ndarray, q: np.ndarray, cs: int
) -> Tuple[set, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile pattern of B = A[p][:, q] plus per-nonzero block coordinates."""
    A = sp.csc_matrix(A)
    n = A.shape[0]
    pinv = np.argsort(p)
    qinv = np.argsort(q)
    rows = A.indices
    cols = np.repeat(np.arange(n, dtype=np.int64), np.diff(A.indptr))
    bi = pinv[rows]  # row in B
    bj = qinv[cols]  # col in B
    ti = bi // cs
    tj = bj // cs
    tiles = set(zip(ti.tolist(), tj.tolist()))
    return tiles, bi, bj, rows, cols


def build_refactor_plan(
    A_pattern: sp.csc_matrix,
    p: np.ndarray,
    q: np.ndarray,
    cs: int,
    solve_lplan: TriPlan,
    solve_uplan: TriPlan,
) -> RefactorPlan:
    """Build the static refactorization schedule.

    ``solve_lplan``/``solve_uplan`` must have been planned on the *same*
    closure pattern (see :func:`closure_solve_plans`), so extraction maps
    line up tile-for-tile.
    """
    n = A_pattern.shape[0]
    K = -(-n // cs)
    tiles, bi, bj, rows, _ = _tile_pattern_of_permuted(A_pattern, p, q, cs)
    S = blocked_fill(tiles, K)

    order = sorted(S)
    tile_id: Dict[Tuple[int, int], int] = {t: i for i, t in enumerate(order)}
    TF = len(order)

    # --- per-step schedules -------------------------------------------------
    rows_at = [[] for _ in range(K)]  # (i, k), i > k
    cols_at = [[] for _ in range(K)]  # (k, j), j > k
    for (i, j) in order:
        if i > j:
            rows_at[j].append(i)
        elif i < j:
            cols_at[i].append(j)
    MR = max((len(r) for r in rows_at), default=1) or 1
    MU = max((len(c) for c in cols_at), default=1) or 1
    schur_at = []
    for k in range(K):
        upd = [
            (tile_id[(i, j)], tile_id[(i, k)], tile_id[(k, j)])
            for i in rows_at[k]
            for j in cols_at[k]
        ]
        schur_at.append(upd)
    MS = max((len(s) for s in schur_at), default=1) or 1

    diag_id = np.array([tile_id[(k, k)] for k in range(K)], dtype=np.int32)
    row_ids = np.full((K, MR), TF, dtype=np.int32)
    col_ids = np.full((K, MU), TF, dtype=np.int32)
    schur = np.full((K, MS, 3), TF, dtype=np.int32)
    for k in range(K):
        for a, i in enumerate(rows_at[k]):
            row_ids[k, a] = tile_id[(i, k)]
        for a, j in enumerate(cols_at[k]):
            col_ids[k, a] = tile_id[(k, j)]
        for a, u in enumerate(schur_at[k]):
            schur[k, a] = u

    # --- input scatter map --------------------------------------------------
    # `order` is lexicographically sorted, so keys are sorted: vectorised
    # id lookup via searchsorted instead of a per-nonzero Python loop.
    sorted_keys = np.array([i * K + j for (i, j) in order], dtype=np.int64)
    t_of_nz = np.searchsorted(
        sorted_keys, (bi // cs) * np.int64(K) + (bj // cs)
    )
    a_dest = (t_of_nz * cs + (bi % cs)) * cs + (bj % cs)
    a_rows = rows.astype(np.int32)

    # --- padding identity ---------------------------------------------------
    tail = n % cs
    pads = []
    if tail:
        kd = tile_id[(K - 1, K - 1)]
        idx = np.arange(tail, cs, dtype=np.int64)
        pads.append((np.int64(kd) * cs + idx) * cs + idx)
    idx = np.arange(cs, dtype=np.int64)
    pads.append((np.int64(TF) * cs + idx) * cs + idx)
    pad_idx = np.concatenate(pads)

    # --- extraction maps into the solve plans ------------------------------
    def off_src(plan: TriPlan) -> np.ndarray:
        src = np.full(plan.T + 1, TF, dtype=np.int32)
        for t in range(plan.T):
            src[t] = tile_id[(int(plan.tile_brow[t]), int(plan.tile_bcol[t]))]
        return src

    diag_src = np.array(
        [tile_id[(k, k)] for k in range(K)] + [TF], dtype=np.int32
    )
    return RefactorPlan(
        n=n,
        cs=cs,
        K=K,
        TF=TF,
        diag_id=diag_id,
        row_ids=row_ids,
        col_ids=col_ids,
        schur=schur,
        a_dest=a_dest,
        a_rows=a_rows,
        pad_idx=pad_idx,
        l_off_src=off_src(solve_lplan),
        u_off_src=off_src(solve_uplan),
        diag_src=diag_src,
    )


def closure_solve_plans(
    A_pattern: sp.csc_matrix,
    factors_L: sp.csc_matrix,
    factors_U: sp.csc_matrix,
    p: np.ndarray,
    q: np.ndarray,
    cs: int,
) -> Tuple[TriPlan, TriPlan]:
    """Solve plans whose tile sets are the blocked closure of the permuted
    input pattern — a superset of the factors' own tile patterns, so both
    the host pack path and the device refactor path feed the same plans."""
    n = A_pattern.shape[0]
    K = -(-n // cs)
    tiles, _, _, _, _ = _tile_pattern_of_permuted(A_pattern, p, q, cs)
    S = blocked_fill(tiles, K)
    extra_lower = [(i, j) for (i, j) in S if i > j]
    extra_upper = [(i, j) for (i, j) in S if i < j]
    lplan = plan_triangular(factors_L, cs, lower=True, extra_tiles=extra_lower)
    uplan = plan_triangular(factors_U, cs, lower=False, extra_tiles=extra_upper)
    return lplan, uplan


# ---------------------------------------------------------------------------
# Device-side numeric phase
# ---------------------------------------------------------------------------


def _lu_nopivot(D: jax.Array) -> jax.Array:
    """Dense no-pivot LU of one cs x cs tile, in place: returns merged
    L\\U (strict lower = L, upper incl. diag = U, unit diag implicit)."""
    cs = D.shape[0]
    ridx = lax.broadcasted_iota(jnp.int32, (cs, 1), 0)[:, 0]

    def step(i, D):
        piv = D[i, i]
        col = D[:, i]
        lower = ridx > i
        l = jnp.where(lower, col / piv, 0.0)
        urow = jnp.where((ridx > i)[None, :].reshape(1, cs), D[i, :], 0.0)
        D = D - l[:, None] * urow
        D = D.at[:, i].set(jnp.where(lower, l, D[:, i]))
        return D

    return lax.fori_loop(0, cs, step, D)


@functools.partial(jax.jit, static_argnames=("cs",))
def _blocked_elimination(tiles, diag_id, row_ids, col_ids, schur, *, cs: int):
    """Right-looking blocked LU over the merged tile store.

    Always full-f32 matmul passes: factorization error compounds into every
    subsequent solve, so bf16 MXU shortcuts are never acceptable here.
    """

    from .ops.pallas_factor import lu_tile, supports_lu_tile
    from .ops.tri_inverse import tri_inverse

    use_pallas_lu = supports_lu_tile(cs)

    def step(carry, xs):
        tiles, min_piv = carry
        dk, rids, cids, sch = xs
        # 1) diagonal tile: dense no-pivot LU (Pallas on TPU — the XLA
        #    rank-1 loop costs ~25us/column; in VMEM it is sub-us)
        if use_pallas_lu:
            D = lu_tile(tiles[dk])
        else:
            D = _lu_nopivot(tiles[dk])
        # static-pivot diagnostic: the smallest |pivot| seen anywhere
        # (UMFPACK would re-pivot here, reference src:247; we detect)
        min_piv = jnp.minimum(min_piv, jnp.min(jnp.abs(jnp.diagonal(D))))
        tiles = tiles.at[dk].set(D)
        # 2/3) panels via explicit triangular inverses (batched matmuls;
        #      triangular_solve substitutes sequentially on TPU)
        Uinv = tri_inverse(jnp.triu(D), lower=False)
        Linv = tri_inverse(D, lower=True, unit=True)
        # row panel: L_ik = A_ik @ U_kk^{-1}
        Arow = tiles[rids]
        X = lax.dot_general(
            Arow, Uinv,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=tiles.dtype,
        )
        tiles = tiles.at[rids].set(X)
        # col panel: U_kj = L_kk^{-1} @ A_kj
        Acol = tiles[cids]
        Y = lax.dot_general(
            jnp.broadcast_to(Linv, Acol.shape), Acol,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=tiles.dtype,
        )
        tiles = tiles.at[cids].set(Y)
        # 4) Schur update: A_ij -= L_ik @ U_kj (batched MXU matmul)
        dst, lt, ut = sch[:, 0], sch[:, 1], sch[:, 2]
        prod = lax.dot_general(
            tiles[lt],
            tiles[ut],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=tiles.dtype,
        )
        tiles = tiles.at[dst].add(-prod)
        return (tiles, min_piv), None

    min_piv0 = jnp.asarray(jnp.inf, tiles.dtype)
    with jax.default_matmul_precision("highest"):
        (tiles, min_piv), _ = lax.scan(
            step, (tiles, min_piv0), (diag_id, row_ids, col_ids, schur)
        )
    return tiles, min_piv


@functools.partial(jax.jit, static_argnames=("n", "cs", "TF"))
def _assemble_input(a_data, a_dest, a_rows, pad_idx, *, n: int, cs: int, TF: int):
    """Rs recompute + scatter of (Rs·A)[p, q] into the merged tile store."""
    absd = jnp.abs(a_data)
    rowmax = jnp.zeros((n,), a_data.dtype).at[a_rows].max(absd)
    rs = jnp.where(rowmax > 0, 1.0 / rowmax, 1.0)
    vals = rs[a_rows] * a_data
    flat = jnp.zeros(((TF + 1) * cs * cs,), a_data.dtype).at[a_dest].add(
        vals, mode="drop"
    )
    flat = flat.at[pad_idx].add(jnp.asarray(1.0, a_data.dtype))
    tiles = flat.reshape(TF + 1, cs, cs)
    return tiles, rs


@functools.partial(jax.jit, static_argnames=("cs",))
def _extract_solve_tiles(tiles, diag_src, l_off_src, u_off_src, *, cs: int):
    """Merged L\\U tiles → solve-engine layout (negated offdiag, split diag).

    The elimination's padded panel/Schur slots write garbage (up to inf)
    into the dummy merged tile by design; scrub the dummy slots here so
    the solve engines see exactly identity / zero (0*inf = nan would
    otherwise leak through the padded batched ops)."""
    eye = jnp.eye(cs, dtype=tiles.dtype)
    diag = tiles[diag_src]
    ldiag = (jnp.tril(diag, -1) + eye[None]).at[-1].set(eye)
    udiag = jnp.triu(diag).at[-1].set(eye)
    loff = (-tiles[l_off_src]).at[-1].set(0.0)
    uoff = (-tiles[u_off_src]).at[-1].set(0.0)
    return ldiag, udiag, loff, uoff


@functools.partial(
    jax.jit,
    static_argnames=("n", "cs", "TF", "tri_mode"),
)
def _refactor_pipeline(a_data, dev, *, n, cs, TF, tri_mode):
    """The WHOLE numeric refactorization as one program: assemble →
    blocked elimination → solve-tile extraction → tile inverses. One
    dispatch per refactorization — through an RPC-tunneled device, eager
    per-op round-trips (~0.7-3 ms each) would otherwise dominate the
    numeric work many times over (measured)."""
    from .ops.tri_inverse import tri_inverse

    tiles, rs = _assemble_input(
        a_data, dev["a_dest"], dev["a_rows"], dev["pad_idx"],
        n=n, cs=cs, TF=TF,
    )
    tiles, min_piv = _blocked_elimination(
        tiles, dev["diag_id"], dev["row_ids"], dev["col_ids"], dev["schur"],
        cs=cs,
    )
    ldiag, udiag, loff, uoff = _extract_solve_tiles(
        tiles, dev["diag_src"], dev["l_off_src"], dev["u_off_src"], cs=cs
    )
    # pivot growth: rows of (Rs·A)[p,q] have max |entry| == 1 after the
    # in-program equilibration, so max |factor entry| IS the growth factor
    growth = jnp.maximum(
        jnp.max(jnp.abs(udiag)),
        jnp.maximum(jnp.max(jnp.abs(loff)), jnp.max(jnp.abs(uoff))),
    )
    out = {"ldiag": ldiag, "udiag": udiag, "loff": loff, "uoff": uoff,
           "rs": rs, "min_pivot": min_piv, "growth": growth}
    if tri_mode in ("inv", "inv_refine"):
        with jax.default_matmul_precision("highest"):
            out["ldiag_inv"] = tri_inverse(ldiag, lower=True)
            out["udiag_inv"] = tri_inverse(udiag, lower=False)
    return out


def refactor_numeric_values(F, a_data: jax.Array) -> None:
    """Refactorize from new nonzero values of A (device array, original
    CSC order). Updates F's device solve state in place."""
    rp: RefactorPlan = F._refactor_plan
    mode = F.config.tri_mode
    dev = F._refactor_dev

    out = _refactor_pipeline(
        jnp.asarray(a_data, dtype=F.dtype), dev,
        n=rp.n, cs=rp.cs, TF=rp.TF, tri_mode=mode,
    )

    def kern(plan, diag, off, dinv):
        from .solve import TriKernelData

        return TriKernelData(
            diag=diag,
            diag_inv=dinv,
            offdiag=off,
            level_chunks=jnp.asarray(plan.level_chunks),
            level_tiles=jnp.asarray(plan.level_tiles),
            tile_brow=jnp.asarray(plan.tile_brow),
            tile_bcol=jnp.asarray(plan.tile_bcol),
        )

    F.ldata = kern(F.plan.lplan, out["ldiag"], out["loff"],
                   out.get("ldiag_inv"))
    F.udata = kern(F.plan.uplan, out["udiag"], out["uoff"],
                   out.get("udiag_inv"))
    # the bidiagonal-band fast path (api._prepare_scan_path) caches factor
    # VALUES; a device refactorization bypasses it until the next re-pack
    F._scan_bands = None
    F._scan_perm_id = False
    # device scalars; synced only when the caller asks (check=True)
    F.refactor_diagnostics = {
        "min_pivot": out["min_pivot"], "growth": out["growth"]
    }
    if F._ldiv_ops is not None:
        # refresh the fused-ldiv L/U tile stream (the int8 perm stream is
        # value-independent and untouched)
        from .ops.pallas_ldiv import build_lu_stream

        F._ldiv_stream_lu = build_lu_stream(
            F._ldiv_gather,
            out["ldiag_inv"], out["loff"],
            out["udiag_inv"], out["uoff"],
            dtype=F.dtype,
        )
    rs = out["rs"]
    # Rs changed; p, q are static. rs is in factor row order == input row
    # order (no gather), except under the nd embedding where it maps back
    # through ext_pos.
    cs = rp.cs
    n_in, K_in = F._n_orig, F._K_in
    rs_in = rs if F._ext is None else rs[jnp.asarray(F._ext["pos"])]
    rs_pad = jnp.zeros((K_in * cs + cs,), F.dtype).at[:n_in].set(
        rs_in.astype(F.dtype)
    )
    F._rs_blk = rs_pad.reshape(K_in + 1, cs, 1)
    # sharded path still uses the permuted vector (eager gather, small)
    F._rs_p_dev = rs[jnp.asarray(F.plan.p)].astype(F.dtype)
    # device array; converted lazily if the host-side .Rs is read
    F._factors.Rs = rs
    # refresh the device copy of A for residuals / iterative refinement
    # (skip under the nd embedding: a_data is factor-space there; the
    # caller refreshes from the original matrix instead)
    if F._ext is None:
        F._a_data_dev = jnp.asarray(a_data, dtype=F.dtype)
        F._spmv_dirty = True


def refactor_same_pattern(F, A: sp.csc_matrix, *, check: bool = False,
                          growth_limit: float = 1e7) -> bool:
    """Entry point used by :meth:`ParallelSparseLU.refactor_numeric`.

    With ``check=True``, syncs the static-pivot diagnostics (min |pivot|,
    pivot growth) after the device refactorization; if the new values broke
    the frozen pivot order (non-finite factors or growth beyond
    ``growth_limit``), falls back to a full host refactorization (which
    re-pivots, like the reference's UMFPACK ``lu!``, src:247). Returns
    True when the device factorization was kept."""
    A = sp.csc_matrix(A)
    A.sort_indices()
    if not F.has_device_refactor:
        F.enable_device_refactor()
    sig = (A.indptr.tobytes(), A.indices.tobytes())
    if sig != F._a_pattern_sig:
        raise ValueError(
            "refactor_numeric requires the same sparsity pattern as the "
            "matrix this factorization was built from; use refactor() for "
            "pattern changes (reference src:265-273 reallocate path)"
        )
    data = A.data if F._ext is None else F._ext_values(A)
    refactor_numeric_values(F, data)
    if F._ext is not None:
        F._a_data_dev = jnp.asarray(A.data, dtype=F.dtype)
        F._spmv_dirty = True
    if check:
        d = F.refactor_diagnostics
        growth = float(d["growth"])
        min_piv = float(d["min_pivot"])
        if not np.isfinite(growth) or growth > growth_limit or min_piv == 0.0:
            F.refactor(A)  # host path: re-pivots
            return False
    return True
