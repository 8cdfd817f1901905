"""Block-one-hot permutation apply (MXU-friendly vector permutation).

The reference's ldiv applies a row permutation + scaling before the solves
and a column un-permutation after (src/SharedMemSparseLU.jl:324-339) —
O(n) pointer chasing on CPU. On TPU an arbitrary row-gather lowers to a
serialized per-row loop (~130ns/row — measured 1.3ms for n=10k, more than
an entire triangular solve), so instead we express the permutation as a
block-sparse matrix of one-hot ``cs x cs`` tiles applied with one batched
matmul:

    out[k] = sum_s  T[k, s] @ v[src[k, s]]        (einsum, MXU)

where dest chunk ``k`` draws from at most ``S`` source chunks. For banded
matrices S == 1 (the permutation is block-local); for Poisson/COLAMD
S ~ 17. Tiles are stored int8 (they are 0/1) and cast at use; row scaling
``Rs[p]`` is applied as a separate elementwise multiply so tiles stay
value-independent (a refactorization changes Rs but never the tiles).

Operates directly on the chunk-blocked carrier ``(K+1, cs, R)`` used by
the solve engines, so permute → lsolve → rsolve → unpermute chains with
no layout changes. Falls back to a plain gather when S exceeds
``max_fanin`` (hostile permutations would need K tiles per chunk).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PermPlan", "build_perm_plan", "apply_perm"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PermPlan:
    """Static block-one-hot representation of ``out[i] = v[perm[i]]``."""

    K: int
    cs: int
    S: int
    src: jax.Array    # (K, S) int32 source chunk ids, K = dummy (zero block)
    tiles: jax.Array  # (K, S, cs, cs) int8 one-hot
    # None, or the original index map for the gather fallback
    gather_idx: Optional[jax.Array] = None

    def tree_flatten(self):
        return (self.src, self.tiles, self.gather_idx), (self.K, self.cs, self.S)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], aux[2], *children)


def build_perm_plan(
    perm: np.ndarray, n: int, cs: int, *, max_fanin: int = 32
) -> PermPlan:
    """Build the plan for ``out[i] = v[perm[i]]`` on the blocked carrier.

    ``perm`` has length n; rows past n (padding lanes) map to zero (they
    read the dummy chunk)."""
    K = -(-n // cs)
    perm = np.asarray(perm, dtype=np.int64)
    i = np.arange(n, dtype=np.int64)
    dst_chunk = i // cs
    src_chunk = perm // cs
    # group source chunks per destination chunk
    pairs = np.unique(dst_chunk * np.int64(K + 1) + src_chunk)
    pk = pairs // (K + 1)
    ps = pairs % (K + 1)
    counts = np.bincount(pk, minlength=K)
    S = int(counts.max()) if K else 1
    if S > max_fanin:
        return PermPlan(
            K=K, cs=cs, S=S,
            src=jnp.zeros((0,), jnp.int32),
            tiles=jnp.zeros((0,), jnp.int8),
            gather_idx=jnp.asarray(perm.astype(np.int32)),
        )
    src = np.full((K, S), K, dtype=np.int32)
    slot_of = {}
    fill = np.zeros(K, dtype=np.int64)
    for a in range(pairs.shape[0]):
        k, s = int(pk[a]), int(ps[a])
        src[k, fill[k]] = s
        slot_of[(k, s)] = fill[k]
        fill[k] += 1
    tiles = np.zeros((K, S, cs, cs), dtype=np.int8)
    slot = np.array([slot_of[(int(k), int(s))] for k, s in zip(dst_chunk, src_chunk)],
                    dtype=np.int64)
    tiles[dst_chunk, slot, i % cs, perm % cs] = 1
    return PermPlan(
        K=K, cs=cs, S=S,
        src=jnp.asarray(src),
        tiles=jnp.asarray(tiles),
        gather_idx=None,
    )


def apply_perm(plan: PermPlan, xw: jax.Array) -> jax.Array:
    """Apply to chunk-blocked ``xw (K+1, cs, R)`` → ``(K+1, cs, R)``."""
    K, cs = plan.K, plan.cs
    if plan.gather_idx is not None:
        # hostile permutation: plain row gather on the flat view
        R = xw.shape[-1]
        flat = xw[:K].reshape(K * cs, R)
        out = flat[plan.gather_idx]
        pad = K * cs - out.shape[0]
        out = jnp.pad(out, ((0, pad + cs), (0, 0)))
        return out.reshape(K + 1, cs, R)
    gathered = xw[plan.src]                       # (K, S, cs, R)
    t = plan.tiles.astype(xw.dtype)
    out = jnp.einsum(
        "ksij,ksjr->kir", t, gathered,
        preferred_element_type=xw.dtype,
    )
    return jnp.concatenate([out, jnp.zeros_like(xw[:1])], axis=0)
