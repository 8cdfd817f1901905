"""Numeric pack: scatter factor nonzeros into dense device tiles.

TPU-native equivalent of the reference's ``fill_chunks!``
(/root/reference/src/SharedMemSparseLU.jl:180-243): where the reference
runs a serial Julia loop scattering CSC nonzeros into per-chunk Julia
matrices, we precompute (host side, in :func:`plan_triangular`) a flat
destination index per nonzero and run the whole pack as one jitted XLA
scatter — so the numeric-only refactorization path (the reference's
``lu!`` → ``fill_chunks!`` at src:274-276) is a single fused device op.

Sign convention matches the reference exactly: diagonal-tile entries are
stored as-is, off-diagonal tiles are stored **negated** so the per-level
update is a pure accumulate (src:204-208, :235-239).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .symbolic import TriPlan

__all__ = ["pack_factor", "pack_factor_np"]


@functools.partial(jax.jit, static_argnames=("K", "T", "cs"))
def _pack(nzval, diag_dest, offdiag_dest, pad_idx, *, K: int, T: int, cs: int):
    dtype = nzval.dtype
    diag_flat = jnp.zeros(((K + 1) * cs * cs,), dtype).at[diag_dest].add(
        nzval, mode="drop"
    )
    diag_flat = diag_flat.at[pad_idx].add(jnp.asarray(1.0, dtype))
    off_flat = jnp.zeros(((T + 1) * cs * cs,), dtype).at[offdiag_dest].add(
        -nzval, mode="drop"
    )
    diag = diag_flat.reshape(K + 1, cs, cs)
    off = off_flat.reshape(T + 1, cs, cs)
    return diag, off


def pack_factor(plan: TriPlan, nzval):
    """Pack a factor's CSC ``nzval`` (device array, CSC order) into
    ``(diag_tiles (K+1, cs, cs), offdiag_tiles (T+1, cs, cs))``.

    Tile ``K`` / ``T`` is the dummy padding slot (identity / zero).
    """
    return _pack(
        jnp.asarray(nzval),
        jnp.asarray(plan.diag_dest),
        jnp.asarray(plan.offdiag_dest),
        jnp.asarray(plan.pad_idx),
        K=plan.K,
        T=plan.T,
        cs=plan.cs,
    )


def pack_factor_np(plan: TriPlan, nzval):
    """NumPy reference implementation of :func:`pack_factor` (for tests)."""
    import numpy as np

    K, T, cs = plan.K, plan.T, plan.cs
    diag = np.zeros(((K + 1) * cs * cs + 1,), dtype=nzval.dtype)
    off = np.zeros(((T + 1) * cs * cs + 1,), dtype=nzval.dtype)
    np.add.at(diag, np.minimum(plan.diag_dest, (K + 1) * cs * cs), nzval)
    np.add.at(off, np.minimum(plan.offdiag_dest, (T + 1) * cs * cs), -nzval)
    diag[plan.pad_idx] += 1.0
    diag = diag[:-1].reshape(K + 1, cs, cs)
    off = off[:-1].reshape(T + 1, cs, cs)
    return diag, off
