"""Pallas dense-tile LU kernel (no pivoting) for the device refactorization.

The blocked right-looking refactorization (refactor.py) is sequential in
exactly one place that XLA executes terribly: the rank-1 elimination loop
over the diagonal tile's columns. As XLA ops inside a scan each of the
``cs`` iterations costs ~25us (dynamic-update-slice round trips through
HBM); inside a Pallas kernel the tiles live in VMEM/registers.

The kernel factors a BATCH of ``cs x cs`` tiles in place into merged L\\U
(strict lower = L, upper incl. diagonal = U, unit diagonal implicit) —
identical math to ``refactor._lu_nopivot``. Batching is the point: the
level-parallel elimination (refactor.py) factors every diagonal tile of a
level in ONE kernel, so the serial column loop's cost is paid per LEVEL,
not per chunk (VPU ops advance the whole batch per instruction).

Blocked-panel formulation (measured 18.4us -> ~4us per 128x128 tile on
v5e): the naive masked rank-1 loop touches all cs*cs elements every one
of its cs steps. Instead the tile is processed in ``_NB``-column panels:
the serial rank-1 steps run on the panel only (cs x _NB elements, 8x
less data per step at cs=128), and each panel finishes with two MXU
matmuls (the U12 triangular solve via an exact nilpotent-series inverse,
and the rank-_NB trailing Schur update). The tile is held TRANSPOSED so
a column panel of D is a row (sublane) slice — lane-dimension slicing at
sub-128 widths forces Mosaic relayouts, sublane slicing is free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lu_tile", "supports_lu_tile"]

_VMEM_BUDGET = 10 * 1024 * 1024
_NB = 16  # panel width: 2 f32 sublane groups; nilpotent series terminates


def supports_lu_tile(cs: int, batch: int = 1) -> bool:
    fits = 4 * batch * cs * cs * 4 <= _VMEM_BUDGET
    return jax.default_backend() == "tpu" and cs % 128 == 0 and fits


def _mm(a, b):
    """Batched (B, m, k) @ (B, k, n) in full f32 on the MXU."""
    return lax.dot_general(
        a, b,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _unit_lower_invT(S):
    """inv(L11^T) for merged factors S: L11 unit lower, so L11^T = I + M
    with M = tril(S, -1)^T nilpotent; inv = (I-M)(I+M^2)(I+M^4)(I+M^8),
    exact at _NB = 16."""
    eye = jnp.eye(_NB, dtype=S.dtype)[None]
    X = -jnp.swapaxes(jnp.tril(S, -1), -1, -2)
    inv = eye + X
    for _ in range(3):
        X = _mm(X, X)
        inv = _mm(inv, eye + X)
    return inv


def _upper_invT(S):
    """inv(U11^T) for merged factors S: U11^T = tril(S^T) non-unit.
    Scale out the diagonal, run the same exact nilpotent series."""
    eye = jnp.eye(_NB, dtype=S.dtype)[None]
    T = jnp.swapaxes(jnp.triu(S), -1, -2)          # lower, non-unit
    d = jnp.sum(T * eye, axis=-1, keepdims=True)   # (B, _NB, 1) diagonal
    dinv = 1.0 / d
    X = -jnp.tril(T, -1) * jnp.swapaxes(dinv, -1, -2)  # N scaled by cols
    inv = eye + X
    for _ in range(3):
        X = _mm(X, X)
        inv = _mm(inv, eye + X)
    return inv * dinv                              # rows scaled by 1/d


def _kernel(d_ref, out_ref, e_ref):
    cs = d_ref.shape[-1]
    # work on E = D^T (scratch ref): a column panel of D is a SUBLANE
    # slice of E — Mosaic lowers static-slice ref loads/stores, and
    # sublane slicing avoids the relayouts lane slicing would force
    e_ref[:] = jnp.swapaxes(d_ref[:], -1, -2)

    sub = lax.broadcasted_iota(jnp.int32, (_NB, _NB), 0)
    lane = lax.broadcasted_iota(jnp.int32, (_NB, _NB), 1)

    for p0 in range(0, cs, _NB):
        hi = p0 + _NB
        # 1) factor the _NBx_NB diagonal block with the rank-1 loop —
        #    the ONLY serial part, and it touches 16x16 elements per
        #    step instead of the whole tile (this was the entire cost
        #    of the old whole-tile formulation)
        S = jnp.swapaxes(e_ref[:, p0:hi, p0:hi], -1, -2)  # natural D11

        def step(i, S):
            urow = jnp.sum(
                jnp.where(sub == i, S, 0.0), axis=-2, keepdims=True
            )                                                  # (B, 1, _NB)
            col = jnp.sum(
                jnp.where(lane == i, S, 0.0), axis=-1, keepdims=True
            )                                                  # (B, _NB, 1)
            piv = jnp.sum(
                jnp.where(lane[:1, :] == i, urow, 0.0),
                axis=-1, keepdims=True,
            )                                                  # (B, 1, 1)
            l = jnp.where(sub[:, :1] > i, col / piv, 0.0)
            urow_m = jnp.where(lane[:1, :] > i, urow, 0.0)
            S = S - l * urow_m
            return jnp.where((lane == i) & (sub > i), l, S)

        S = lax.fori_loop(0, _NB, step, S)
        e_ref[:, p0:hi, p0:hi] = jnp.swapaxes(S, -1, -2)
        if hi < cs:
            # 2) panel solves + trailing Schur update: all MXU matmuls
            LinvT = _unit_lower_invT(S)
            UinvT = _upper_invT(S)
            # U12 = L11^-1 A12  ->  U12^T = A12^T @ (L11^-1)^T
            U12T = _mm(e_ref[:, hi:, p0:hi], LinvT)   # (B, TR, _NB)
            # L21 = A21 U11^-1  ->  L21^T = (U11^-1)^T @ A21^T
            L21T = _mm(UinvT, e_ref[:, p0:hi, hi:])   # (B, _NB, TR)
            e_ref[:, hi:, p0:hi] = U12T
            e_ref[:, p0:hi, hi:] = L21T
            # trailing: D[r>hi, c>hi] -= L21 @ U12 (one MXU matmul)
            e_ref[:, hi:, hi:] = e_ref[:, hi:, hi:] - _mm(U12T, L21T)

    out_ref[:] = jnp.swapaxes(e_ref[:], -1, -2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lu_tile(D: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Factor ``(..., cs, cs)`` tiles into merged L\\U in VMEM."""
    shape = D.shape
    cs = shape[-1]
    D3 = D.reshape(-1, cs, cs)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(D3.shape, D3.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(D3.shape, D3.dtype)],
        interpret=interpret,
    )(D3)
    return out.reshape(shape)
