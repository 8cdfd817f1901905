"""Pallas dense-tile LU kernel (no pivoting) for the device refactorization.

The blocked right-looking refactorization (refactor.py) is sequential in
exactly one place that XLA executes terribly: the rank-1 elimination loop
over the diagonal tile's columns. As XLA ops inside a scan each of the
``cs`` iterations costs ~25us (dynamic-update-slice round trips through
HBM); inside a Pallas kernel the tiles live in VMEM/registers and the same
loop runs at sub-microsecond per iteration.

The kernel factors a BATCH of ``cs x cs`` tiles in place into merged L\\U
(strict lower = L, upper incl. diagonal = U, unit diagonal implicit) —
identical math to ``refactor._lu_nopivot``. Batching is the point: the
level-parallel elimination (refactor.py) factors every diagonal tile of a
level in ONE kernel, so the serial column loop's cost is paid per LEVEL,
not per chunk (VPU ops advance the whole batch per instruction).
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


def supports_lu_tile(cs: int, batch: int = 1) -> bool:
    fits = 2 * batch * cs * cs * 4 <= _VMEM_BUDGET
    return jax.default_backend() == "tpu" and cs % 128 == 0 and fits


def _kernel(d_ref, out_ref):
    cs = d_ref.shape[-1]
    # mask-based formulation: Mosaic has no dynamic_slice on values, so
    # row/column i are extracted with masked reductions (VPU ops); masks
    # broadcast over the batch dimension
    ridx = lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    cidx = lax.broadcasted_iota(jnp.int32, (cs, cs), 1)

    def step(i, D):
        # everything stays >=2D (TPU vregs): row i as (..., 1, cs),
        # column i as (..., cs, 1)
        urow = jnp.sum(jnp.where(ridx == i, D, 0.0), axis=-2, keepdims=True)
        col = jnp.sum(jnp.where(cidx == i, D, 0.0), axis=-1, keepdims=True)
        piv = jnp.sum(
            jnp.where(cidx[:1, :] == i, urow, 0.0), axis=-1, keepdims=True
        )
        l = jnp.where(ridx[:, :1] > i, col / piv, 0.0)     # (..., cs, 1)
        urow_m = jnp.where(cidx[:1, :] > i, urow, 0.0)     # (..., 1, cs)
        D = D - l * urow_m
        # store multipliers into column i's strictly-lower part
        return jnp.where((cidx == i) & (ridx > i), l, D)

    out_ref[:] = lax.fori_loop(0, cs, step, d_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def lu_tile(D: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Factor ``(..., cs, cs)`` tiles into merged L\\U in VMEM."""
    from ..utils.x64 import x64_off_for

    with x64_off_for(D.dtype):  # 32-bit trace for 4-byte kernels only
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct(D.shape, D.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(D)
