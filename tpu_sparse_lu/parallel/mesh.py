"""Device-mesh helpers.

The reference's (latent) parallel substrate is MPI-3 shared-memory windows —
exported as ``allocate_shared`` but never defined in the snapshot
(/root/reference/src/SharedMemSparseLU.jl:31; SURVEY.md C10). The TPU-native
equivalent of a node-shared window is an HBM-resident array sharded over a
``jax.sharding.Mesh``: one logical array, shards addressable by every
program, with XLA collectives instead of window synchronisation
(SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "allocate_shared"]


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "chunks") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def allocate_shared(
    shape: Sequence[int],
    dtype=jnp.float32,
    *,
    mesh: Optional[Mesh] = None,
    spec: Optional[P] = None,
) -> jax.Array:
    """Allocate a zero array shared across the mesh.

    TPU-native analogue of the reference's exported-but-undefined
    ``allocate_shared`` (src:31): where MPI-3 would hand out a node-local
    shared-memory window, this places one logical zero array in HBM with the
    given ``NamedSharding`` (replicated by default — every chip "sees" the
    whole array, like ranks sharing a window).
    """
    if mesh is None:
        return jnp.zeros(shape, dtype)
    sharding = NamedSharding(mesh, spec if spec is not None else P())
    return jax.device_put(jnp.zeros(shape, dtype), sharding)
