"""Worker for the multi-host (multi-process) solve test.

Run as: python _multihost_worker.py <process_id> <num_processes> <port>
Each process owns 2 virtual CPU devices; the cluster solves through
``make_sharded_ldiv(multihost=True)`` on the global mesh and checks the
result against scipy. Prints MULTIHOST_OK on success.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_sparse_lu.parallel.mesh import (  # noqa: E402
    initialize_multihost,
    make_global_mesh,
)

initialize_multihost(f"localhost:{port}", nproc, pid)

import numpy as np  # noqa: E402
import scipy.sparse.linalg as spla  # noqa: E402

from tpu_sparse_lu import ParallelSparseLU  # noqa: E402
from tpu_sparse_lu.models import poisson_2d  # noqa: E402
from tpu_sparse_lu.parallel.sharded_solve import make_sharded_ldiv  # noqa: E402

assert len(jax.devices()) == 2 * nproc, (
    f"global devices {len(jax.devices())} != {2 * nproc}"
)
assert len(jax.local_devices()) == 2

A = poisson_2d(12, 10)
n = A.shape[0]
rng = np.random.default_rng(0)  # identical stream on every process
b = rng.random(n)

F = ParallelSparseLU(A, chunk_size=8)
mesh = make_global_mesh()
solve = make_sharded_ldiv(F, mesh, multihost=True)
x_g = solve(b)
x = np.asarray(x_g.addressable_data(0)).reshape(-1)

x_ref = spla.spsolve(A, b)
err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
assert err < 1e-10, f"proc {pid}: rel err {err}"
print(f"MULTIHOST_OK proc={pid} err={err:.2e}", flush=True)
