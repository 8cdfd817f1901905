"""Worker for the multi-host (multi-process) solve test.

Run as: python _multihost_worker.py <process_id> <num_processes> <port>
Each process owns 2 virtual CPU devices; the cluster solves through ALL
THREE mesh engines on the global mesh (VERDICT r3 #8) — the level-striped
psum engine (``make_sharded_ldiv(multihost=True)``), the overlapped halo
pipeline (``make_pipeline_ldiv``, replicated output), and the
fully-distributed pipeline (``replicate=False``) — and checks each
against scipy. Prints MULTIHOST_OK on success.
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

# --- halo pipeline across the process boundary (VERDICT r3 #8) ----------
# banded matrix so the pipeline plan holds on the 2*nproc-device mesh;
# the per-round halo ppermutes cross the gloo process boundary (DCN
# analogue). replicate_to_mesh makes the inputs global like the psum path.
from tpu_sparse_lu import SolverConfig  # noqa: E402
from tpu_sparse_lu.models import block_banded  # noqa: E402
from tpu_sparse_lu.parallel.mesh import replicate_to_mesh  # noqa: E402
from tpu_sparse_lu.parallel.pipeline_solve import make_pipeline_ldiv  # noqa: E402

Ab = block_banded(rng, 32, 8)
nb = Ab.shape[0]
bb = rng.random((nb, 4))
Fb = ParallelSparseLU(Ab, config=SolverConfig(chunk_size=8, tri_mode="inv",
                                              dtype="float64"))
Fb.ldata, Fb.udata, Fb._pperm, Fb._qperm, Fb._rs_blk = replicate_to_mesh(
    (Fb.ldata, Fb.udata, Fb._pperm, Fb._qperm, Fb._rs_blk), mesh
)
xb_ref = spla.spsolve(Ab.tocsc(), bb)

solve_rep = make_pipeline_ldiv(Fb, mesh, micro_panels=2)
assert solve_rep is not None, "pipeline plan rejected the banded factor"
xg = solve_rep(replicate_to_mesh(np.asarray(bb), mesh))
xr = np.asarray(xg.addressable_data(0))
err_rep = np.linalg.norm(xr - xb_ref) / np.linalg.norm(xb_ref)
assert err_rep < 1e-10, f"proc {pid}: pipeline(replicated) err {err_rep}"

solve_sh = make_pipeline_ldiv(Fb, mesh, micro_panels=2, replicate=False)
assert solve_sh is not None
xs_g = solve_sh(replicate_to_mesh(np.asarray(bb), mesh))
# sharded output: gather this process's shards and check their rows
D = 2 * nproc
rows_per = xs_g.shape[0] // D
ok_rows = 0
for sh in xs_g.addressable_shards:
    lo = sh.index[0].start or 0
    blk = np.asarray(sh.data)
    take = min(nb - lo, blk.shape[0])
    if take > 0:
        errs = np.linalg.norm(blk[:take] - xb_ref[lo:lo + take])
        assert errs < 1e-9 * max(1.0, np.linalg.norm(xb_ref)), (
            f"proc {pid}: sharded-output rows [{lo},{lo+take}) err {errs}"
        )
        ok_rows += take
assert ok_rows > 0
print(f"MULTIHOST_OK proc={pid} err={err:.2e} pipe={err_rep:.2e} "
      f"shard_rows={ok_rows}", flush=True)
