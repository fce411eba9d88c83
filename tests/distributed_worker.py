"""Worker for tests/test_distributed.py::test_two_process_step_equivalence.

Run as: python distributed_worker.py <pid> <nprocs> <port> <outdir>

Each process brings 4 virtual CPU devices (8 global over 2 processes),
rendezvouses through jax.distributed, builds its OWN latitude rows of a
Held-Suarez state via parallel.distributed.host_local_state (no host ever
materializes the global state), runs one jitted dyn_run step over the
GLOBAL ('y','x') mesh, and saves the rows its devices own to <outdir>.
The parent compares the reassembled result against a single-process run.
"""

import os
import sys

pid, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
# force exactly 4 local devices, replacing any inherited count (the pytest
# parent runs with 8)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cam_nor_physics_tpu.parallel.distributed import (  # noqa: E402
    ensure_initialized, global_mesh, host_local_state)

multi = ensure_initialized(coordinator=f"localhost:{port}",
                           num_processes=nprocs, process_id=pid)
assert multi, "expected a multi-process runtime"
assert jax.process_count() == nprocs
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

mesh = global_mesh(x_shards=1)

from cam_nor_physics_tpu.models.fv.grid import make_grid  # noqa: E402
from cam_nor_physics_tpu.models.fv.held_suarez import (  # noqa: E402
    hs_initial_state)
from cam_nor_physics_tpu.models.fv.vertical import (  # noqa: E402
    hybrid_coefficients)
from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run  # noqa: E402
from cam_nor_physics_tpu.utils.config import FVConfig  # noqa: E402

im, jm, km = 24, 16, 4
grid = make_grid(im, jm, km)
coord = hybrid_coefficients(km)
phis = jnp.zeros((jm, im))
cfg = FVConfig(nsplit=2, nspltrac=1)

# deterministic global IC; each process extracts only its rows
full = hs_initial_state(grid, coord, pert=1.0, dtype=jnp.float64)


def make_local(pidx, pcount):
    rows = jm // pcount
    lo = pidx * rows

    def rowslice(a):
        a = np.asarray(a)
        # dycore leaves are (..., jm, im) or (..., jm±1, im) staggers; only
        # exact-jm axes are sharded (field_spec), matching this slice rule
        if a.ndim >= 2 and a.shape[-2] == jm:
            return a[..., lo:lo + rows, :]
        return a

    return jax.tree.map(rowslice, full)


def gshape(leaf, pidx, pcount):
    a = np.asarray(leaf)
    if a.ndim >= 2 and a.shape[-2] == jm // pcount:
        return a.shape[:-2] + (jm, a.shape[-1])
    return a.shape


state = host_local_state(mesh, make_local, gshape)

step = jax.jit(lambda s: dyn_run(s, grid, coord, phis, cfg, 1800.0,
                                 filter_impl="matmul"))
out = step(state)
jax.block_until_ready(out)

# save the rows this process' devices own, tagged with their global offset
payload = {}
for name, leaf in (("delp", out.delp), ("pt", out.pt), ("u", out.u),
                   ("v", out.v)):
    for s in leaf.addressable_shards:
        lo = s.index[-2].start or 0
        payload[f"{name}_{lo:03d}"] = np.asarray(s.data)
np.savez(os.path.join(outdir, f"worker_{pid}.npz"), **payload)
print("WORKER_OK", pid)
