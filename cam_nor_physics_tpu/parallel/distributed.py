"""Multi-host (pod-slice) runtime glue — the DCN side of SURVEY §2.4/§5.8.

The reference runs multi-node through PILGRIM/MPI with explicit communicator
splits and precomputed patterns. TPU-native replacement: one
`jax.distributed.initialize()` per host process (DCN rendezvous), a GLOBAL
('y','x') mesh over all hosts' devices, and host-local array construction for
initial conditions so no single host must materialize the global state.
Collectives ride ICI within a slice and DCN across slices; the XLA SPMD
partitioner plans them from the shardings — no pattern objects.

Single-process usage is unchanged: `ensure_initialized()` is a no-op when
no coordinator is configured, and `global_mesh()` then equals
`mesh.make_mesh()` over the local devices.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import field_spec

_initialized = False


def ensure_initialized(coordinator: str | None = None,
                       num_processes: int | None = None,
                       process_id: int | None = None) -> bool:
    """Initialize jax.distributed once per process.

    On Cloud TPU pods, `jax.distributed.initialize()` auto-discovers the
    coordinator and process topology from the TPU metadata; elsewhere the
    standard JAX env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) or explicit arguments configure the rendezvous. Returns
    True when a multi-process runtime is active, False for single-process
    (in which case this is a no-op — the single-host path stays untouched).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if coordinator or num or on_pod:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num) if num else None,
            process_id=int(process_id) if process_id is not None else None)
    _initialized = True
    return jax.process_count() > 1


def global_mesh(x_shards: int = 1) -> Mesh:
    """('y', 'x') mesh over ALL devices in the job (every host's chips).

    Device order follows jax.devices(), which JAX guarantees is consistent
    across processes; latitude strips map to contiguous device rows so the
    N-S halo exchanges stay nearest-neighbor on the ICI torus within a host
    and cross DCN only at slice boundaries (the reference's P1 strategy at
    pod scale)."""
    devices = jax.devices()
    n = len(devices)
    if n % x_shards:
        raise ValueError(f"{n} devices not divisible by x_shards={x_shards}")
    dev = np.asarray(devices).reshape(n // x_shards, x_shards)
    return Mesh(dev, ("y", "x"))


def host_local_state(mesh: Mesh, make_local, global_shape_of) -> object:
    """Assemble a globally-sharded pytree without any host materializing the
    whole state (the reference's read_inidat scatter role, PIO equivalent).

    `make_local(lo, hi)` -> pytree of host-local latitude rows [lo, hi) with
    the same structure the model uses; `global_shape_of(leaf_local, lo, hi)`
    -> the global shape of that leaf. Uses
    jax.make_array_from_process_local_data so each process only provides the
    rows its devices own."""
    pidx, pcount = jax.process_index(), jax.process_count()

    def build(local_leaf, gshape):
        sharding = NamedSharding(mesh, field_spec(len(gshape)))
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(local_leaf), gshape)

    # one contiguous latitude block per process (jm divisible by process
    # count is the caller's contract, mirroring the lat-strip decomposition)
    local = make_local(pidx, pcount)
    shapes = jax.tree.map(lambda leaf: global_shape_of(leaf, pidx, pcount),
                          local)
    return jax.tree.map(build, local, shapes)
