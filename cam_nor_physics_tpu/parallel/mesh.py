"""Device mesh + sharding layout for the FV dycore — the TPU-native
replacement of the reference's MPI decomposition machinery.

The reference builds ~20 PILGRIM decompositions, ghost patterns, and transpose
patterns (/root/reference/fv/dynamics_vars.F90:317-723) because its MPI phases
each want a different layout (YZ for horizontal dynamics, XY for vertical
remap/physics). Here ONE resident layout serves the whole step (SURVEY §7.1.1):

  - mesh axes ('y', 'x') over the TPU slice; latitude sharded on 'y',
    longitude optionally on 'x' (keep x=1 so pole closures and the polar FFT
    filter stay chip-local — SURVEY §5.7);
  - (km, jm, im) prognostic fields -> P(None, 'y', 'x'); tracers
    (nq, km, jm, im) -> P(None, None, 'y', 'x');
  - halo exchange, polar-cap sums, and global reductions are inserted by the
    XLA SPMD partitioner from the jnp.roll / sum semantics of the kernels —
    no explicit mp_send4d_ns / parpatterncreate equivalents exist.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, x_shards: int = 1,
              devices=None) -> Mesh:
    """Create a ('y', 'x') mesh. Latitude parallelism on 'y' (the reference's
    P1 strategy, 1-D latitude decomposition), optional longitude on 'x'."""
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if n % x_shards:
        raise ValueError(f"{n} devices not divisible by x_shards={x_shards}")
    import numpy as np
    dev = np.asarray(devices).reshape(n // x_shards, x_shards)
    return Mesh(dev, ('y', 'x'))


def field_spec(ndim: int) -> P:
    """PartitionSpec for a (..., jm, im) field: shard the last two axes."""
    return P(*([None] * (ndim - 2) + ['y', 'x']))


def state_shardings(mesh: Mesh, state):
    """NamedShardings for a DynState-like pytree of (..., jm, im) arrays."""
    return jax.tree.map(
        lambda a: NamedSharding(mesh, field_spec(a.ndim)), state)


def shard_state(state, mesh: Mesh):
    """Place a dycore state pytree onto the mesh with the resident layout."""
    return jax.device_put(state, state_shardings(mesh, state))


def constrain(state, mesh: Mesh):
    """In-jit sharding constraint pinning the resident layout (used at step
    boundaries so XLA keeps the layout stable across scan iterations)."""
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, field_spec(a.ndim))), state)
