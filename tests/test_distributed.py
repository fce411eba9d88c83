"""Multi-host glue (parallel/distributed.py) on the virtual 8-device mesh:
single-process no-op init, global mesh construction, host-local assembly."""

import jax
import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.parallel.distributed import (ensure_initialized,
                                                      global_mesh,
                                                      host_local_state)


def test_single_process_init_is_noop():
    assert ensure_initialized() is False       # no coordinator configured
    assert jax.process_count() == 1


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("y", "x")


def test_host_local_state_assembles_global_arrays():
    mesh = global_mesh()
    km, jm, im = 3, 16, 12

    def make_local(pidx, pcount):
        rows = jm // pcount
        lo = pidx * rows
        block = np.arange(km * jm * im, dtype=np.float32).reshape(km, jm, im)
        return {"delp": block[:, lo:lo + rows, :]}

    def gshape(leaf, pidx, pcount):
        return (km, jm, im)

    out = host_local_state(mesh, make_local, gshape)
    full = np.arange(km * jm * im, dtype=np.float32).reshape(km, jm, im)
    np.testing.assert_array_equal(np.asarray(out["delp"]), full)
    # and it is actually sharded over the mesh
    assert out["delp"].sharding.mesh.shape["y"] == mesh.shape["y"]
