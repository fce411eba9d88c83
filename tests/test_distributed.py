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


def test_two_process_step_equivalence(tmp_path):
    """TRUE multi-process path (round-4 VERDICT #8): two OS processes, 4
    virtual CPU devices each, rendezvous via jax.distributed, host-local
    IC assembly, one jitted dyn_run step over the global 8-device mesh —
    reassembled output must match the single-process run of the same step
    to f64 roundoff (the SURVEY §2.4 DCN-path claim)."""
    import socket
    import subprocess
    import sys

    # free TCP port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = str(__import__("pathlib").Path(__file__).parent /
                 "distributed_worker.py")
    env = dict(__import__("os").environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so[-2000:]}\n{se[-3000:]}"
        assert "WORKER_OK" in so

    # single-process reference of the same step
    from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
    from cam_nor_physics_tpu.models.fv.grid import make_grid
    from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
    from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
    from cam_nor_physics_tpu.utils.config import FVConfig

    im, jm, km = 24, 16, 4
    grid = make_grid(im, jm, km)
    coord = hybrid_coefficients(km)
    ref = jax.jit(lambda s: dyn_run(
        s, grid, coord, jnp.zeros((jm, im)), FVConfig(nsplit=2, nspltrac=1),
        1800.0, filter_impl="matmul"))(
            hs_initial_state(grid, coord, pert=1.0, dtype=jnp.float64))

    # reassemble the workers' saved rows and compare
    for name in ("delp", "pt", "u", "v"):
        want = np.asarray(getattr(ref, name))
        got = np.full_like(want, np.nan)
        for i in range(2):
            z = np.load(str(tmp_path / f"worker_{i}.npz"))
            for key in z.files:
                if not key.startswith(name + "_"):
                    continue
                lo = int(key.rsplit("_", 1)[1])
                block = z[key]
                got[..., lo:lo + block.shape[-2], :] = block
        assert np.isfinite(got).all(), f"{name}: unfilled rows"
        # f64 re-fusion envelope: the 2-process SPMD partition compiles a
        # different fusion/collective order than the single-process
        # program (measured max |Δ| ~4e-13 on u)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-11,
                                   err_msg=name)


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
