"""Pure device-time profiling of dyn-step parts via in-jit fori_loop.

Each part is timed as jit(fori_loop(N, body)) with the part's output fed
back into its input — ONE dispatch, so tunnel per-call artifacts vanish and
the number is the device throughput. (Wall-clock benchmarking of the real
chained driver loop lives in bench.py; this tool is for attribution.)
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.fv import cd_pallas as cdp
from cam_nor_physics_tpu.models.fv.cd_core import cd_step
from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run, te_map, trac2d
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                       hs_initial_state)
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.utils.config import FVConfig

dtype = jnp.float32
im, jm, km = 144, 96, 26
grid = make_grid(im, jm, km)
coord = hybrid_coefficients(km)
phis = jnp.zeros((jm, im), dtype)
dt = 1800.0
state = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)
N = 50


def devtime(name, body, init):
    f = jax.jit(lambda x0, grid, phis, coord: jax.lax.fori_loop(
        0, N, lambda i, x: body(x, grid, phis, coord), x0))
    o = f(init, grid, phis, coord)
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    o = f(init, grid, phis, coord)
    np.asarray(jax.tree_util.tree_leaves(o)[0])
    dt_ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:22s} {dt_ms:8.3f} ms/iter (device)", file=sys.stderr)


def cd_body(up):
    def body(s, grid, phis, coord):
        s2, d = cd_step(s, grid, coord.ptop, phis, 450.0, c_sw_pgf=True,
                        del2_velocity=6e5, use_pallas=up)
        return s2
    return body


devtime("cd_step fused", cd_body(True), state)
devtime("cd_step xla", cd_body(False), state)

s1, d1 = jax.jit(lambda s, g, p: cd_step(s, g, coord.ptop, p, 450.0,
                                         c_sw_pgf=True, del2_velocity=6e5,
                                         use_pallas=True))(state, grid, phis)


def tr_body(s, grid, phis, coord):
    qn, dpn = trac2d(s.q, s.delp, d1["cx"], d1["cy"], d1["mfx"], d1["mfy"],
                     grid, 4, 4)
    return s.replace(q=qn)


devtime("trac2d", tr_body, state)


def te_body(s, grid, phis, coord):
    return te_map(s, coord, grid, coord.ptop, kord=4, consv=False)


devtime("te_map", te_body, s1)


def dyn_body(s, grid, phis, coord):
    s = dyn_run(s, grid, coord, phis, FVConfig(use_pallas=True), dt)
    return hs_forcing(s, grid, coord.ptop, dt)


devtime("dyn_step full", dyn_body, state)
