"""Per-phase profile of the FV dynamics step at the bench configuration.

Phases mirror the reference's t_startf regions (cd_core, trac2d, te_map;
/root/reference/fv/dyn_comp.F90 timer names) so numbers are comparable
across rounds. Run on whatever device JAX exposes.
"""
import time
import sys

import jax
import jax.numpy as jnp

from cam_nor_physics_tpu.models.fv.cd_core import cd_step, pressure_vars
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
cfg = FVConfig()
ndt = 1800.0
ns, nspltrac, nv = cfg.resolved_splits(ndt, im, jm)
n2 = (nspltrac + nv - 1) // nv
nsplit = (ns + n2 * nv - 1) // (n2 * nv)
dt = ndt / (nsplit * n2 * nv)
print(f"splits: nsplit={nsplit} n2={n2} nv={nv} dt_small={dt}",
      file=sys.stderr)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:14s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          file=sys.stderr)
    return out


@jax.jit
def full_step(state):
    state = dyn_run(state, grid, coord, phis, cfg, ndt)
    return hs_forcing(state, grid, coord.ptop, ndt)


state = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)
for _ in range(3):
    state = full_step(state)
jax.block_until_ready(state)

f_cd = jax.jit(lambda st: cd_step(
    st, grid, coord.ptop, phis, dt, iord=cfg.iord, jord=cfg.jord,
    dyn_filter=True, filter_impl="fft", c_sw_pgf=cfg.c_sw_pgf,
    ke_method=cfg.ke_method,
    del2_velocity=cfg.del2coef if cfg.div24del2flag == 42 else 0.0))
st1, d = f_cd(state)

f_tr = jax.jit(lambda q, dp0, d: trac2d(
    q, dp0, d["cx"], d["cy"], d["mfx"], d["mfy"], grid, cfg.iord, cfg.jord))
f_te = jax.jit(lambda st: te_map(st, coord, grid, coord.ptop,
                                 kord=cfg.kord, consv=cfg.conserve))

timeit("cd_step(x1)", f_cd, state)
timeit("trac2d", f_tr, state.q, state.delp, d)
timeit("te_map", f_te, st1)
timeit("dyn+hs full", full_step, state)
