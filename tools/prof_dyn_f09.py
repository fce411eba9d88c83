"""Trustworthy per-phase timings of the dyn step at f09 (288x192x26)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state, hs_forcing
from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run, te_map, trac2d
from cam_nor_physics_tpu.models.fv.cd_core import cd_step
from cam_nor_physics_tpu.utils.config import FVConfig

im, jm, km = 288, 192, 26
grid = make_grid(im, jm, km)
coord = hybrid_coefficients(km)
phis = jnp.zeros((jm, im), jnp.float32)
cfg = FVConfig()
dt = 1800.0
ns, nstrac, nv = cfg.resolved_splits(dt, im, jm)
n2 = (nstrac + nv - 1) // nv
nsplit = (ns + n2 * nv - 1) // (n2 * nv)
dts = dt / (nsplit * n2 * nv)
print(f"ns={ns} nstrac={nstrac} nv={nv} n2={n2} nsplit={nsplit} dts={dts}")

state = hs_initial_state(grid, coord, pert=1.0, dtype=jnp.float32)

def _fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0])

def timeit(name, fn, args, iters=20, chain=False):
    o = fn(*args); _fetch(o)
    o = fn(*args); _fetch(o)
    t0 = time.perf_counter()
    if chain:
        cur = args
        for _ in range(iters):
            cur = fn(*cur)
        _fetch(cur)
    else:
        for _ in range(iters):
            o = fn(*args)
        _fetch(o)
    dt_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt_ms:.2f} ms")
    return o

full = jax.jit(lambda s: (hs_forcing(dyn_run(s, grid, coord, phis, cfg, dt),
                                     grid, coord.ptop, dt),))
timeit("dyn_step full", full, (state,), chain=True)

one_cd = jax.jit(lambda s: (cd_step(
    s, grid, coord.ptop, phis, dts, iord=cfg.iord, jord=cfg.jord,
    dyn_filter=True, c_sw_pgf=cfg.c_sw_pgf, ke_method=cfg.ke_method,
    del2_velocity=cfg.del2coef if cfg.div24del2flag == 42 else 0.0)[0],))
timeit("cd_step (fused banded)", one_cd, (state,), chain=True)

one_cd_x = jax.jit(lambda s: (cd_step(
    s, grid, coord.ptop, phis, dts, iord=cfg.iord, jord=cfg.jord,
    dyn_filter=True, c_sw_pgf=cfg.c_sw_pgf, ke_method=cfg.ke_method,
    del2_velocity=cfg.del2coef if cfg.div24del2flag == 42 else 0.0,
    use_pallas=False)[0],))
timeit("cd_step (xla)", one_cd_x, (state,), chain=True)

_, d = jax.jit(lambda s: cd_step(
    s, grid, coord.ptop, phis, dts, iord=cfg.iord, jord=cfg.jord,
    dyn_filter=True, c_sw_pgf=cfg.c_sw_pgf, ke_method=cfg.ke_method))(state)
tr = jax.jit(lambda q: (trac2d(q, state.delp, d["cx"], d["cy"], d["mfx"],
                               d["mfy"], grid, cfg.iord, cfg.jord)[0],))
timeit("trac2d", tr, (state.q,), chain=True)

te = jax.jit(lambda s: (te_map(s, coord, grid, coord.ptop, kord=cfg.kord,
                               consv=cfg.conserve),))
timeit("te_map", te, (state,), chain=True)
