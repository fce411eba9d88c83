"""Within-process interleaved attribution of the dyn step's phases.

Times chained loops of: the full dyn step, a cd-only step (4 small steps,
no trac2d/te_map), cd+trac2d, and te_map alone — interleaved rounds so
tunnel drift cancels. Medians attribute the step budget reliably.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.fv.cd_core import cd_step
from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run, te_map, trac2d
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                       hs_initial_state)
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.utils.config import FVConfig

dtype = jnp.float32
im, jm, km = 144, 96, 26
ITERS = 15
ROUNDS = 5

grid = make_grid(im, jm, km)
coord = hybrid_coefficients(km)
phis = jnp.zeros((jm, im), dtype)
dt = 1800.0
cfg = FVConfig()
ns, nstrac, nv = cfg.resolved_splits(dt, im, jm)
dts = dt / max(ns, 1)


def _fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0])


@jax.jit
def full_step(state, grid, coord, phis):
    s = dyn_run(state, grid, coord, phis, cfg, dt)
    return hs_forcing(s, grid, coord.ptop, dt)


def _cd_loop(state, grid, coord, phis, with_trac):
    dp0 = state.delp
    zx = jnp.zeros_like(dp0)
    acc0 = dict(cx=zx, cy=zx, mfx=zx, mfy=zx)

    def small(carry, _):
        st, acc = carry
        st, d = cd_step(st, grid, coord.ptop, phis, dts, iord=cfg.iord,
                        jord=cfg.jord, c_sw_pgf=True,
                        div2_on=True, del2_velocity=cfg.del2coef)
        acc = {k: acc[k] + d[k] for k in acc}
        return (st, acc), None

    (st, acc), _ = jax.lax.scan(small, (state, acc0), None, length=ns)
    if with_trac:
        qn, _dp = trac2d(st.q, dp0, acc["cx"], acc["cy"], acc["mfx"],
                         acc["mfy"], grid, cfg.iord, cfg.jord)
        st = st.replace(q=qn)
    return hs_forcing(st, grid, coord.ptop, dt)


cd_only = jax.jit(lambda s, g, c, p: _cd_loop(s, g, c, p, False))
cd_trac = jax.jit(lambda s, g, c, p: _cd_loop(s, g, c, p, True))
te_only = jax.jit(lambda s, g, c, p: te_map(
    s, c, g, c.ptop, kord=cfg.kord, consv=cfg.conserve).replace(
        u=s.u, v=s.v))  # keep state shape; winds untouched so loop chains
te_nocv = jax.jit(lambda s, g, c, p: te_map(
    s, c, g, c.ptop, kord=cfg.kord, consv=False).replace(u=s.u, v=s.v))

state0 = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)
for _ in range(3):
    state0 = full_step(state0, grid, coord, phis)
_fetch(state0)

fns = {"full": full_step, "cd_only": cd_only, "cd+trac": cd_trac,
       "te(consv)": te_only, "te(plain)": te_nocv}
warm = {}
for n, f in fns.items():
    warm[n] = f(state0, grid, coord, phis)
    _fetch(warm[n])
    print("compiled", n, file=sys.stderr, flush=True)

res = {n: [] for n in fns}
for r in range(ROUNDS):
    for n, f in fns.items():
        cur = warm[n]
        t0 = time.perf_counter()
        for _ in range(ITERS):
            cur = f(cur, grid, coord, phis)
        _fetch(cur)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        res[n].append(ms)
        print(f"round {r} {n:10s} {ms:6.2f} ms", file=sys.stderr, flush=True)

for n, ts in res.items():
    print(f"{n:10s} median {np.median(ts):6.2f} ms", file=sys.stderr)
