"""Held-Suarez climatology run — the HS94 structure validation.

Runs the dry FV dycore + HS forcing for `--days` (default 60: 20 spin-up +
40 averaged), accumulating the zonal-time-mean climate on pressure surfaces
(utils/climatology.py), then evaluates the HS94 structure criteria and
prints a JSON verdict. Run on the TPU chip (several minutes at 1.9°x2.5°).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/hs_climate.py \
        --days 60 --spinup 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

if os.environ.get("HS_PLATFORM"):          # e.g. HS_PLATFORM=cpu for smoke
    jax.config.update("jax_platforms", os.environ["HS_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=float, default=60.0)
    ap.add_argument("--spinup", type=float, default=20.0)
    ap.add_argument("--im", type=int, default=144)
    ap.add_argument("--jm", type=int, default=96)
    ap.add_argument("--km", type=int, default=26)
    ap.add_argument("--dt", type=float, default=1800.0)
    ap.add_argument("--sample-every", type=int, default=4)
    ap.add_argument("--flag", type=int, default=None,
                    help="div24del2flag override (2/4/22/24/42) for the "
                         "stability-ladder runs")
    ap.add_argument("--del2coef", type=float, default=None)
    args = ap.parse_args()

    from cam_nor_physics_tpu.models.fv.cd_core import d2a_winds, pressure_vars
    from cam_nor_physics_tpu.models.fv.ctem import default_ctem_levels
    from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
    from cam_nor_physics_tpu.models.fv.grid import make_grid
    from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                           hs_initial_state)
    from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
    from cam_nor_physics_tpu.utils.climatology import (climo_init,
                                                       climo_resolve,
                                                       climo_update,
                                                       hs94_checks)
    from cam_nor_physics_tpu.utils.config import FVConfig

    dtype = jnp.float32
    grid = make_grid(args.im, args.jm, args.km)
    coord = hybrid_coefficients(args.km)
    phis = jnp.zeros((args.jm, args.im), dtype)
    over = {}
    if args.flag is not None:
        over["div24del2flag"] = args.flag
    if args.del2coef is not None:
        over["del2coef"] = args.del2coef
    cfg = FVConfig(**over)
    plev = default_ctem_levels(args.km)

    @jax.jit
    def step(state):
        state = dyn_run(state, grid, coord, phis, cfg, args.dt)
        return hs_forcing(state, grid, coord.ptop, args.dt)

    @jax.jit
    def sample(state, acc):
        ua, va = d2a_winds(state.u, state.v)
        pe, _pk, pkz, _peln = pressure_vars(state.delp, coord.ptop)
        pmid = 0.5 * (pe[1:] + pe[:-1])
        # dry HS: pt is scaled (virtual=dry) potential temperature, T = pt*pkz
        # (dp_coupling.py:71 without the moisture factor)
        t3 = state.pt * pkz
        return climo_update(acc, ua, va, t3, pmid, plev)

    state = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)
    nsteps = int(args.days * 86400 / args.dt)
    nspin = int(args.spinup * 86400 / args.dt)
    acc = climo_init(args.km, args.jm, dtype=dtype)

    t0 = time.perf_counter()
    for i in range(nsteps):
        state = step(state)
        if i >= nspin and (i % args.sample_every) == 0:
            acc = sample(state, acc)
        if (i + 1) % 96 == 0:
            u = state.u
            if not bool(jnp.isfinite(u).all()):
                print(json.dumps({"status": "blowup",
                                  "day": (i + 1) * args.dt / 86400}))
                sys.exit(1)
            print(f"day {(i + 1) * args.dt / 86400:6.1f}  "
                  f"umax {float(jnp.abs(u).max()):6.1f} m/s  "
                  f"({time.perf_counter() - t0:7.1f}s)", file=sys.stderr)
    jax.block_until_ready(state.u)

    climo = climo_resolve(acc)
    lats_deg = np.degrees(grid.lats)
    checks = hs94_checks(climo, lats_deg, plev)
    ok = all(v[1] for v in checks.values())
    print(json.dumps({
        "status": "ok" if ok else "structure-mismatch",
        "days": args.days, "spinup": args.spinup,
        "nsamples": climo["nsamples"],
        "checks": {k: {"value": round(v[0], 3), "ok": bool(v[1])}
                   for k, v in checks.items()},
        "wall_s": round(time.perf_counter() - t0, 1),
    }))
    np.savez("/tmp/hs_climo.npz", **{k: v for k, v in climo.items()})



if __name__ == "__main__":
    main()
