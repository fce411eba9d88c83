"""Jablonowski-Williamson (2006) baroclinic-wave run with published metrics.

Integrates the JW06 perturbed case for `--days` (default 12) and reports the
case's standard diagnostics: the global minimum surface pressure per day and
the day the wave "breaks" (ps_min < 940 hPa). The published evolution (JW06
Fig. 5-7, QJRMS 132): ps_min stays ~995-1000 hPa through day ~4, deepens
explosively days 6-9 (~960 hPa at day 8, <930 hPa by day 10 at high
resolution; coarse grids deepen a bit slower/shallower). The unperturbed
variant must stay steady (tested separately in tests/test_baroclinic_wave).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/jw_baroclinic.py
    HS_PLATFORM=cpu ... --im 72 --jm 46 --km 26 --days 2   # CPU smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

if os.environ.get("HS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HS_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=float, default=12.0)
    ap.add_argument("--im", type=int, default=144)
    ap.add_argument("--jm", type=int, default=96)
    ap.add_argument("--km", type=int, default=26)
    ap.add_argument("--dt", type=float, default=1800.0)
    args = ap.parse_args()

    from cam_nor_physics_tpu.models.fv.baroclinic_wave import \
        jw_baroclinic_wave
    from cam_nor_physics_tpu.models.fv.cd_core import pressure_vars
    from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
    from cam_nor_physics_tpu.models.fv.grid import make_grid
    from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
    from cam_nor_physics_tpu.utils.config import FVConfig

    dtype = jnp.float32
    grid = make_grid(args.im, args.jm, args.km)
    coord = hybrid_coefficients(args.km)
    cfg = FVConfig()
    state, phis = jw_baroclinic_wave(grid, coord, perturb=True, dtype=dtype)
    phis = phis.astype(dtype)

    @jax.jit
    def step(s):
        return dyn_run(s, grid, coord, jnp.asarray(phis), cfg, args.dt)

    @jax.jit
    def psmin(s):
        pe = pressure_vars(s.delp, coord.ptop)[0]
        return jnp.min(pe[-1]), jnp.max(jnp.abs(s.u))

    steps_per_day = int(86400 / args.dt)
    nsteps = int(args.days * steps_per_day)
    series = []
    t0 = time.perf_counter()
    for i in range(nsteps):
        state = step(state)
        if (i + 1) % steps_per_day == 0:
            pmin, umax = psmin(state)
            pmin, umax = float(pmin), float(umax)
            day = (i + 1) / steps_per_day
            series.append({"day": day, "ps_min_hpa": round(pmin / 100, 2),
                           "umax_ms": round(umax, 1)})
            print(f"day {day:5.1f}  ps_min {pmin/100:7.2f} hPa  "
                  f"umax {umax:6.1f}  ({time.perf_counter()-t0:6.1f}s)",
                  file=sys.stderr)
            if not np.isfinite(pmin):
                print(json.dumps({"status": "blowup", "day": day}))
                sys.exit(1)

    deep_day = next((s["day"] for s in series if s["ps_min_hpa"] < 960.0),
                    None)
    quiet = all(s["ps_min_hpa"] > 985.0 for s in series if s["day"] <= 4)
    print(json.dumps({
        "status": "ok",
        "series": series,
        "quiet_through_day4": quiet,
        "first_day_below_960": deep_day,
        "wall_s": round(time.perf_counter() - t0, 1),
    }))


if __name__ == "__main__":
    main()
