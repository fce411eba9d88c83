"""Interleaved A/B timing of dyn-step scan-unroll variants on the chip.

The tunnel's throughput drifts run-to-run (observed 5->10 ms for identical
code), so sequential measurements cannot attribute ~1 ms effects. This
tool compiles every variant in ONE process and times them in interleaved
rounds (A,B,C,A,B,C,...), reporting per-variant medians.
"""
import sys
import time
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.fv import dyn_comp
from cam_nor_physics_tpu.ops import fill as fillmod
from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
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


def _fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0])


VARIANTS = {
    "none":   dict(small=False, cycles=False, recover=False, fz=False),
    "zmstyle": dict(small=False, cycles=True, recover=True, fz=True),
    "all":    dict(small=True, cycles=True, recover=True, fz=True),
    "rec+fz": dict(small=False, cycles=False, recover=True, fz=True),
}

fns = {}
state0 = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)
for name, v in VARIANTS.items():
    dyn_comp._UNROLL = {"small": v["small"], "cycles": v["cycles"],
                        "recover": v["recover"]}
    fillmod._UNROLL = v["fz"]

    @jax.jit
    def g(state, grid, coord, phis):
        s = dyn_run(state, grid, coord, phis, cfg, dt)
        return hs_forcing(s, grid, coord.ptop, dt)

    s = g(state0, grid, coord, phis)   # compile under this toggle set
    _fetch(s)
    fns[name] = (g, s)
    print(f"compiled {name}", file=sys.stderr, flush=True)

results = {n: [] for n in fns}
for r in range(ROUNDS):
    for name, (g, s) in fns.items():
        cur = g(s, grid, coord, phis)
        _fetch(cur)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            cur = g(cur, grid, coord, phis)
        _fetch(cur)
        dt_ms = (time.perf_counter() - t0) / ITERS * 1e3
        results[name].append(dt_ms)
        print(f"round {r} {name:8s} {dt_ms:6.2f} ms", file=sys.stderr,
              flush=True)

for name, ts in results.items():
    print(f"{name:8s} median {np.median(ts):6.2f} ms  all={['%.2f' % t for t in ts]}",
          file=sys.stderr)
