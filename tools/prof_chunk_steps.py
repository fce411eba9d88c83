"""Quantify the per-dispatch tunnel overhead of the bench pair.

Times the bench-identical dyn and ZM steps two ways on the chip:
  wall   — chained host loop, one dispatch per step (bench.py pattern)
  device — jit(lax.fori_loop(K, step)) — ONE dispatch for K steps

The spread is the per-dispatch overhead a chunked driver loop
(driver.run(..., chunk=K) / lax.scan over coupled steps) recovers.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                       hs_initial_state)
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.utils.config import FVConfig, ZMConfig

dtype = jnp.float32
im, jm, km = 144, 96, 26
K = 20
grid = make_grid(im, jm, km)
coord = hybrid_coefficients(km)
phis = jnp.zeros((jm, im), dtype)
cfg = FVConfig()
dt = 1800.0


def _fetch(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0])


def wall_chained(fn, args, iters=K):
    cur = fn(*args)
    _fetch(cur)
    cur = fn(*cur)
    _fetch(cur)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            cur = fn(*cur)
        _fetch(cur)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def device_loop(body, init, iters=K):
    f = jax.jit(lambda x0, grid, phis, coord: jax.lax.fori_loop(
        0, iters, lambda i, x: body(x, grid, phis, coord), x0))
    o = f(init, grid, phis, coord)
    _fetch(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = f(init, grid, phis, coord)
        _fetch(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


state = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)

step_g = jax.jit(lambda s, grid, coord, phis: hs_forcing(
    dyn_run(s, grid, coord, phis, cfg, dt), grid, coord.ptop, dt))
t_wall = wall_chained(lambda s: (step_g(s, grid, coord, phis),), (state,))
t_dev = device_loop(lambda s, grid, phis, coord: hs_forcing(
    dyn_run(s, grid, coord, phis, cfg, dt), grid, coord.ptop, dt), state)
print(f"dyn_step  wall={t_wall:7.2f} ms  device(fori x{K})={t_dev:7.2f} ms  "
      f"dispatch-overhead={t_wall - t_dev:6.2f} ms", file=sys.stderr)

# ---- ZM pair (bench geometry) ----
from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.models.physics.physics_buffer import (pbuf_register,
                                                               zm_pbuf_specs)
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.models.physics.zm_conv_intr import zm_conv_tend

ncol, pver = jm * im, km
reg = default_registry()
eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
pint = jnp.asarray(np.broadcast_to(eta[None, :] * 1e5, (ncol, pver + 1)),
                   dtype)
pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
t = jnp.maximum(300.0 * (pmid / 1e5) ** 0.19, 195.0).at[:, -1].add(2.0)
q0 = (0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6).at[:, -3:].multiply(1.15)
q = jnp.zeros((ncol, pver, reg.pcnst), dtype).at[:, :, 0].set(q0)
pstate = make_state_from_profiles(
    pint, t, jnp.zeros((ncol, pver), dtype), jnp.zeros((ncol, pver), dtype),
    q, jnp.zeros((ncol,), dtype))
pbuf = pbuf_register(zm_pbuf_specs(ncol, pver), dtype).set(
    "CLD", jnp.full((ncol, pver), 0.1, dtype))
zcfg = ZMConfig(use_pallas="auto")
pblh = jnp.full((ncol,), 800.0, dtype)
tpert = jnp.full((ncol,), 0.3, dtype)
landfrac = jnp.ones((ncol,), dtype)

zm_g = jax.jit(lambda s, pb: (lambda o: (o.state1, o.pbuf))(
    zm_conv_tend(zcfg, reg, s, pb, pblh, tpert, landfrac, dt)))
t_wall_zm = wall_chained(lambda s, pb: zm_g(s, pb), (pstate, pbuf))


def zm_body(x, grid, phis, coord):
    s, pb = x
    o = zm_conv_tend(zcfg, reg, s, pb, pblh, tpert, landfrac, dt)
    return (o.state1, o.pbuf)


t_dev_zm = device_loop(zm_body, (pstate, pbuf))
print(f"zm_tend   wall={t_wall_zm:7.2f} ms  device(fori x{K})={t_dev_zm:7.2f} ms  "
      f"dispatch-overhead={t_wall_zm - t_dev_zm:6.2f} ms", file=sys.stderr)

tot_wall = t_wall + t_wall_zm
tot_dev = t_dev + t_dev_zm
npts = im * jm * km
print(f"pair: wall {tot_wall:.2f} ms -> {npts / tot_wall * 1e3 / 1e6:.1f}M gp/s"
      f" | device {tot_dev:.2f} ms -> {npts / tot_dev * 1e3 / 1e6:.1f}M gp/s",
      file=sys.stderr)
