"""Ablation attribution for the bench headline (chained wall-clock).

Times bench-identical chained steps (x(n+1)=f(x(n)), value-fetch fence)
for a ladder of config ablations, so the cost of each round-2/3 feature
is measured on the real chip rather than guessed. Run exclusively (one
TPU process at a time — tunnel contention wedges both).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                       hs_initial_state)
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.utils.config import FVConfig, ZMConfig

dtype = jnp.float32
im, jm, km = 144, 96, 26
ITERS = 30

grid = make_grid(im, jm, km)
coord = hybrid_coefficients(km)
phis = jnp.zeros((jm, im), dtype)
dt = 1800.0


def _fetch(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def chain(fn, args, iters=ITERS):
    cur = fn(*args)
    _fetch(cur)
    cur = fn(*cur)
    _fetch(cur)
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = fn(*cur)
    _fetch(cur)
    return (time.perf_counter() - t0) / iters


def dyn_variant(name, cfg):
    @jax.jit
    def g(state, grid, coord, phis):
        s = dyn_run(state, grid, coord, phis, cfg, dt)
        return hs_forcing(s, grid, coord.ptop, dt)

    def step(state):
        return (g(state, grid, coord, phis),)

    state = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)
    for _ in range(3):
        (state,) = step(state)
    _fetch(state)
    t = chain(step, (state,))
    print(f"dyn[{name:28s}] {t*1e3:7.2f} ms", file=sys.stderr, flush=True)
    return t


dyn_variant("base (bench cfg)", FVConfig())
dyn_variant("conserve=False", FVConfig(conserve=False))
dyn_variant("no div_damp_top_taper", FVConfig(div_damp_top_taper=False))
dyn_variant("flag=42 (del4+del2vel)", FVConfig(div24del2flag=42))
dyn_variant("flag=2 (del2 div only)", FVConfig(div24del2flag=2))
dyn_variant("xla path", FVConfig(use_pallas=False))

# ---- ZM ----
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
t0_ = jnp.maximum(300.0 * (pmid / 1e5) ** 0.19, 195.0).at[:, -1].add(2.0)
q0 = (0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6).at[:, -3:].multiply(1.15)
qf = jnp.zeros((ncol, pver, reg.pcnst), dtype).at[:, :, 0].set(q0)
pstate0 = make_state_from_profiles(
    pint, t0_, jnp.zeros((ncol, pver), dtype), jnp.zeros((ncol, pver), dtype),
    qf, jnp.zeros((ncol,), dtype))
pbuf0 = pbuf_register(zm_pbuf_specs(ncol, pver), dtype).set(
    "CLD", jnp.full((ncol, pver), 0.1, dtype))
pblh = jnp.full((ncol,), 800.0, dtype)
tpert = jnp.full((ncol,), 0.3, dtype)
landfrac = jnp.ones((ncol,), dtype)


def zm_variant(name, zcfg):
    @jax.jit
    def g(s, pb):
        o = zm_conv_tend(zcfg, reg, s, pb, pblh, tpert, landfrac, dt)
        return o.state1, o.pbuf

    t = chain(g, (pstate0, pbuf0))
    print(f"zm [{name:28s}] {t*1e3:7.2f} ms", file=sys.stderr, flush=True)
    return t


zm_variant("base (bench cfg)", ZMConfig(use_pallas="auto"))
zm_variant("second_call=False",
           ZMConfig(use_pallas="auto", second_call=False, retrigger=False))
zm_variant("retrigger=False", ZMConfig(use_pallas="auto", retrigger=False))
zm_variant("tail=False", ZMConfig(use_pallas="auto", use_pallas_tail=False))
zm_variant("newton->brent", ZMConfig(use_pallas="auto",
                                     inversion_solver="brent"))
