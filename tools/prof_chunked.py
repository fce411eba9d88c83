"""Measure scan-over-column-chunks amortization of the ZM dispatch floor.

zm_conv_tend is column-local, so running it as lax.scan over column chunks
is numerically identical per column while collapsing ~1000 top-level XLA
launches into one device-side while loop. This times plain vs chunked."""
import sys
import time

import jax

jax.devices()
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.models.physics.physics_buffer import (
    pbuf_register, zm_pbuf_specs)
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.models.physics.zm_conv_intr import zm_conv_tend
from cam_nor_physics_tpu.utils.config import ZMConfig

dtype = jnp.float32
im, jm, km = 144, 96, 26
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
zcfg = ZMConfig()
pblh = jnp.full((ncol,), 800.0, dtype)
tpert = jnp.full((ncol,), 0.3, dtype)
landfrac = jnp.ones((ncol,), dtype)
ztodt = 1800.0


def _fetch(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def time_chain(fn, args, iters=30):
    out = fn(*args)
    _fetch(out)
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    cur = args
    for _ in range(iters):
        cur = fn(*cur)
    _fetch(cur)
    return (time.perf_counter() - t0) / iters


@jax.jit
def plain(s, pb):
    o = zm_conv_tend(zcfg, reg, s, pb, pblh, tpert, landfrac, ztodt)
    return o.state1, o.pbuf


def make_chunked(nc):
    ccol = ncol // nc

    def split(a):
        return a.reshape(nc, ccol, *a.shape[1:])

    def merge(a):
        return a.reshape(nc * ccol, *a.shape[2:])

    @jax.jit
    def chunked(s, pb):
        xs = jax.tree_util.tree_map(split, (s, pb, pblh, tpert, landfrac))

        def body(_, x):
            sc, pbc, ph, tp_, lf = x
            o = zm_conv_tend(zcfg, reg, sc, pbc, ph, tp_, lf, ztodt)
            return None, (o.state1, o.pbuf)

        _, out = jax.lax.scan(body, None, xs)
        return jax.tree_util.tree_map(merge, out)

    return chunked


t_plain = time_chain(plain, (pstate, pbuf))
print(f"plain      {t_plain*1e3:8.2f} ms", file=sys.stderr)
s1_ref, pb_ref = plain(pstate, pbuf)
for nc in (2, 4, 8, 16):
    fn = make_chunked(nc)
    tt = time_chain(fn, (pstate, pbuf))
    s1, pb = fn(pstate, pbuf)
    derr = max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(jax.tree_util.tree_leaves(s1_ref),
                               jax.tree_util.tree_leaves(s1)))
    print(f"chunked({nc:2d}) {tt*1e3:8.2f} ms   max|dstate|={derr:.3e}",
          file=sys.stderr)
