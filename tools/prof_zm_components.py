"""Profile ZM sub-phases on the TPU (bench-like inputs)."""
import time, sys
import jax, jax.numpy as jnp, numpy as np

from cam_nor_physics_tpu.models.physics import zm_conv as zm
from cam_nor_physics_tpu.models.physics.zm_conv import (
    buoyan_dilute, cldprp, closure, zm_convr, _log_mean_interface)
from cam_nor_physics_tpu.utils.config import ZMConfig
from cam_nor_physics_tpu.utils import constants as c

dtype = jnp.float32
ncol, pver = 96 * 144, 26
msg = 2
cfg = ZMConfig()
delt = 900.0

eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
pint = jnp.asarray(np.broadcast_to(eta[None, :] * 1.0e5, (ncol, pver + 1)), dtype)
pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0).at[:, -1].add(2.0)
q = (0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6).at[:, -3:].multiply(1.15)
dpp = pint[:, 1:] - pint[:, :-1]
# heights (hydrostatic, rough)
tv = t * (1 + 0.608 * q)
dz = 287.0 * tv * dpp / (pmid * 9.80616)
zmid = jnp.cumsum(dz[:, ::-1], axis=1)[:, ::-1] - 0.5 * dz
zint = jnp.concatenate([ (zmid + 0.5*dz), jnp.zeros((ncol,1), dtype)], axis=1)
geos = jnp.zeros((ncol,), dtype)
pblh = jnp.full((ncol,), 800.0, dtype)
tpert = jnp.full((ncol,), 0.3, dtype)
landfrac = jnp.ones((ncol,), dtype)

zs = geos / 9.80616
p = pmid * 0.01
pf = pint * 0.01
z = zmid + zs[:, None]
zf = zint + zs[:, None]
dp = 0.01 * dpp
s = t + (9.80616 / ((1.0 + 0.608 * q) * 1004.64)) * zmid
dmpdz0 = jnp.full((ncol, pver), -cfg.tentrm, dtype)
pblt = jnp.full((ncol,), pver - 3.0, dtype)

def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:24s} {dt*1e3:7.2f} ms", file=sys.stderr)
    return out

f_buoy = jax.jit(lambda *a: buoyan_dilute(cfg, msg, *a))
b1 = timeit("buoyan_dilute", f_buoy, q, t, p, z, pf, zint, zs, pblt, tpert,
            landfrac, dmpdz0)

shat = _log_mean_interface(s)
qhat = _log_mean_interface(q)
f_cld = jax.jit(lambda *a: cldprp(cfg, msg, *a))
c1 = timeit("cldprp", f_cld, q, t, p, z, s, zf, shat, qhat, b1.mx, b1.lel,
            landfrac)

fac_mb = (zf[:, :-1] - zf[:, 1:]) / dp
du = c1.du * fac_mb
f_clo = jax.jit(lambda *a: closure(cfg, msg, *a))
timeit("closure", f_clo, q, t, p, z, s, b1.tp, c1.qst, c1.qu, c1.su, c1.mc,
       du, c1.mu, c1.md, c1.qd, c1.sd, qhat, shat, dp, b1.qstp, zf, c1.ql,
       jnp.sum(dp, axis=1), b1.cape, b1.tl, b1.lcl, b1.lel, c1.jt, b1.mx)

f_convr = jax.jit(lambda *a: zm_convr(cfg, msg, *a))
timeit("zm_convr total", f_convr, t, q, pmid, pint, dpp, zmid, geos, zint,
       pblh, tpert, landfrac, delt)

# --- verify with forced materialization + time the interface layer ---
def timeit2(name, fn, *args):
    out = fn(*args)
    s0 = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:24s} {dt*1e3:7.2f} ms (forced)", file=sys.stderr)

timeit2("zm_convr forced", f_convr, t, q, pmid, pint, dpp, zmid, geos, zint,
        pblh, tpert, landfrac, delt)

from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.models.physics.physics_buffer import (
    pbuf_register, zm_pbuf_specs)
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.models.physics.zm_conv_intr import zm_conv_tend

reg = default_registry()
qfull = jnp.zeros((ncol, pver, reg.pcnst), dtype).at[:, :, 0].set(q)
pstate = make_state_from_profiles(
    pint, t, jnp.zeros((ncol, pver), dtype), jnp.zeros((ncol, pver), dtype),
    qfull, jnp.zeros((ncol,), dtype))
pbuf = pbuf_register(zm_pbuf_specs(ncol, pver), dtype).set(
    "CLD", jnp.full((ncol, pver), 0.1, dtype))

f_tend = jax.jit(lambda s, pb: zm_conv_tend(cfg, reg, s, pb, pblh, tpert,
                                            landfrac, 1800.0))
timeit("zm_conv_tend", f_tend, pstate, pbuf)
