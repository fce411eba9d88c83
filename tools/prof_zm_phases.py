"""Per-phase TPU timings for zm_conv_tend internals (bench-like inputs)."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.models.physics.physics_buffer import (pbuf_register, zm_pbuf_specs)
from cam_nor_physics_tpu.models.physics.state import (
    make_state_from_profiles, physics_update, ptend_init, ptend_sum)
from cam_nor_physics_tpu.models.physics.zm_conv_intr import zm_conv_tend
from cam_nor_physics_tpu.models.physics.zm_conv import zm_convr, zm_conv_evap
from cam_nor_physics_tpu.models.physics.zm_transport import convtran, momtran
from cam_nor_physics_tpu.models.physics.zm_conv import zm_convr as zm_convr_dispatch
from cam_nor_physics_tpu.utils.config import ZMConfig

dtype = jnp.float32
ncol, pver = 96*144, 26
cfg = ZMConfig(); reg = default_registry(); pcnst = reg.pcnst
eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
pint = jnp.asarray(np.broadcast_to(eta[None, :]*1e5, (ncol, pver+1)), dtype)
pmid = 0.5*(pint[:, 1:]+pint[:, :-1])
t = jnp.maximum(300.0*(pmid/1e5)**0.19, 195.0).at[:, -1].add(2.0)
q = (0.017*(pmid/pmid[:, -1:])**2.5 + 1e-6).at[:, -3:].multiply(1.15)
qfull = jnp.zeros((ncol, pver, pcnst), dtype).at[:, :, 0].set(q)
pstate = make_state_from_profiles(pint, t, jnp.zeros((ncol,pver),dtype),
    jnp.zeros((ncol,pver),dtype), qfull, jnp.zeros((ncol,),dtype))
pbuf = pbuf_register(zm_pbuf_specs(ncol, pver), dtype).set("CLD", jnp.full((ncol,pver),0.1,dtype))
pblh = jnp.full((ncol,),800.0,dtype); tpert = jnp.full((ncol,),0.3,dtype)
landfrac = jnp.ones((ncol,),dtype); ztodt = 1800.0

def series(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    for iters in (1, 20):
        t0 = time.perf_counter()
        for _ in range(iters): out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter()-t0)/iters
        print(f"{name:22s} N={iters:3d} {dt*1e3:8.3f} ms/iter", file=sys.stderr)
    return out

# realistic zm_convr inputs from the state
out = series("zm_convr(xla)", jax.jit(lambda s: zm_convr(
    cfg, 0, s.t, s.q[:, :, 0], s.pmid, s.pint, s.pdel, s.zm, s.phis, s.zi,
    pblh, tpert, landfrac, 0.5*ztodt)), pstate)
series("zm_convr", jax.jit(lambda s: zm_convr_dispatch(
    cfg, 0, s.t, s.q[:, :, 0], s.pmid, s.pint, s.pdel, s.zm, s.phis, s.zi,
    pblh, tpert, landfrac, 0.5*ztodt)), pstate)

cld = pbuf.get("CLD")
series("zm_conv_evap", jax.jit(lambda s, o: zm_conv_evap(
    cfg, s.t, s.pmid, s.pdel, s.q[:, :, 0], landfrac, o.rprd, cld, ztodt,
    o.prec)), pstate, out)
series("momtran", jax.jit(lambda s, o: momtran(
    s.u, s.v, o.mu, o.md, o.du, o.eu, o.ed, o.dp, o.jt, o.maxg, ztodt,
    cfg.momcu, cfg.momcd)), pstate, out)
doconv = reg.mask("is_convtran1")
series("convtran1", jax.jit(lambda s, o: convtran(
    doconv, s.q, o.mu, o.md, o.du, o.eu, o.ed, o.dp, o.jt, o.maxg, ztodt)),
    pstate, out)

lq = (True,) + (False,)*(pcnst-1)
def upd(s, o):
    pt = ptend_init("zm_convr", ncol, pver, pcnst, ls=True, lq=lq, dtype=dtype)
    pt = pt.replace(s=o.heat, q=pt.q.at[:, :, 0].set(o.qtnd))
    s1, _ = physics_update(s, pt, ztodt, reg)
    return s1
series("ptend+update x1", jax.jit(upd), pstate, out)
series("zm_conv_tend", jax.jit(lambda s, pb: zm_conv_tend(
    cfg, reg, s, pb, pblh, tpert, landfrac, ztodt)), pstate, pbuf)
