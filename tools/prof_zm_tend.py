import time, sys
import jax, jax.numpy as jnp, numpy as np
from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.models.physics.physics_buffer import (pbuf_register, zm_pbuf_specs)
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.models.physics.zm_conv_intr import zm_conv_tend
from cam_nor_physics_tpu.models.physics.zm_conv import zm_convr
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
    for iters in (1, 10, 50):
        t0 = time.perf_counter()
        for _ in range(iters): out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter()-t0)/iters
        print(f"{name:18s} N={iters:3d} {dt*1e3:8.3f} ms/iter", file=sys.stderr)

series("empty", jax.jit(lambda x: x+1.0), jnp.ones((8,), dtype))
series("zm_convr", jax.jit(lambda *a: zm_convr(cfg, 0, *a)),
    t, q, pmid, pint, pint[:,1:]-pint[:,:-1], jnp.zeros((ncol,pver),dtype),
    jnp.zeros((ncol,),dtype), jnp.zeros((ncol,pver+1),dtype), pblh, tpert, landfrac, 900.0)
series("zm_conv_tend", jax.jit(lambda s,pb: zm_conv_tend(cfg, reg, s, pb, pblh, tpert, landfrac, ztodt)), pstate, pbuf)
