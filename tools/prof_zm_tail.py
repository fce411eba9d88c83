"""TPU timing: fused Pallas ZM tail vs the XLA scans (bench-like inputs)."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from cam_nor_physics_tpu.models.physics.zm_conv import zm_conv_evap
from cam_nor_physics_tpu.models.physics.zm_transport import convtran, momtran
from cam_nor_physics_tpu.models.physics.zm_tail_pallas import zm_tail_pallas
from cam_nor_physics_tpu.utils.config import ZMConfig

dtype = jnp.float32
rng = np.random.default_rng(0)
ncol, pver = 96 * 144, 26
cfg = ZMConfig()
ztodt = 1800.0

eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
pint = np.broadcast_to(eta[None, :] * 1.0e5, (ncol, pver + 1))
pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
pdel = pint[:, 1:] - pint[:, :-1]
t = np.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0) + rng.normal(0, 2, (ncol, pver))
q = 0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6
u = rng.normal(0, 10, (ncol, pver))
v = rng.normal(0, 10, (ncol, pver))
cld = np.clip(rng.random((ncol, pver)) * 0.5, 0, 1)
active = rng.random(ncol) < 0.6
mx = np.where(active, pver - 4, pver - 1)
jt = np.where(active, 6, pver - 1)
karr = np.arange(pver)[None, :]
shape = np.clip((mx[:, None] - karr) * (karr - jt[:, None]), 0, None) / 50.0
mu = shape * active[:, None] * 0.02
md = -0.4 * mu
dp = pdel * 0.01
eu = np.abs(np.gradient(mu, axis=1)) / dp
du = 0.5 * eu
ed = np.abs(np.gradient(md, axis=1)) / dp
rprd = shape * active[:, None] * 1e-6
prec = (rprd * pdel / 9.80616).sum(axis=1) / 1000.0
landfrac = (rng.random(ncol) > 0.5).astype(float)

f32 = lambda a: jnp.asarray(a, dtype)
(t, q, u, v, cld, mu, md, dp, eu, du, ed, rprd) = map(
    f32, (t, q, u, v, cld, mu, md, dp, eu, du, ed, rprd))
pmid_j, pdel_j = f32(pmid), f32(pdel)
prec, landfrac = f32(prec), f32(landfrac)
jt_j = jnp.asarray(jt, jnp.int32); mx_j = jnp.asarray(mx, jnp.int32)
qtr = jnp.stack([q * 0.1, q * 0.05], axis=-1)
qfull = jnp.concatenate([q[:, :, None], qtr], axis=-1)


def series(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    for iters in (1, 20):
        t0 = time.perf_counter()
        for _ in range(iters): out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:18s} N={iters:3d} {dt*1e3:8.3f} ms/iter", file=sys.stderr)
    return out


def xla_tail(t, q, u, v):
    ev = zm_conv_evap(cfg, t, pmid_j, pdel_j, q, landfrac, rprd, cld, ztodt, prec)
    mt = momtran(u, v, mu, md, du, eu, ed, dp, jt_j, mx_j, ztodt, cfg.momcu, cfg.momcd)
    dq = convtran((False, True, True), qfull, mu, md, du, eu, ed, dp, jt_j, mx_j, ztodt)
    return ev["tend_s"], ev["tend_q"], mt["dudt"], mt["seten"], dq


def pallas_tail(t, q, u, v):
    ev, mt, dq = zm_tail_pallas(cfg, t, q, pmid_j, pdel_j, u, v, qtr, cld,
                                mu, md, du, eu, ed, dp, jt_j, mx_j, rprd,
                                prec, landfrac, ztodt)
    return ev["tend_s"], ev["tend_q"], mt["dudt"], mt["seten"], dq


r_x = series("xla tail", jax.jit(xla_tail), t, q, u, v)
r_p = series("pallas tail", jax.jit(pallas_tail), t, q, u, v)
for a, b, n in zip(r_x, r_p, ("tend_s", "tend_q", "dudt", "seten", "dq")):
    if n == "dq":
        a = a[:, :, 1:]
    err = np.abs(np.asarray(a) - np.asarray(b)).max()
    sc = max(np.abs(np.asarray(a)).max(), 1e-30)
    print(f"{n:8s} maxabs={err:9.2e} rel={err/sc:9.2e}", file=sys.stderr)
