"""Fused ZM tail kernel (zm_tail_pallas) equivalence vs the XLA scans.

The kernel is the (pver, cols)-major Pallas fusion of zm_conv_evap +
momtran + convtran (reference zm_conv.F90:1712-2715). On CPU it runs in
interpreter mode — identical arithmetic graph, so agreement is f32
roundoff (the qsat/log transcendentals bound it to ~1e-5 relative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics.zm_conv import zm_conv_evap
from cam_nor_physics_tpu.models.physics.zm_tail_pallas import zm_tail_pallas
from cam_nor_physics_tpu.models.physics.zm_transport import convtran, momtran
from cam_nor_physics_tpu.utils.config import ZMConfig

DT = jnp.float32


def _inputs(ncol=200, pver=26, seed=0):
    rng = np.random.default_rng(seed)
    eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
    pint = np.broadcast_to(eta[None, :] * 1.0e5, (ncol, pver + 1))
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    pdel = pint[:, 1:] - pint[:, :-1]
    t = np.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0) + \
        rng.normal(0, 2, (ncol, pver))
    q = 0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6
    u = rng.normal(0, 10, (ncol, pver))
    v = rng.normal(0, 10, (ncol, pver))
    cld = np.clip(rng.random((ncol, pver)) * 0.5, 0, 1)
    active = rng.random(ncol) < 0.6
    mx = np.where(active, pver - 4, pver - 1)
    jt = np.where(active, 6, pver - 1)
    karr = np.arange(pver)[None, :]
    shape = np.clip((mx[:, None] - karr) * (karr - jt[:, None]), 0,
                    None) / 50.0
    mu = shape * active[:, None] * 0.02
    md = -0.4 * mu
    dp = pdel * 0.01
    eu = np.abs(np.gradient(mu, axis=1)) / dp
    du = 0.5 * eu
    ed = np.abs(np.gradient(md, axis=1)) / dp
    rprd = shape * active[:, None] * 1e-6
    prec = (rprd * pdel / 9.80616).sum(axis=1) / 1000.0
    landfrac = (rng.random(ncol) > 0.5).astype(float)
    f = lambda a: jnp.asarray(a, DT)
    return dict(t=f(t), q=f(q), pmid=f(pmid), pdel=f(pdel), u=f(u), v=f(v),
                cld=f(cld), mu=f(mu), md=f(md), du=f(du), eu=f(eu), ed=f(ed),
                dp=f(dp), rprd=f(rprd), prec=f(prec), landfrac=f(landfrac),
                jt=jnp.asarray(jt, jnp.int32), mx=jnp.asarray(mx, jnp.int32))


def _close(a, b, rtol=5e-5):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1e-30)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=rtol * scale)


class TestZMTailPallas:
    def test_matches_xla_scans(self):
        cfg = ZMConfig()
        ztodt = 1800.0
        d = _inputs()
        interp = jax.default_backend() != "tpu"
        qtr = jnp.stack([d["q"] * 0.1, d["q"] * 0.05], axis=-1)

        ev_r = zm_conv_evap(cfg, d["t"], d["pmid"], d["pdel"], d["q"],
                            d["landfrac"], d["rprd"], d["cld"], ztodt,
                            d["prec"])
        mt_r = momtran(d["u"], d["v"], d["mu"], d["md"], d["du"], d["eu"],
                       d["ed"], d["dp"], d["jt"], d["mx"], ztodt,
                       cfg.momcu, cfg.momcd)
        qfull = jnp.concatenate([d["q"][:, :, None], qtr], axis=-1)
        dq_r = convtran((False, True, True), qfull, d["mu"], d["md"],
                        d["du"], d["eu"], d["ed"], d["dp"], d["jt"], d["mx"],
                        ztodt)

        ev, mt, dq = zm_tail_pallas(
            cfg, d["t"], d["q"], d["pmid"], d["pdel"], d["u"], d["v"], qtr,
            d["cld"], d["mu"], d["md"], d["du"], d["eu"], d["ed"], d["dp"],
            d["jt"], d["mx"], d["rprd"], d["prec"], d["landfrac"], ztodt,
            interpret=interp)

        for k in ("tend_s", "tend_q", "tend_s_snwprd", "tend_s_snwevmlt",
                  "ntprprd", "ntsnprd", "flxprec", "flxsnow", "prec", "snow"):
            _close(ev[k], ev_r[k])
        for k in ("dudt", "dvdt", "seten"):
            _close(mt[k], mt_r[k])
        for k in ("pguall", "pgdall", "icwu", "icwd"):
            for i in range(2):
                _close(mt[k][i], mt_r[k][i])
        _close(dq[:, :, 0], dq_r[:, :, 1])
        _close(dq[:, :, 1], dq_r[:, :, 2])

    def test_quiescent_columns_zero(self):
        """No mass flux and no precip => all tendencies vanish."""
        cfg = ZMConfig()
        d = _inputs(ncol=64)
        z = jnp.zeros_like(d["mu"])
        qtr = jnp.stack([d["q"] * 0.1, d["q"] * 0.05], axis=-1)
        ev, mt, dq = zm_tail_pallas(
            cfg, d["t"], d["q"], d["pmid"], d["pdel"], d["u"], d["v"], qtr,
            d["cld"], z, z, z, z, z, d["dp"], d["jt"], d["mx"], z,
            jnp.zeros_like(d["prec"]), d["landfrac"], 1800.0,
            interpret=jax.default_backend() != "tpu")
        assert np.abs(np.asarray(ev["tend_q"])).max() == 0.0
        assert np.abs(np.asarray(mt["dudt"])).max() == 0.0
        assert np.abs(np.asarray(dq)).max() == 0.0
