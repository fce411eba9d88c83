"""Climatology accumulator + HS94 structure checks (utils/climatology.py)."""

import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.fv.ctem import default_ctem_levels
from cam_nor_physics_tpu.utils.climatology import (climo_init, climo_resolve,
                                                   climo_update, hs94_checks)


def _synthetic_hs_state(km, jm, im):
    """Analytic fields shaped like the HS94 climate: subtropical jets at
    250 hPa / 45 deg, tropical surface easterlies, warm equator."""
    plev = default_ctem_levels(km)
    lats = np.linspace(-90, 90, jm)
    pmid = np.broadcast_to(plev[:, None, None], (km, jm, im)).copy()
    lat3 = np.broadcast_to(lats[None, :, None], (km, jm, im))
    pnorm = pmid / 1.0e5
    jet = 30.0 * np.exp(-((np.abs(lat3) - 45.0) / 12.0) ** 2) * \
        np.exp(-((pnorm - 0.25) / 0.25) ** 2)
    east = -5.0 * np.exp(-(lat3 / 12.0) ** 2) * pnorm ** 2
    u = jet + east
    t = (315.0 - 60.0 * np.sin(np.radians(lat3)) ** 2) * pnorm ** 0.28
    t = np.maximum(t, 200.0)
    v = np.zeros_like(u)
    return (jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32),
            jnp.asarray(t, jnp.float32), jnp.asarray(pmid, jnp.float32),
            plev, lats)


class TestClimatology:
    def test_accumulate_and_resolve(self):
        km, jm, im = 26, 24, 36
        u, v, t, pmid, plev, lats = _synthetic_hs_state(km, jm, im)
        acc = climo_init(km, jm)
        for scale in (0.9, 1.0, 1.1):
            acc = climo_update(acc, u * scale, v, t, pmid, plev)
        out = climo_resolve(acc)
        assert out["nsamples"] == 3.0
        # mean of scales is exactly 1.0 -> mean u equals the zonal mean of u
        zu = np.mean(np.asarray(u), axis=-1)
        np.testing.assert_allclose(out["u"], zu, rtol=2e-5)
        assert (out["u_var"] >= -1e-4).all()

    def test_hs94_checks_pass_on_synthetic_climate(self):
        km, jm, im = 26, 48, 72
        u, v, t, pmid, plev, lats = _synthetic_hs_state(km, jm, im)
        acc = climo_update(climo_init(km, jm), u, v, t, pmid, plev)
        checks = hs94_checks(climo_resolve(acc), lats, plev)
        for name, (val, ok) in checks.items():
            assert ok, f"{name}: {val}"

    def test_hs94_checks_fail_on_isothermal_rest(self):
        km, jm, im = 26, 24, 36
        plev = default_ctem_levels(km)
        lats = np.linspace(-90, 90, jm)
        pmid = jnp.asarray(np.broadcast_to(plev[:, None, None],
                                           (km, jm, im)), jnp.float32)
        z = jnp.zeros((km, jm, im), jnp.float32)
        t = jnp.full((km, jm, im), 250.0, jnp.float32)
        acc = climo_update(climo_init(km, jm), z, z, t, pmid, plev)
        checks = hs94_checks(climo_resolve(acc), lats, plev)
        assert not all(v[1] for v in checks.values())
