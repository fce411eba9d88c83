"""Foundation-layer tests: constants, saturation, thermo inversions,
geopotential, physics state machinery, energy bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics import check_energy as ce
from cam_nor_physics_tpu.models.physics import state as st
from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.ops import geopotential as geo
from cam_nor_physics_tpu.ops import saturation as sat
from cam_nor_physics_tpu.ops import thermo
from cam_nor_physics_tpu.utils import constants as c


def make_profile(ncol=4, pver=26, pcnst=3, seed=0):
    """Hydrostatically plausible test sounding."""
    rng = np.random.default_rng(seed)
    # hybrid-ish interface pressures from ~2 hPa to ~1000 hPa
    eta = np.linspace(0.002, 1.0, pver + 1) ** 1.3
    ps = 1.0e5 * (1.0 + 0.02 * rng.standard_normal(ncol))
    pint = np.maximum(eta[None, :] * ps[:, None], 100.0)
    pint = np.sort(pint, axis=1)
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t = 300.0 * (pmid / 1.0e5) ** 0.12 + rng.standard_normal((ncol, pver))
    q = np.zeros((ncol, pver, pcnst))
    q[:, :, 0] = 0.018 * (pmid / pmid[:, -1:]) ** 3 + 1e-6
    u = 5.0 * rng.standard_normal((ncol, pver))
    v = 5.0 * rng.standard_normal((ncol, pver))
    phis = np.abs(100.0 * rng.standard_normal(ncol)) * c.GRAVIT
    return (jnp.asarray(pint), jnp.asarray(t), jnp.asarray(u), jnp.asarray(v),
            jnp.asarray(q), jnp.asarray(phis))


class TestConstants:
    def test_derived(self):
        assert abs(c.RAIR - 287.04) < 0.01
        assert abs(c.RH2O - 461.5) < 0.01
        assert abs(c.ZVIR - 0.6078) < 0.001
        assert abs(c.CAPPA - 0.2857) < 0.001


class TestSaturation:
    def test_known_values(self):
        # es over water at 0C ~ 611 Pa, at 20C ~ 2339 Pa, at 100C ~ 101325 Pa
        es0 = float(sat.svp_water(jnp.float64(273.15)))
        es20 = float(sat.svp_water(jnp.float64(293.15)))
        es100 = float(sat.svp_water(jnp.float64(373.15)))
        assert abs(es0 - 611.0) < 3.0
        assert abs(es20 - 2339.0) < 10.0
        assert abs(es100 - 101325.0) / 101325.0 < 0.01

    def test_ice_below_water(self):
        t = jnp.linspace(230.0, 272.0, 20)
        assert np.all(np.asarray(sat.svp_ice(t)) < np.asarray(sat.svp_water(t)))

    def test_blend_continuity(self):
        t = jnp.linspace(240.0, 280.0, 400)
        es = np.asarray(sat.svp_trans(t))
        # monotone increasing and no jumps > 10%
        assert np.all(np.diff(es) > 0)
        assert np.max(np.diff(es) / es[:-1]) < 0.1

    def test_qsat_hpa_units(self):
        es_hpa, qs = sat.qsat_hpa(jnp.float64(290.0), jnp.float64(900.0))
        es_pa, qs2 = sat.qsat_water(jnp.float64(290.0), jnp.float64(90000.0))
        assert abs(float(es_hpa) * 100.0 - float(es_pa)) < 1e-8
        assert abs(float(qs) - float(qs2)) < 1e-12

    def test_jit_and_grad(self):
        f = jax.jit(lambda t: sat.qsat_water(t, 9.0e4)[1])
        g = jax.grad(lambda t: f(t))(jnp.float64(285.0))
        assert float(g) > 0  # qsat increases with T


class TestThermo:
    def test_entropy_inversion_roundtrip(self):
        tk = jnp.array([250.0, 270.0, 290.0, 300.0, 215.0])
        p = jnp.array([300.0, 500.0, 850.0, 1000.0, 150.0])
        qt = jnp.array([1e-4, 1e-3, 1e-2, 1.5e-2, 1e-5])
        s = thermo.entropy(tk, p, qt)
        t_inv, qst, conv = thermo.ientropy(s, p, qt, tk + 3.0)
        assert bool(jnp.all(conv))
        np.testing.assert_allclose(np.asarray(t_inv), np.asarray(tk), atol=2e-3)

    def test_enthalpy_inversion_roundtrip(self):
        tk = jnp.array([250.0, 270.0, 290.0, 300.0])
        p = jnp.array([300.0, 500.0, 850.0, 1000.0])
        qt = jnp.array([1e-4, 1e-3, 1e-2, 1.5e-2])
        z = jnp.array([9000.0, 5500.0, 1500.0, 100.0])
        h = thermo.enthalpy(tk, p, qt, z)
        t_inv, qst, conv = thermo.ienthalpy(h, p, qt, z, tk - 4.0)
        assert bool(jnp.all(conv))
        np.testing.assert_allclose(np.asarray(t_inv), np.asarray(tk), atol=2e-3)

    def test_inversion_jits(self):
        f = jax.jit(thermo.ientropy)
        tk = jnp.full((8,), 280.0)
        p = jnp.full((8,), 700.0)
        qt = jnp.full((8,), 5e-3)
        s = thermo.entropy(tk, p, qt)
        t_inv, _, conv = f(s, p, qt, tk + 5.0)
        assert bool(jnp.all(conv))
        np.testing.assert_allclose(np.asarray(t_inv), 280.0, atol=2e-3)


class TestGeopotential:
    def test_isothermal_scale_height(self):
        # isothermal atmosphere: z(p) = (R T / g) ln(ps/p) exactly
        ncol, pver = 2, 40
        t0 = 250.0
        pint = jnp.broadcast_to(
            jnp.logspace(jnp.log10(100.0), jnp.log10(1.0e5), pver + 1), (ncol, pver + 1))
        pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
        t = jnp.full((ncol, pver), t0)
        q1 = jnp.zeros((ncol, pver))
        pdel = pint[:, 1:] - pint[:, :-1]
        zi, zm = geo.geopotential_t(jnp.log(pint), jnp.log(pmid), pint, pmid,
                                    pdel, 1.0 / pdel, t, q1)
        expect = c.RAIR * t0 / c.GRAVIT * np.log(np.asarray(pint[:, -1:] / pint))
        np.testing.assert_allclose(np.asarray(zi), expect, rtol=1e-10)

    def test_dse_roundtrip(self):
        # t -> (zi, zm) -> dse -> geopotential_dse should recover t, zi, zm
        pint, t, u, v, q, phis = make_profile()
        pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
        pdel = pint[:, 1:] - pint[:, :-1]
        rpdel = 1.0 / pdel
        piln, pmln = jnp.log(pint), jnp.log(pmid)
        zi, zm = geo.geopotential_t(piln, pmln, pint, pmid, pdel, rpdel, t, q[:, :, 0])
        dse = c.CPAIR * t + c.GRAVIT * zm + phis[:, None]
        t2, zi2, zm2 = geo.geopotential_dse(piln, pmln, pint, pmid, pdel, rpdel,
                                            dse, q[:, :, 0], phis)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(zi2), np.asarray(zi), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(zm2), np.asarray(zm), rtol=1e-10)

    def test_virtual_effect_positive(self):
        pint, t, u, v, q, phis = make_profile()
        pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
        pdel = pint[:, 1:] - pint[:, :-1]
        args = (jnp.log(pint), jnp.log(pmid), pint, pmid, pdel, 1.0 / pdel, t)
        zi_moist, _ = geo.geopotential_t(*args, q[:, :, 0])
        zi_dry, _ = geo.geopotential_t(*args, jnp.zeros_like(t))
        assert np.all(np.asarray(zi_moist[:, :-1]) > np.asarray(zi_dry[:, :-1]))


class TestPhysicsState:
    def setup_method(self):
        self.reg = default_registry()
        pint, t, u, v, q, phis = make_profile(pcnst=self.reg.pcnst)
        self.state = st.make_state_from_profiles(pint, t, u, v, q, phis)

    def test_state_valid(self):
        checks = st.physics_state_check(self.state)
        assert bool(checks["ok"])

    def test_update_heating(self):
        ncol, pver, pcnst = self.state.ncol, self.state.pver, self.state.pcnst
        ptend = st.ptend_init("test", ncol, pver, pcnst, ls=True)
        ptend = ptend.replace(s=jnp.full((ncol, pver), 10.0))  # W/kg
        dt = 100.0
        new, _ = st.physics_update(self.state, ptend, dt, self.reg)
        np.testing.assert_allclose(np.asarray(new.t - self.state.t),
                                   10.0 * dt / c.CPAIR, rtol=1e-12)
        # dse refreshed consistently: s = cp t + g zm + phis
        np.testing.assert_allclose(
            np.asarray(new.s),
            np.asarray(c.CPAIR * new.t + c.GRAVIT * new.zm + new.phis[:, None]),
            rtol=1e-12)

    def test_update_qneg_clamp(self):
        ncol, pver, pcnst = self.state.ncol, self.state.pver, self.state.pcnst
        lq = (True,) + (False,) * (pcnst - 1)
        ptend = st.ptend_init("dryer", ncol, pver, pcnst, lq=lq)
        ptend = ptend.replace(q=ptend.q.at[:, :, 0].set(-1.0))  # huge drying
        new, _ = st.physics_update(self.state, ptend, 1000.0, self.reg)
        assert np.all(np.asarray(new.q[:, :, 0]) >= 1.0e-12)

    def test_update_noop(self):
        ptend = st.ptend_init("noop", self.state.ncol, self.state.pver,
                              self.state.pcnst)
        new, _ = st.physics_update(self.state, ptend, 1800.0, self.reg)
        assert new is self.state

    def test_ptend_sum_and_scale(self):
        ncol, pver, pcnst = self.state.ncol, self.state.pver, self.state.pcnst
        a = st.ptend_init("a", ncol, pver, pcnst, ls=True)
        a = a.replace(s=jnp.ones((ncol, pver)))
        b = st.ptend_init("b", ncol, pver, pcnst, ls=True, lu=True)
        b = b.replace(s=2 * jnp.ones((ncol, pver)), u=jnp.ones((ncol, pver)))
        tot = st.ptend_sum(a, b)
        assert tot.ls and tot.lu and not tot.lv
        np.testing.assert_allclose(np.asarray(tot.s), 3.0)
        half = st.ptend_scale(tot, 0.5)
        np.testing.assert_allclose(np.asarray(half.s), 1.5)

    def test_dry_wet_roundtrip(self):
        s1 = st.set_wet_to_dry(self.state, self.reg)
        s2 = st.set_dry_to_wet(s1, self.reg)
        np.testing.assert_allclose(np.asarray(s2.q), np.asarray(self.state.q),
                                   rtol=1e-13)

    def test_pdry_consistency(self):
        # pdeldry + vapor mass = pdel
        got = np.asarray(self.state.pdeldry + self.state.pdel * self.state.q[:, :, 0])
        np.testing.assert_allclose(got, np.asarray(self.state.pdel), rtol=1e-12)


class TestCheckEnergy:
    def setup_method(self):
        self.reg = default_registry()
        pint, t, u, v, q, phis = make_profile(pcnst=self.reg.pcnst)
        state = st.make_state_from_profiles(pint, t, u, v, q, phis)
        self.state = ce.check_energy_timestep_init(state, self.reg)

    def test_pure_heating_budget(self):
        # apply uniform heating; energy residual vs expected sensible flux ~ 0
        dt = 1800.0
        heat = 5.0  # W/kg
        ncol, pver, pcnst = self.state.ncol, self.state.pver, self.state.pcnst
        ptend = st.ptend_init("heat", ncol, pver, pcnst, ls=True)
        ptend = ptend.replace(s=jnp.full((ncol, pver), heat))
        new, _ = st.physics_update(self.state, ptend, dt, self.reg)
        flx_sen = jnp.sum(heat * self.state.pdel / c.GRAVIT, axis=-1)
        new, diag = ce.check_energy_chng(new, self.reg, dt, flx_sen=flx_sen)
        rel = np.abs(np.asarray(diag.te_err)) / np.abs(np.asarray(diag.te))
        assert np.all(rel < 1e-12)

    def test_no_op_conserves(self):
        dt = 1800.0
        _, diag = ce.check_energy_chng(self.state, self.reg, dt)
        assert np.all(np.abs(np.asarray(diag.te_err)) < 1e-6)
        assert np.all(np.abs(np.asarray(diag.tw_err)) < 1e-15)
