"""Diagnostics tests: TEM interpolation/eddy fluxes, cam_diagnostics payloads."""

import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.fv.ctem import (ctem_diags,
                                                interp_to_pressure)
from cam_nor_physics_tpu.models.physics.cam_diagnostics import (
    diag_conv, diag_conv_tend_ini, diag_export, diag_phys_writeout,
    diag_register, diag_surf)
from cam_nor_physics_tpu.utils.history import HistoryRegistry


class TestInterp:
    def test_linear_in_logp_exact(self):
        km, jm, im = 8, 4, 6
        pmid = jnp.broadcast_to(
            jnp.geomspace(1e3, 1e5, km)[:, None, None], (km, jm, im))
        # field linear in ln p interpolates exactly
        field = 3.0 * jnp.log(pmid) - 7.0
        plev = np.geomspace(2e3, 8e4, 5)
        out = interp_to_pressure(field, pmid, plev)
        ref = 3.0 * np.log(plev)[:, None, None] - 7.0
        np.testing.assert_allclose(np.asarray(out),
                                   np.broadcast_to(ref, (5, jm, im)),
                                   rtol=1e-12)

    def test_out_of_range_clamps(self):
        km, jm, im = 4, 2, 3
        pmid = jnp.broadcast_to(
            jnp.geomspace(1e4, 9e4, km)[:, None, None], (km, jm, im))
        field = jnp.broadcast_to(
            jnp.arange(km, dtype=jnp.float64)[:, None, None], (km, jm, im))
        out = interp_to_pressure(field, pmid, np.array([1e3, 1e5]))
        np.testing.assert_allclose(np.asarray(out[0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[1]), km - 1.0)


class TestCtem:
    def test_zonal_symmetric_flow_has_no_eddy_flux(self):
        km, jm, im = 6, 8, 12
        pmid = jnp.broadcast_to(
            jnp.geomspace(1e4, 1e5, km)[:, None, None], (km, jm, im))
        lat = jnp.linspace(-1.0, 1.0, jm)[None, :, None]
        u = 20.0 * jnp.cos(lat) * jnp.ones((km, jm, im))
        v = jnp.zeros((km, jm, im))
        w = jnp.zeros((km, jm, im))
        t = 280.0 * jnp.ones((km, jm, im))
        d = ctem_diags(u, v, w, t, pmid)
        np.testing.assert_allclose(np.asarray(d["UV2d"]), 0.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(d["VTH2d"]), 0.0, atol=1e-10)

    def test_correlated_eddies_produce_flux(self):
        km, jm, im = 4, 6, 16
        pmid = jnp.broadcast_to(
            jnp.geomspace(1e4, 1e5, km)[:, None, None], (km, jm, im))
        x = jnp.sin(2 * jnp.pi * jnp.arange(im) / im)[None, None, :]
        ones = jnp.ones((km, jm, im))
        v = 5.0 * x * ones
        t = 280.0 + 2.0 * x * ones          # v' and theta' in phase
        d = ctem_diags(jnp.zeros_like(v), v, jnp.zeros_like(v), t, pmid)
        assert float(np.asarray(d["VTH2d"]).min()) > 0.0


class TestCamDiagnostics:
    def _mini_state(self):
        from cam_nor_physics_tpu.models.physics.state import \
            make_state_from_profiles
        ncol, pver, pcnst = 4, 8, 3
        pint = jnp.broadcast_to(jnp.linspace(1e3, 1e5, pver + 1),
                                (ncol, pver + 1))
        t = jnp.full((ncol, pver), 270.0)
        q = jnp.full((ncol, pver, pcnst), 1e-4)
        return make_state_from_profiles(
            pint, t, jnp.zeros((ncol, pver)), jnp.zeros((ncol, pver)), q,
            jnp.zeros((ncol,)))

    def test_payloads_and_registration(self):
        st = self._mini_state()
        reg = HistoryRegistry()
        reg.addfld("T", "K", "Temperature")
        diag_register(reg)
        out = diag_phys_writeout(st)
        assert set(out) >= {"T", "Q", "PS", "TMQ", "RELHUM"}
        tmq = np.asarray(out["TMQ"])
        np.testing.assert_allclose(
            tmq, np.asarray((st.q[:, :, 0] * st.pdel).sum(-1)) / 9.80616,
            rtol=1e-12)
        ini = diag_conv_tend_ini(st)
        st2 = st.replace(t=st.t + 1.0,
                         q=st.q.at[:, :, 1].add(2e-5).at[:, :, 2].add(-1e-5))
        dc = diag_conv(st2, ini, 100.0,
                       cnst_names=("Q", "CLDLIQ", "CLDICE"))
        np.testing.assert_allclose(np.asarray(dc["DTCOND"]), 0.01)
        np.testing.assert_allclose(np.asarray(dc["DCQ"]), 0.0, atol=1e-18)
        np.testing.assert_allclose(np.asarray(dc["DCCLDLIQ"]), 2e-7,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(dc["DCCLDICE"]), -1e-7,
                                   rtol=1e-10)

    def test_surface_and_export(self):
        from cam_nor_physics_tpu.models.coupling.camsrfexch import (CamIn,
                                                                    CamOut)
        cam_in = CamIn.zeros(4, 3)
        cam_out = CamOut.zeros(4, 3)
        s = diag_surf(cam_in, cam_out)
        e = diag_export(cam_out)
        assert "SHFLX" in s and "PRECT" in e


class TestTidalDiag:
    def test_coeff_identities(self):
        """tidal_coeffs: n-harmonic sin/cos of local solar time, lon in
        radians. At UTC noon (time_days=0.5) and lon=0 the 24h phase is π:
        sin=0, cos=-1; the 12h harmonic is back at 2π: sin=0, cos=+1."""
        from cam_nor_physics_tpu.models.physics.cam_diagnostics import \
            tidal_coeffs
        lons = jnp.asarray([0.0, np.pi / 2])
        co = np.asarray(tidal_coeffs(lons, 0.5))
        assert co.shape == (6, 2)
        np.testing.assert_allclose(co[0, 0], 0.0, atol=1e-12)   # 24 sin
        np.testing.assert_allclose(co[1, 0], -1.0, rtol=1e-12)  # 24 cos
        np.testing.assert_allclose(co[2, 0], 0.0, atol=1e-12)   # 12 sin
        np.testing.assert_allclose(co[3, 0], 1.0, rtol=1e-12)   # 12 cos
        # lon=π/2 shifts the 24h phase by π/2: sin(3π/2) = -1
        np.testing.assert_allclose(co[0, 1], -1.0, rtol=1e-12)

    def test_product_layout(self):
        """diag_conv_tidal tiles (6, im) coefficients over the row-major
        (jm*im) column order: every latitude row sees the same lon
        pattern."""
        from cam_nor_physics_tpu.models.physics.cam_diagnostics import \
            diag_conv_tidal, tidal_coeffs
        im, jm, pver = 6, 3, 2
        lons = jnp.linspace(0, 2 * np.pi, im, endpoint=False)
        co = tidal_coeffs(lons, 0.25)
        dt = jnp.ones((jm * im, pver))
        out = diag_conv_tidal(dt, co)
        assert set(out) == {"DTCOND_24_SIN", "DTCOND_24_COS",
                           "DTCOND_12_SIN", "DTCOND_12_COS",
                           "DTCOND_08_SIN", "DTCOND_08_COS"}
        field = np.asarray(out["DTCOND_24_SIN"])[:, 0].reshape(jm, im)
        np.testing.assert_allclose(field, np.broadcast_to(
            np.asarray(co[0])[None], (jm, im)), rtol=1e-12)


class TestDiagConvWiring:
    def test_atm_step_emits_moist_budget_family(self):
        """End-to-end: the coupled step's diagnostics dict carries the
        DTCOND/DC* family and the tidal products, and DTCOND reflects the
        tphysbc snapshot → tphysac bracket (finite, consistent with the
        tidal identity DTCOND_24_SIN = DTCOND·coeff)."""
        from cam_nor_physics_tpu.models.atm_comp import (AtmModel, atm_init,
                                                         atm_step)
        from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
        from cam_nor_physics_tpu.models.fv.held_suarez import \
            hs_initial_state
        from cam_nor_physics_tpu.models.physics.cam_diagnostics import \
            tidal_coeffs
        from cam_nor_physics_tpu.utils.config import FVConfig

        model = AtmModel.create(16, 8, 6, dt=1800.0,
                                fv_cfg=FVConfig(nsplit=1, nspltrac=1))
        dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                                nq=model.registry.pcnst)
        dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4))
        state = atm_init(model, dyn0, jnp.zeros((8, 16)))
        cam_in = CamIn.zeros(8 * 16, model.registry.pcnst)
        state, _, diags = atm_step(model, state, cam_in, first_step=True)
        for name in ("DTCOND", "DCQ", "DCCLDLIQ", "DCCLDICE",
                     "DTCOND_24_SIN", "DTCOND_08_COS",
                     "QBP", "QAP", "CLDLIQBP", "CLDICEAP",
                     "CB_CLDLIQ", "CB_CLDICE"):
            assert name in diags, name
            assert np.isfinite(np.asarray(diags[name])).all(), name
        co = tidal_coeffs(jnp.asarray(model.grid.lons),
                          float(state.nstep) * 1800.0 / 86400.0,
                          diags["DTCOND"].dtype)
        im = 16
        col = np.tile(np.asarray(co[0]), 8)
        np.testing.assert_allclose(
            np.asarray(diags["DTCOND_24_SIN"]),
            np.asarray(diags["DTCOND"]) * col[:, None], rtol=1e-12,
            atol=1e-300)


class TestPlevelAndCloud:
    def test_plevel_slice_exact_linear_in_logp(self):
        from cam_nor_physics_tpu.models.physics.cam_diagnostics import \
            plevel_slice
        ncol, pver = 8, 20
        pmid = jnp.asarray(np.broadcast_to(
            np.geomspace(100e2, 1000e2, pver)[None], (ncol, pver)))
        # field linear in ln p interpolates exactly
        f = 3.0 * jnp.log(pmid) - 7.0
        got = plevel_slice(f, pmid, 512e2)
        np.testing.assert_allclose(np.asarray(got),
                                   3.0 * np.log(512e2) - 7.0, rtol=1e-6)
        # clamped outside range
        top = plevel_slice(f, pmid, 10e2)
        np.testing.assert_allclose(np.asarray(top), np.asarray(f[:, 0]),
                                   rtol=1e-6)

    def test_cloud_overlap_limits(self):
        from cam_nor_physics_tpu.models.physics.cam_diagnostics import \
            diag_cloud
        ncol, pver = 4, 10
        pmid = jnp.asarray(np.broadcast_to(
            np.geomspace(100e2, 1000e2, pver)[None], (ncol, pver)))
        clear = diag_cloud(jnp.zeros((ncol, pver)), pmid)
        assert float(jnp.abs(clear["CLDTOT"]).max()) < 1e-6
        # one fully overcast low layer -> CLDTOT = CLDLOW = 1, CLDHGH = 0
        cld = jnp.zeros((ncol, pver)).at[:, -1].set(1.0)
        out = diag_cloud(cld, pmid)
        np.testing.assert_allclose(np.asarray(out["CLDTOT"]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["CLDLOW"]), 1.0, atol=1e-6)
        assert float(out["CLDHGH"].max()) < 1e-6
        # maximum-random: two adjacent 0.5 layers overlap maximally -> 0.5
        cld2 = jnp.zeros((ncol, pver)).at[:, -2:].set(0.5)
        out2 = diag_cloud(cld2, pmid)
        np.testing.assert_allclose(np.asarray(out2["CLDTOT"]), 0.5,
                                   atol=1e-6)
        # separated layers combine randomly: 1-(1-.5)(1-.5) = 0.75
        cld3 = jnp.zeros((ncol, pver)).at[:, -1].set(0.5).at[:, 2].set(0.5)
        out3 = diag_cloud(cld3, pmid)
        np.testing.assert_allclose(np.asarray(out3["CLDTOT"]), 0.75,
                                   atol=1e-6)


class TestBudgetTape:
    def test_history_budget_registration_and_tail(self):
        """budget_register routes the history_budget families to their own
        tape (cam_diagnostics.F90:760-850), and the round-5 general-tail
        fields are declared with payloads."""
        from cam_nor_physics_tpu.models.physics.cam_diagnostics import \
            budget_register

        reg = HistoryRegistry()
        diag_register(reg)
        assert len(reg.fields) >= 190
        for name in ("AIRMASS", "TREFMXAV", "TREFMNAV", "U10", "FLUS",
                     "CLDFREE", "PREC_zmc", "PREC_PCW", "DTCORE",
                     "EVAPTZM"):
            assert name in reg.fields, name
        assert reg.fields["TREFMXAV"].avgflag == "X"
        assert reg.fields["TREFMNAV"].avgflag == "M"

        budget_register(reg, tape=1, cnst_names=("Q", "CLDLIQ", "CLDICE"))
        t1 = reg.defaults.get(1, [])
        assert len(t1) >= 30
        for name in ("TTEND_TOT", "TBP", "TAP", "DTCORE", "DTCOND", "ZMDT",
                     "DCQ"):
            assert name in t1, name
        # idempotent: registering twice must not duplicate
        budget_register(reg, tape=1, cnst_names=("Q",))
        assert len(reg.defaults[1]) == len(set(reg.defaults[1]))

    def test_general_tail_payloads(self):
        from cam_nor_physics_tpu.models.physics.state import \
            make_state_from_profiles
        ncol, pver = 4, 8
        pint = jnp.broadcast_to(jnp.linspace(1e4, 1e5, pver + 1),
                                (ncol, pver + 1))
        t = jnp.full((ncol, pver), 280.0)
        q = jnp.full((ncol, pver, 3), 4e-3)
        st = make_state_from_profiles(pint, t, jnp.full((ncol, pver), 5.0),
                                      jnp.zeros((ncol, pver)), q,
                                      jnp.zeros((ncol,)))
        out = diag_phys_writeout(st)
        np.testing.assert_allclose(
            np.asarray(out["AIRMASS"]),
            np.asarray(st.pdeldry.sum(-1)) / 9.80616, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out["CPAIRV"]), 1004.64,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(out["FLUS"]),
                                   5.67e-8 * 280.0 ** 4, rtol=1e-10)
        assert np.asarray(out["U10"]).shape == (ncol,)
