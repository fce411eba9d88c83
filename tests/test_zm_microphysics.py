"""ZM two-moment convective microphysics: conservation, phase routing,
process activation, intr pipeline (zm_mphy contract,
/root/reference/physics/zm_conv.F90:3826-3851)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Big-compile tests: serialized onto one xdist worker (--dist loadgroup) so
# concurrent XLA CPU compiles don't abort under memory pressure (observed
# 'Fatal Python error: Aborted' inside backend_compile_and_load when four
# workers compiled coupled-step graphs simultaneously).
pytestmark = pytest.mark.xdist_group("heavy")

from cam_nor_physics_tpu.models.physics.zm_microphysics import (
    M_ACT, NACT_LND, NACT_OCN, T_HOM, zm_mphy)


def _plume(ncol=3, pver=12, t_sfc=295.0, lapse=7.0, src_peak=2e-7, seed=0):
    """Synthetic triggered plume: base at pver-2, top at 2."""
    rng = np.random.default_rng(seed)
    z = np.linspace(12e3, 0.0, pver)
    t = jnp.asarray(np.tile(t_sfc - lapse * z / 1e3, (ncol, 1)))
    pmid = jnp.asarray(np.tile(1e5 * np.exp(-z / 8e3), (ncol, 1)))
    dp = jnp.full((ncol, pver), 40.0)                    # mb
    jt = jnp.full((ncol,), 2, jnp.int32)
    maxg = jnp.full((ncol,), pver - 2, jnp.int32)
    karr = np.arange(pver)
    inp = (karr[None, :] >= 2) & (karr[None, :] <= pver - 2)
    mu = jnp.asarray(np.where(inp, 0.02, 0.0) *
                     (1.0 + 0.1 * rng.random((ncol, pver))))   # mb/s
    du = jnp.asarray(np.where(karr[None, :] <= 5, 2e-4, 1e-5) * inp)
    dlf = jnp.asarray(np.where(inp, src_peak, 0.0))
    rprd = jnp.asarray(np.where(inp, 0.5 * src_peak, 0.0))
    landfrac = jnp.asarray([0.0, 1.0, 0.5][:ncol])
    return dict(t=t, pmid=pmid, dp=dp, mu=mu, du=du, dlf_in=dlf,
                rprd_in=rprd, landfrac=landfrac, jt=jt, maxg=maxg)


class TestConservation:
    def test_condensate_closure(self):
        """Column integral of all sinks equals the condensate source."""
        p = _plume()
        out = zm_mphy(**p)
        dp = np.asarray(p["dp"])
        src = np.asarray(p["dlf_in"] + p["rprd_in"])
        sinks = np.asarray(out.dlf + out.dif + out.rprd + out.sprd)
        np.testing.assert_allclose((sinks * dp).sum(axis=1),
                                   (src * dp).sum(axis=1), rtol=1e-9)

    def test_nothing_outside_plume(self):
        p = _plume()
        out = zm_mphy(**p)
        for f in (out.dlf, out.dif, out.rprd, out.sprd, out.qliq, out.qice):
            a = np.asarray(f)
            assert np.all(a[:, :2] == 0.0)
            assert np.all(a[:, -1:] == 0.0)

    def test_untriggered_column_all_zero(self):
        p = _plume()
        p["dlf_in"] = jnp.zeros_like(p["dlf_in"])
        p["rprd_in"] = jnp.zeros_like(p["rprd_in"])
        out = zm_mphy(**p)
        assert float(jnp.abs(out.dlf + out.dif + out.rprd + out.sprd
                             + out.frz).max()) == 0.0


class TestPhase:
    def test_warm_plume_all_liquid(self):
        p = _plume(t_sfc=305.0, lapse=3.0)     # whole plume above freezing
        out = zm_mphy(**p)
        np.testing.assert_allclose(np.asarray(out.dif), 0.0, atol=1e-30)
        np.testing.assert_allclose(np.asarray(out.sprd), 0.0, atol=1e-30)
        np.testing.assert_allclose(np.asarray(out.frz), 0.0, atol=1e-30)
        assert float(out.dlf.max()) > 0.0

    def test_homogeneous_freezing_above_minus40(self):
        """All condensate carried above the homogeneous level is ice."""
        p = _plume(t_sfc=295.0, lapse=9.0)     # top well below T_HOM
        out = zm_mphy(**p)
        t = np.asarray(p["t"])
        cold = t <= T_HOM
        assert np.all(np.asarray(out.qliq)[cold] == 0.0)
        # and freezing heated somewhere
        assert float(out.frz.max()) > 0.0

    def test_cold_plume_detains_ice(self):
        p = _plume(t_sfc=295.0, lapse=9.0)
        out = zm_mphy(**p)
        assert float((np.asarray(out.dif) *
                      np.asarray(p["dp"])).sum()) > 0.0


class TestNumbers:
    def test_land_ocean_droplet_number_contrast(self):
        """Activation cap: land plume holds more, smaller droplets."""
        p = _plume(ncol=2, t_sfc=305.0, lapse=3.0, src_peak=5e-6)
        p["landfrac"] = jnp.asarray([0.0, 1.0])
        out = zm_mphy(**p)
        qnl = np.asarray(out.qnl)
        inp = qnl[:, 4:-2] > 0
        # capped at the activated supply
        assert qnl[0].max() <= NACT_OCN * (1 + 1e-6)
        assert qnl[1].max() <= NACT_LND * (1 + 1e-6)

    def test_number_mass_consistency_fresh(self):
        """With tiny sources (no conversion), numbers ride mass at the
        activation size."""
        p = _plume(t_sfc=305.0, lapse=3.0, src_peak=1e-12)
        out = zm_mphy(**p)
        ql, nl = np.asarray(out.qliq), np.asarray(out.qnl)
        m = ql > 0
        np.testing.assert_allclose(nl[m], ql[m] / M_ACT, rtol=1e-6)

    def test_autoconversion_strips_number_with_mass(self):
        p_small = _plume(t_sfc=305.0, lapse=3.0, src_peak=1e-8)
        p_big = _plume(t_sfc=305.0, lapse=3.0, src_peak=5e-5)
        rain_small = float((zm_mphy(**p_small).rprd).sum())
        rain_big = float((zm_mphy(**p_big).rprd).sum())
        src_ratio = 5e-5 / 1e-8
        # KK2000 is superlinear in ql: rain grows faster than the source
        assert rain_big / max(rain_small, 1e-30) > src_ratio


class TestIntrPipeline:
    def test_intr_microp_pipeline(self):
        """zm_conv_tend with cfg.microp writes the number/phase pbuf set."""
        from cam_nor_physics_tpu.models.physics.constituents import \
            default_registry
        from cam_nor_physics_tpu.models.physics.physics_buffer import (
            pbuf_register, zm_pbuf_specs)
        from cam_nor_physics_tpu.models.physics.state import \
            make_state_from_profiles
        from cam_nor_physics_tpu.models.physics.zm_conv_intr import \
            zm_conv_tend
        from cam_nor_physics_tpu.utils.config import ZMConfig

        ncol, pver = 4, 26
        reg = default_registry()
        eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
        pint = jnp.asarray(eta[None, :] * 1.0e5 * np.ones((ncol, 1)))
        pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
        t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0)
        t = t.at[:, -1].add(2.0)
        q0 = 0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6
        q = jnp.zeros((ncol, pver, reg.pcnst)).at[:, :, 0].set(q0)
        st = make_state_from_profiles(
            pint, t, jnp.zeros((ncol, pver)), jnp.zeros((ncol, pver)), q,
            jnp.zeros((ncol,)))
        pbuf = pbuf_register(zm_pbuf_specs(ncol, pver))
        pbuf = pbuf.set("CLD", jnp.full((ncol, pver), 0.1))
        cfg = ZMConfig(microp=True)
        out = jax.jit(lambda: zm_conv_tend(
            cfg, reg, st, pbuf, jnp.full((ncol,), 800.0),
            jnp.full((ncol,), 0.3), jnp.ones((ncol,)), 1800.0))()
        for name in ["DNLFZM", "DNIFZM", "DP_CLDLIQ", "DP_CLDICE",
                     "DLFZM", "DIFZM"]:
            assert bool(jnp.isfinite(out.pbuf.get(name)).all())
        assert "ZMSPRD" in out.diagnostics

    def test_microp_changes_phase_partition(self):
        """microp on vs off changes the detrained phase split (VERDICT
        round-1 item 9 acceptance)."""
        from cam_nor_physics_tpu.models.physics.constituents import \
            default_registry
        from cam_nor_physics_tpu.models.physics.physics_buffer import (
            pbuf_register, zm_pbuf_specs)
        from cam_nor_physics_tpu.models.physics.state import \
            make_state_from_profiles
        from cam_nor_physics_tpu.models.physics.zm_conv_intr import \
            zm_conv_tend
        from cam_nor_physics_tpu.utils.config import ZMConfig

        ncol, pver = 4, 26
        reg = default_registry()
        eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
        pint = jnp.asarray(eta[None, :] * 1.0e5 * np.ones((ncol, 1)))
        pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
        t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0)
        t = t.at[:, -1].add(2.0)
        q0 = 0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6
        q = jnp.zeros((ncol, pver, reg.pcnst)).at[:, :, 0].set(q0)
        st = make_state_from_profiles(
            pint, t, jnp.zeros((ncol, pver)), jnp.zeros((ncol, pver)), q,
            jnp.zeros((ncol,)))
        pbuf = pbuf_register(zm_pbuf_specs(ncol, pver))
        pbuf = pbuf.set("CLD", jnp.full((ncol, pver), 0.1))
        run = lambda microp: zm_conv_tend(
            ZMConfig(microp=microp), reg, st, pbuf,
            jnp.full((ncol,), 800.0), jnp.full((ncol,), 0.3),
            jnp.ones((ncol,)), 1800.0)
        on, off = run(True), run(False)
        if float(on.diagnostics["FREQZM"].max()) > 0:
            dif_on = float(jnp.abs(on.pbuf.get("DIFZM")).max())
            dlf_off = on.pbuf.get("DLFZM")
            assert not bool(jnp.array_equal(dlf_off, off.pbuf.get("DLFZM")))


class TestAeroActivation:
    """Aerosol-based activation (zm_aero_t role) + the accretion /
    ice-nucleation process tail (VERDICT r2 item 7)."""

    def _aero(self, p, num=3e8, dg=0.15e-6, nmodes=2):
        ncol, pver = p["t"].shape
        return dict(
            num=jnp.full((ncol, pver, nmodes), num / nmodes),
            dgnum=jnp.full((ncol, pver, nmodes), dg),
            hygro=(0.5,) * nmodes)

    def test_aero_bundle_changes_partition(self):
        p = _plume()
        base = zm_mphy(**p)
        pol = zm_mphy(**p, aero=self._aero(p, num=3e9))
        assert not np.allclose(np.asarray(base.rprd), np.asarray(pol.rprd))
        # conservation closure holds with aerosol activation too
        dp = np.asarray(p["dp"])
        src = np.asarray(p["dlf_in"] + p["rprd_in"])
        sinks = np.asarray(pol.dlf + pol.dif + pol.rprd + pol.sprd)
        np.testing.assert_allclose((sinks * dp).sum(axis=1),
                                   (src * dp).sum(axis=1), rtol=1e-9)

    def test_second_indirect_effect(self):
        """More CCN -> more, smaller droplets -> suppressed warm rain
        (the KK2000 Nc^-1.79 dependence through activation)."""
        p = _plume(t_sfc=302.0)   # warm plume: rain, not snow
        clean = zm_mphy(**p, aero=self._aero(p, num=5e7))
        polluted = zm_mphy(**p, aero=self._aero(p, num=5e9))
        dp = np.asarray(p["dp"])
        rain = lambda o: float((np.asarray(o.rprd) * dp).sum())
        assert rain(polluted) < rain(clean)
        # and the polluted plume carries more droplets
        assert float(np.asarray(polluted.qnl).max()) > \
            float(np.asarray(clean.qnl).max())

    def test_cold_plume_ice_nucleation(self):
        """Cooper nucleation populates crystal number in cold (but not
        homogeneous-regime) layers."""
        p = _plume(t_sfc=278.0, lapse=7.5)
        out = zm_mphy(**p)
        t = np.asarray(p["t"])
        cold = (t < 268.0) & (t > T_HOM) & (np.asarray(out.qice) > 0)
        assert cold.any()
        assert float(np.asarray(out.qni)[cold].max()) > 0.0
