"""ZM in-plume two-moment convective microphysics (round-4 VERDICT #4).

The scheme runs INSIDE cldprp's plume iteration (zm_conv.zm_mphy; reference
call site /root/reference/physics/zm_conv.F90:3782-3793): freezing heat
enters the updraft MSE budget and the large-scale heating at exactly the
freezing levels, the freezing-CAPE increment boosts the closure, and the
condensate/number detrainment streams feed the stratiform interface. The
old post-pass re-routing is deleted."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.xdist_group("heavy")

from cam_nor_physics_tpu.models.physics import zm_conv as zm
from cam_nor_physics_tpu.models.physics.zm_microphysics import (NACT_LND,
                                                                NACT_OCN)
from cam_nor_physics_tpu.utils import constants as c
from cam_nor_physics_tpu.utils.config import ZMConfig

from test_zm_conv import MSG, make_sounding


def _run(cfg=None, **kw):
    s = make_sounding(ncol=8, pver=26, unstable=True, seed=3, **kw)
    cfg = cfg or ZMConfig(microp=True)
    out = zm.zm_convr(cfg, MSG, s["t"], s["q"], s["pmid"], s["pint"],
                      s["pdel"], s["zm"], s["geos"], s["zi"], s["pblh"],
                      s["tpert"], s["landfrac"], 900.0)
    return s, out


# ONE microp-on and ONE microp-off zm_convr execution shared module-wide:
# repeated big eager-scan compiles in one process trip the known XLA:CPU
# compile-state crash (see tests/test_zm_conv.py); tests that need a
# DIFFERENT configuration (aero bundle, ocean surface, full tphysbc) run
# subprocess-isolated instead.
@pytest.fixture(scope="module")
def on():
    return _run()


@pytest.fixture(scope="module")
def off():
    return _run(cfg=ZMConfig(microp=False))


class TestInPlumeFreezing:
    def test_frz_localized_to_cold_plume_levels(self, on):
        s, out = on
        frz = np.asarray(out.frz)
        assert frz.min() >= 0.0
        assert frz.max() > 0.0, "glaciating sounding must freeze"
        t_env = np.asarray(s["t"])
        karr = np.arange(t_env.shape[1])[None, :]
        jt = np.asarray(out.jt)[:, None]
        jb = np.asarray(out.maxg)[:, None]
        in_plume = (karr >= jt) & (karr < jb)
        assert (frz[~in_plume] == 0.0).all(), "frz outside the plume"
        # the plume is warmer than the environment by at most a few K:
        # freezing cannot occur where the environment is far above 0 C
        assert (frz[t_env > c.TMELT + 10.0] == 0.0).all()

    def test_freezing_heat_enters_at_freezing_levels(self, on):
        """q1q2's dsdt with the microp extras differs from the plain call
        by EXACTLY latice/cp * frz at every interior level — the heating
        enters the large-scale budget where the plume froze
        (zm_conv.F90:4378)."""
        s, out = on
        ncol, pver = np.asarray(s["t"]).shape
        # all mass-flux/condensation terms zero -> dsdt is EXACTLY the
        # freezing term where it applies
        z = jnp.zeros((ncol, pver))
        dsub = jnp.ones((ncol,))
        jt, mx, frz = out.jt, out.maxg, out.frz
        withf = zm.q1q2_pjr(MSG, z, z, z, z, z, z, z,
                            jnp.ones((ncol, pver)), z, z, z, z, z, dsub,
                            jt, mx, (z, z),
                            microp_extra=(frz, z, z, z))
        karr = np.arange(pver)[None, :]
        in_main = (karr >= np.asarray(jt)[:, None]) & (karr <= pver - 2) & \
            (karr < np.asarray(mx)[:, None])
        dd = np.asarray(withf[1])
        expect = np.asarray(c.LATICE / zm.CP * frz)
        np.testing.assert_array_equal(dd[in_main], expect[in_main])
        # and nowhere else (outside [jt, pver-2] the term is masked;
        # below mx the subcloud overwrite governs)
        above = karr < np.asarray(jt)[:, None]
        assert (dd[above] == 0.0).all()

    def test_dcape_positive_and_boosts_cape(self, on, off):
        """The second plume iteration re-ascends with the freezing heat:
        the freezing-CAPE increment is positive for a glaciating plume and
        is included in the reported CAPE (capeg += dcape,
        zm_conv.F90:1242-1246)."""
        s, out_on = on
        _, out_off = off
        trig = np.asarray(out_on.ideep)
        assert trig.any()
        dcape = np.asarray(out_on.dcape)
        assert dcape[trig].max() > 0.0
        np.testing.assert_allclose(
            np.asarray(out_on.cape), np.asarray(out_off.cape) + dcape,
            rtol=1e-10, atol=1e-8)


class TestConservation:
    def test_energy_and_water_closure_through_tphysbc(self, request):
        """Full-pipeline closure with microp ON: tphysbc's check_energy
        budget (flx_cnd = prec + rliq, flx_ice = snow + rice) must close —
        the in-plume re-partition cannot leak energy or water.
        Subprocess-isolated (big fresh compile)."""
        from conftest import run_test_in_subprocess
        if run_test_in_subprocess(request):
            return
        from test_snapshot import _setup
        from cam_nor_physics_tpu.models.physics.physpkg import phys_run1

        reg, st, pbuf, cam_in, pcfg, _ = _setup(ncol=8, pver=26)
        zcfg = ZMConfig(microp=True)
        o1 = phys_run1(pcfg, zcfg, reg, st, pbuf, cam_in, 1800.0, nstep=0)
        te_err = np.asarray(o1.diagnostics["ZM_TE_ERR"])
        # f64 roundoff scale: column te ~ 2.5e9 J/m2, so ~1e-7-absolute
        # noise is machine epsilon; a real bookkeeping leak measured 5e5
        assert np.abs(te_err).max() < 1.0e-4, te_err
        for leaf in jax.tree.leaves(o1.state):
            assert bool(jnp.isfinite(leaf).all())

    def test_no_negative_vapor_projection(self, on):
        """The negadq fixer (zm_conv.F90:1400-1470, vectorized form): the
        projected vapor q + 2*delt*qtnd never goes negative."""
        s, out = on
        q_new = np.asarray(s["q"]) + 2.0 * 900.0 * np.asarray(out.qtnd)
        assert q_new.min() >= -1e-15, q_new.min()

    def test_prec_accounts_detrained_ice(self, on):
        """prec = -sum(dpp*(dq + (dlf+dif)*2dt))/...: recompute from the
        outputs (zm_conv.F90:1628-1639) — exact by construction, pinned so
        the dif stream stays in the budget."""
        s, out = on
        dpp = np.asarray(s["pdel"])
        delt = 900.0
        dq = 2.0 * delt * np.asarray(out.qtnd)
        acc = np.sum(-dpp * dq - dpp * (np.asarray(out.dlf) +
                                        np.asarray(out.dif)) * 2.0 * delt,
                     axis=1)
        want = np.maximum(acc, 0.0) / c.GRAVIT / (2.0 * delt) / 1000.0
        np.testing.assert_allclose(np.asarray(out.prec), want,
                                   rtol=1e-10, atol=1e-18)
        # and rice is the ice part of rliq
        assert (np.asarray(out.rice) <= np.asarray(out.rliq) + 1e-20).all()


class TestPhaseAndNumbers:
    def test_cold_plume_detrains_ice_and_crystal_number(self, on):
        s, out = on
        trig = np.asarray(out.ideep)
        assert np.asarray(out.dif)[trig].max() > 0.0
        assert np.asarray(out.dnif)[trig].max() > 0.0
        assert np.asarray(out.sprd).min() >= 0.0
        # snow is part of TOTAL production, but rprd has the downdraft
        # evaporation subtracted (and can be legitimately negative there —
        # zm_conv.F90's 'negative precip production' comment), so the
        # sprd <= rprd containment only holds where rprd >= 0
        r = np.asarray(out.rprd)
        s_ = np.asarray(out.sprd)
        assert (s_[r >= 0.0] <= r[r >= 0.0] + 1e-20).all()

    def test_droplet_number_capped_by_activation(self, on):
        s, out = on
        assert np.asarray(out.qnl).max() <= NACT_LND * (1.0 + 1e-12)

    def test_ocean_fewer_droplets_than_land(self, request):
        from conftest import run_test_in_subprocess
        if run_test_in_subprocess(request):
            return
        s = make_sounding(ncol=8, pver=26, unstable=True, seed=3)
        cfg = ZMConfig(microp=True)
        args = (MSG, s["t"], s["q"], s["pmid"], s["pint"], s["pdel"],
                s["zm"], s["geos"], s["zi"], s["pblh"], s["tpert"])
        lnd = zm.zm_convr(cfg, *args, jnp.ones((8,)), 900.0)
        ocn = zm.zm_convr(cfg, *args, jnp.zeros((8,)), 900.0)
        nl_l = np.asarray(lnd.qnl).max()
        nl_o = np.asarray(ocn.qnl).max()
        assert nl_o < nl_l
        assert nl_o <= NACT_OCN * (1.0 + 1e-12)

    def test_aero_bundle_controls_activation(self, request):
        """An explicit (sparse) modal aerosol bundle lowers the activated
        number vs the land default — the zm_aero_t pathway into the
        in-plume scheme."""
        from conftest import run_test_in_subprocess
        if run_test_in_subprocess(request):
            return
        s = make_sounding(ncol=8, pver=26, unstable=True, seed=3)
        cfg = ZMConfig(microp=True)
        args = (MSG, s["t"], s["q"], s["pmid"], s["pint"], s["pdel"],
                s["zm"], s["geos"], s["zi"], s["pblh"], s["tpert"],
                s["landfrac"], 900.0)
        aero = dict(num=jnp.full((8, 26, 1), 5.0e6),
                    dgnum=jnp.full((8, 26, 1), 0.1e-6), hygro=(0.5,))
        clean = zm.zm_convr(cfg, *args, aero=aero)
        dflt = zm.zm_convr(cfg, *args)
        assert np.asarray(clean.qnl).max() < np.asarray(dflt.qnl).max()

    def test_updraft_velocity_diagnosed(self, on):
        s, out = on
        wu = np.asarray(out.wu)
        trig = np.asarray(out.ideep)
        assert np.isfinite(wu).all()
        assert wu[trig].max() > 0.5


class TestMicropOffUnchanged:
    def test_off_path_fields_zero(self, off):
        _, out = off
        for f in ("dif", "dnlf", "dnif", "sprd", "frz", "qliq", "qice",
                  "qnl", "qni", "wu"):
            assert float(jnp.abs(getattr(out, f)).max()) == 0.0, f
        assert float(jnp.abs(out.dcape).max()) == 0.0


class TestPostPassDeleted:
    def test_post_pass_gone(self):
        """The round-3 post-pass re-routing is deleted: zm_microphysics
        keeps only constants + activation; the scheme is zm_conv.zm_mphy
        with the in-plume (cldprp-units) contract."""
        from cam_nor_physics_tpu.models.physics import zm_microphysics as m
        assert not hasattr(m, "zm_mphy")
        assert hasattr(zm, "zm_mphy")
        import inspect
        sig = inspect.signature(zm.zm_mphy)
        assert "cmel" in sig.parameters and "cmei" in sig.parameters


class TestProcessRateDiagnostics:
    def test_conv_rate_family_present_and_consistent(self, on):
        """The zm_conv_micro_outfld payload (zm_conv_intr.F90:1292-1390):
        per-process rates are nonnegative, localized to the plume, and the
        mass pieces account for the total production/freezing."""
        s, out = on
        r = out.mrates
        for k in ("AUTOL_M", "ACCRL_M", "FHTIM_M", "FHTCT_M", "HMPI_M",
                  "ACTIV_N", "AUTOL_N", "ACCRL_N", "FHTIM_N", "FHTCT_N"):
            assert k in r, k
            assert float(jnp.min(r[k])) >= 0.0, k
        # total production = autoconversion + accretion (rain) + snow;
        # out.rprd is that total MINUS downdraft evaporation, so the
        # column-integrated process rates must bound it from above
        prod = (np.asarray(r["AUTOL_M"]) + np.asarray(r["ACCRL_M"]) +
                np.asarray(out.sprd))
        dpm = np.asarray(s["pdel"])
        tot_prod = np.sum(prod * dpm, axis=1)
        tot_r = np.sum(np.asarray(out.rprd) * dpm, axis=1)
        assert (tot_prod >= tot_r - 1e-12).all()
        assert np.asarray(r["ACTIV_N"]).max() > 0.0
        assert np.asarray(r["FHTIM_M"]).max() + \
            np.asarray(r["FHTCT_M"]).max() > 0.0
        # WBF runs where ice coexists with liquid in mixed phase
        assert "BERGN_M" in r
        assert np.asarray(r["BERGN_M"]).min() >= 0.0
        assert np.asarray(r["BERGN_M"]).max() > 0.0
