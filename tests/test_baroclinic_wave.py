"""Jablonowski-Williamson (2006) baroclinic-wave analytic IC + dycore test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the 9-day JW06 run is a big compile + long integration: serialize onto
# the heavy xdist worker like the other big-compile modules
pytestmark = pytest.mark.xdist_group("heavy")

from cam_nor_physics_tpu.models.fv.baroclinic_wave import (_phis,
                                                           _temperature,
                                                           _u_balanced,
                                                           jw_baroclinic_wave)
from cam_nor_physics_tpu.models.fv.cd_core import pressure_vars
from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.utils.config import FVConfig


class TestAnalyticFields:
    """Point values against the published JW06 formulas."""

    def test_jet_maximum(self):
        # jet core: eta = eta0, phi = +-45 deg -> u = u0 = 35 m/s
        u = float(_u_balanced(jnp.asarray(0.252), jnp.asarray(np.pi / 4)))
        assert u == pytest.approx(35.0, abs=1e-10)
        assert float(_u_balanced(jnp.asarray(0.252),
                                 jnp.asarray(0.0))) == pytest.approx(0.0)

    def test_temperature_profile_shape(self):
        # JW06 Fig 1b: equatorial surface T ~ 310 K; stratosphere < 215 K
        eta = jnp.linspace(0.01, 1.0, 40)
        t_eq = np.asarray(_temperature(eta, jnp.asarray(0.0)))
        assert t_eq[-1] == pytest.approx(309.95, abs=0.5)
        assert t_eq.min() < 215.0
        # midlatitude surface colder than the equator's
        t_60 = float(_temperature(jnp.asarray(1.0),
                                  jnp.asarray(np.deg2rad(60.0))))
        assert t_60 < t_eq[-1]

    def test_phis_structure(self):
        # JW06 eq. 8: with ps uniform the balanced topography dips at the
        # poles (φs(pole) ≈ -3.09e3 m2/s2) and peaks at the equator
        phis = np.asarray(_phis(jnp.linspace(-np.pi / 2, np.pi / 2, 19)))
        assert phis[0] == pytest.approx(-3093.5, abs=2.0)
        assert phis[-1] == pytest.approx(phis[0], abs=1e-6)   # symmetric
        assert phis[9] == pytest.approx(phis.max()) and phis.max() > 1000.0

    def test_state_finite_and_balanced_signs(self):
        grid = make_grid(48, 25, 12)
        coord = hybrid_coefficients(12)
        st, phis = jw_baroclinic_wave(grid, coord, perturb=True)
        for leaf in [st.u, st.v, st.pt, st.delp, phis]:
            assert bool(jnp.isfinite(leaf).all())
        assert float(st.u.max()) > 30.0           # the jet is there
        assert float(jnp.abs(st.v).max()) == 0.0
        pe, _, pkz, _ = pressure_vars(st.delp, coord.ptop)
        np.testing.assert_allclose(np.asarray(pe[-1]), 1.0e5, rtol=1e-12)

    def test_moist_variant(self):
        grid = make_grid(48, 25, 12)
        coord = hybrid_coefficients(12)
        st, _ = jw_baroclinic_wave(grid, coord, moist=True, nq=2)
        q = np.asarray(st.q[0])
        assert q.max() > 5e-3 and q.min() >= 0.0
        # humidity confined to the lower troposphere / low latitudes
        assert q[:, 0, :].max() < 1e-4 and q[0].max() < 1e-4


class TestSteadyState:
    def test_unperturbed_jet_holds(self):
        """The balanced jet is a steady state: after a few large steps the
        surface pressure must stay close to p0 and the jet intact (this is
        the JW06 'steady-state' experiment, their section 4a)."""
        grid = make_grid(72, 37, 16)
        coord = hybrid_coefficients(16)
        st, phis = jw_baroclinic_wave(grid, coord, perturb=False)
        cfg = FVConfig(nsplit=8, nspltrac=1)
        u0max = float(st.u.max())

        @jax.jit
        def step(s):
            return dyn_run(s, grid, coord, phis, cfg, 1800.0)

        for _ in range(8):                      # 4 hours
            st = step(s=st)
        pe, _, _, _ = pressure_vars(st.delp, coord.ptop)
        ps = np.asarray(pe[-1])
        # the analytic balance is not the discrete balance, so a zonally
        # SYMMETRIC adjustment of O(hPa) is expected (JW06 section 4a); what
        # must stay small is (a) total drift and (b) the zonal asymmetry
        # (the seed of spurious wave growth)
        assert np.abs(ps - 1.0e5).max() < 400.0
        eddy = ps - ps.mean(axis=-1, keepdims=True)
        assert np.abs(eddy).max() < 5.0
        assert abs(float(st.u.max()) - u0max) < 3.0
        assert float(jnp.abs(st.v).max()) < 1.5


class TestPerturbedWaveJW06:
    """JW06 §4b quantitative cross-validation of the rebuilt cd_core
    (round-4 VERDICT #5): the perturbed baroclinic wave at 1.9°x2.5°x26
    must reproduce the published evolution — quiet through day 4,
    explosive cyclogenesis days 7-9 with ps_min reaching the coarse-
    resolution envelope by day 9, accelerating deepening ('wave breaking
    after day 7'), and near-exponential eddy kinetic-energy growth.

    Run at the REFERENCE's damping operating point (div24del2flag=2):
    measured day-9 ps_min = 967.1 hPa with day-over-day deepening
    4.0/8.4/16.1 hPa (days 6-9) — inside JW06's ~2°-class inter-model
    spread (their Figs 5-7: coarse grids reach ~960-975 hPa by day 9;
    converged ~945-950). The repo-extension flag-22 point (del2 velocity
    damping, the long-run-stable default) damps the eddy growth to ~992
    hPa by day 9 — recorded in VALIDATION.md as a known deviation of the
    stability-envelope operating point.
    """

    @pytest.mark.slow
    def test_nine_day_cyclogenesis_envelope(self):
        from cam_nor_physics_tpu.models.fv.cd_core import pressure_vars

        # the validated configuration is f32 (VALIDATION.md); scope out of
        # the suite's global x64 so the 9-day run costs ~65 s/day
        with jax.enable_x64(False):
            self._run_nine_days(pressure_vars)

    def _run_nine_days(self, pressure_vars):
        im, jm, km, dt = 144, 96, 26, 1800.0
        grid = make_grid(im, jm, km)
        coord = hybrid_coefficients(km)
        st, phis = jw_baroclinic_wave(grid, coord, perturb=True,
                                      dtype=jnp.float32)
        cfg = FVConfig(div24del2flag=2)
        phis = jnp.asarray(phis.astype(jnp.float32))

        @jax.jit
        def chunk(s):          # one model day per dispatch
            return jax.lax.fori_loop(
                0, int(86400 / dt),
                lambda i, c: dyn_run(c, grid, coord, phis, cfg, dt), s)

        @jax.jit
        def metrics(s):
            pe = pressure_vars(s.delp, coord.ptop)[0]
            # mass-weighted eddy kinetic energy (zonal-mean removed)
            up = s.u - jnp.mean(s.u, axis=-1, keepdims=True)
            vp = s.v - jnp.mean(s.v, axis=-1, keepdims=True)
            eke = jnp.sum(0.5 * (up * up + vp * vp) * s.delp) / \
                jnp.sum(s.delp)
            return jnp.min(pe[-1]) / 100.0, eke

        psmin, eke = {}, {}
        for day in range(1, 10):
            st = chunk(st)
            p, e = metrics(st)
            psmin[day], eke[day] = float(p), float(e)
            assert np.isfinite(p), f"blow-up at day {day}"

        # quiet phase (JW06: ps_min 995-1000 hPa through day ~4-6)
        assert all(psmin[d] > 985.0 for d in (1, 2, 3, 4)), psmin
        # explosive cyclogenesis: accelerating day-over-day deepening
        # after day 7 (wave breaking), into the coarse-grid envelope
        assert psmin[9] < psmin[8] < psmin[7] < psmin[6], psmin
        d78 = psmin[7] - psmin[8]
        d89 = psmin[8] - psmin[9]
        assert d89 > d78 > 2.0, (d78, d89)
        assert 930.0 < psmin[9] < 980.0, psmin[9]
        # eddy kinetic energy: near-exponential growth through the
        # baroclinic phase, orders of magnitude above the seed
        assert eke[9] > 10.0 * eke[5] > 0.0, eke
        assert eke[9] > 1.0, eke[9]
