"""Dynamics extras: AM fixer, benergy, prescribed-met mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.fv.cd_core import DynState
from cam_nor_physics_tpu.models.fv.dyn_comp import (am_fixer,
                                                    axial_angular_momentum,
                                                    benergy, dyn_run)
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.models.fv.metdata import (MetData, met_state_at,
                                                   offline_dyn_run)
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.utils.config import FVConfig


@pytest.fixture(scope="module")
def setup():
    grid = make_grid(48, 24, 6)
    coord = hybrid_coefficients(6)
    st = hs_initial_state(grid, coord, pert=1.0)
    return grid, coord, st


class TestAMFixer:
    def test_fixer_restores_am(self, setup):
        grid, coord, st = setup
        am0 = axial_angular_momentum(st, grid, per_level=True)
        # perturb u: add a wind anomaly that changes AM
        st2 = st.replace(u=st.u + 0.5)
        am_bad = float(axial_angular_momentum(st2, grid))
        am_tot = float(jnp.sum(am0))
        scale = abs(am_bad - am_tot)
        assert scale > 0.0
        st3, du_k = am_fixer(st2, grid, am0)     # untapered: exact restore
        am_fixed = float(axial_angular_momentum(st3, grid))
        assert abs(am_fixed - am_tot) < 1e-12 * scale
        assert du_k.shape == (st.km,)

    def test_fixer_lbl_restores_each_level(self, setup):
        grid, coord, st = setup
        am0 = axial_angular_momentum(st, grid, per_level=True)
        st2 = st.replace(u=st.u + 0.5)
        st3, _ = am_fixer(st2, grid, am0, lbl=True)
        am_fixed = axial_angular_momentum(st3, grid, per_level=True)
        scale = np.abs(np.asarray(
            axial_angular_momentum(st2, grid, per_level=True) - am0))
        np.testing.assert_allclose(np.asarray(am_fixed), np.asarray(am0),
                                   atol=float(scale.max()) * 1e-12)

    def test_taper_shape(self, setup):
        from cam_nor_physics_tpu.models.fv.dyn_comp import am_taper
        coord = hybrid_coefficients(26)
        tpr = np.asarray(am_taper(coord, 95e2, 10e2, 26,
                                  high_order_top=False))
        assert tpr.shape == (26,)
        assert np.all(tpr[: 26 // 8] == 0.0)     # top exclusion (kmtp)
        assert tpr[-1] > 0.99                    # full strength at surface
        assert np.all(np.diff(tpr[26 // 8:]) >= -1e-12)  # monotone ramp

    def test_dyn_run_with_fixer_conserves_am(self, setup):
        grid, coord, st = setup
        # superpose a solid-body zonal flow so the AM scale is meaningful
        cose = jnp.asarray(grid.cose)[None, :, None]
        st = st.replace(u=st.u + 20.0 * cose)
        phis = jnp.zeros((24, 48))
        am0 = float(axial_angular_momentum(st, grid))
        # tiny taper-onset pressure -> taper ~ 1 at every level, so the
        # global fixer restores the full-column AM (the default 95 hPa
        # onset leaves the tapered-out top levels uncorrected by design)
        cfg_fix = FVConfig(nsplit=2, nspltrac=1, am_fixer=True,
                           am_fix_tpr_h=1.0, am_fix_tpr_w=0.5)
        cfg_nof = FVConfig(nsplit=2, nspltrac=1, am_fixer=False)
        am_fix = float(axial_angular_momentum(
            dyn_run(st, grid, coord, phis, cfg_fix, 1800.0), grid))
        am_nof = float(axial_angular_momentum(
            dyn_run(st, grid, coord, phis, cfg_nof, 1800.0), grid))
        # with the fixer, the AM drift over the step must be much smaller
        # than without it (the remap after the fixer leaves a small residual)
        assert abs(am_fix - am0) < 0.2 * abs(am_nof - am0) + 1e-10 * abs(am0)

    def test_benergy_positive_and_stable(self, setup):
        grid, coord, st = setup
        e = float(benergy(st, grid, coord.ptop))
        assert e > 0.0


class TestOfflineDyn:
    def _met(self, st):
        def series(a):
            return jnp.stack([a, a * 1.1, a * 1.2])
        return MetData(times=jnp.asarray([0.0, 3600.0, 7200.0]),
                       u=series(st.u + 1.0), v=series(st.v),
                       pt=series(st.pt), delp=series(st.delp),
                       q=series(st.q))

    def test_time_interpolation(self, setup):
        grid, coord, st = setup
        met = self._met(st)
        mid = met_state_at(met, 1800.0)
        expect = 0.5 * ((st.u + 1.0) + 1.1 * (st.u + 1.0))
        np.testing.assert_allclose(np.asarray(mid.u), np.asarray(expect),
                                   rtol=1e-12)
        # clamping outside the record
        early = met_state_at(met, -500.0)
        np.testing.assert_allclose(np.asarray(early.u),
                                   np.asarray(st.u + 1.0), rtol=1e-12)

    def test_offline_overwrites_dynamics(self, setup):
        grid, coord, st = setup
        met = self._met(st)
        out = offline_dyn_run(st, met, 0.0, 3600.0)
        np.testing.assert_allclose(np.asarray(out.u),
                                   np.asarray(1.1 * (st.u + 1.0)),
                                   rtol=1e-12)
        # tracers untouched (prognostic in offline mode)
        np.testing.assert_allclose(np.asarray(out.q), np.asarray(st.q))


class TestOmega:
    def test_lagrangian_omega_diagnostic(self, setup):
        """dyn_run(return_diags=True) returns omega = Dp/Dt at midpoints
        (the omga accumulation role, dyn_comp.F90:2071-2098)."""
        grid, coord, st = setup
        phis = jnp.zeros((24, 48))
        st2, d = dyn_run(st, grid, coord, phis,
                         FVConfig(nsplit=2, nspltrac=1), 1800.0,
                         return_diags=True)
        om = np.asarray(d["omega"])
        assert om.shape == st.delp.shape
        assert np.isfinite(om).all()
        # rest-like noise state: omega small but nonzero, bounded
        assert 0.0 < np.abs(om).max() < 50.0
