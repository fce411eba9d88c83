"""FV dycore tests: rest-state preservation, mass/tracer consistency,
Held-Suarez short-run stability, te_map round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.fv.cd_core import (DynState, cd_step,
                                                   d2a_winds, pressure_vars)
from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run, te_map, trac2d
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                       hs_initial_state,
                                                       isothermal_rest_state)
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.utils.config import FVConfig


@pytest.fixture(scope="module")
def setup():
    grid = make_grid(72, 46, 10)
    coord = hybrid_coefficients(10)
    phis = jnp.zeros((46, 72))
    return grid, coord, phis


def global_mass(grid, delp):
    w = np.asarray(grid.cosp).copy()
    w[0] = w[-1] = grid.acap / grid.im
    return float((jnp.asarray(w)[None, :, None] * delp).sum())


class TestRestState:
    def test_cd_step_preserves_rest(self, setup):
        grid, coord, phis = setup
        st = isothermal_rest_state(grid, coord)
        st1, _ = cd_step(st, grid, coord.ptop, phis, 120.0)
        assert float(jnp.abs(st1.u).max()) == 0.0
        assert float(jnp.abs(st1.v).max()) == 0.0
        assert float(jnp.abs(st1.delp - st.delp).max()) == 0.0

    def test_dyn_run_preserves_rest(self, setup):
        grid, coord, phis = setup
        st = isothermal_rest_state(grid, coord)
        cfg = FVConfig(nsplit=4, nspltrac=1)
        st1 = dyn_run(st, grid, coord, phis, cfg, 1800.0)
        assert float(jnp.abs(st1.u).max()) < 1e-10
        np.testing.assert_allclose(global_mass(grid, st1.delp),
                                   global_mass(grid, st.delp), rtol=1e-13)


class TestHeldSuarez:
    def test_short_run_stable(self, setup):
        grid, coord, phis = setup
        st = hs_initial_state(grid, coord, pert=1.0)
        cfg = FVConfig(nsplit=8, nspltrac=2)
        dt = 1800.0

        @jax.jit
        def step(s):
            s = dyn_run(s, grid, coord, phis, cfg, dt)
            return hs_forcing(s, grid, coord.ptop, dt)

        m0 = global_mass(grid, st.delp)
        # 16 steps catches gross instability; multi-day stability is covered
        # by the TPU climate runs recorded in VALIDATION.md
        for _ in range(16):
            st = step(st)
        assert bool(jnp.isfinite(st.u).all() & jnp.isfinite(st.pt).all())
        assert float(jnp.abs(st.u).max()) < 150.0   # umax guard (dyn_comp umax)
        assert float(st.delp.min()) > 0.0
        np.testing.assert_allclose(global_mass(grid, st.delp), m0, rtol=1e-12)

    def test_forcing_relaxes_to_teq(self, setup):
        grid, coord, phis = setup
        st = isothermal_rest_state(grid, coord, t0=260.0)
        pe, pk, pkz, _ = pressure_vars(st.delp, coord.ptop)
        tv0 = np.asarray(st.pt * pkz)
        st1 = hs_forcing(st, grid, coord.ptop, 1800.0)
        tv1 = np.asarray(st1.pt * pkz)
        from cam_nor_physics_tpu.models.fv.held_suarez import \
            equilibrium_temperature
        pmid = 0.5 * (pe[1:] + pe[:-1])
        teq = np.asarray(equilibrium_temperature(
            pmid, jnp.asarray(grid.lats)[:, None]))
        # relaxation moves Tv strictly toward Teq where they differ
        move = (tv1 - tv0) * (teq - tv0)
        assert np.all(move >= -1e-12)


class TestTracerConsistency:
    def test_uniform_tracer_stays_uniform(self, setup):
        """Free-stream preservation: mixing ratio q==1 must remain 1 after
        trac2d with real accumulated dycore fluxes."""
        grid, coord, phis = setup
        st = hs_initial_state(grid, coord, pert=1.0,
                              nq=1).replace()
        st = st.replace(q=jnp.ones_like(st.q))
        cfg = FVConfig(nsplit=4, nspltrac=1)
        st1 = dyn_run(st, grid, coord, phis, cfg, 1800.0)
        np.testing.assert_allclose(np.asarray(st1.q), 1.0, atol=1e-12)

    def test_tracer_mass_conserved(self, setup):
        grid, coord, phis = setup
        rng = np.random.default_rng(0)
        st = hs_initial_state(grid, coord, pert=1.0, nq=1)
        qf = np.abs(rng.standard_normal((1,) + st.delp.shape)) * 1e-3
        st = st.replace(q=jnp.asarray(qf))
        cfg = FVConfig(nsplit=4, nspltrac=1)
        w = np.asarray(grid.cosp).copy()
        w[0] = w[-1] = grid.acap / grid.im
        wj = jnp.asarray(w)[None, :, None]
        m0 = float((wj * st.q[0] * st.delp).sum())
        st1 = dyn_run(st, grid, coord, phis, cfg, 1800.0)
        m1 = float((wj * st1.q[0] * st1.delp).sum())
        np.testing.assert_allclose(m1, m0, rtol=1e-10)


class TestTeMap:
    def test_identity_on_reference_grid(self, setup):
        grid, coord, phis = setup
        st = hs_initial_state(grid, coord, pert=1.0)
        st1 = te_map(st, coord, grid, coord.ptop)
        # state already on hybrid surfaces -> remap is identity
        np.testing.assert_allclose(np.asarray(st1.pt), np.asarray(st.pt),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(st1.delp), np.asarray(st.delp),
                                   rtol=1e-12)

    def test_consv_restores_energy(self, setup):
        grid, coord, phis = setup
        st = hs_initial_state(grid, coord, pert=1.0)
        # perturb delp to mimic Lagrangian deformation (mass-neutral in
        # column: move mass between adjacent layers)
        shift = 0.1 * jnp.minimum(st.delp[:-1], st.delp[1:])
        delp2 = st.delp.at[:-1].add(-shift).at[1:].add(shift)
        st2 = st.replace(delp=delp2)

        def tot_energy(s):
            """Exact column total energy KE + cp*Tv + Phi integrated over
            dp, in the layer-constant-pt (Montgomery) form the remap
            conserves (upstream te_map; dyn_comp.F90:2699-2740)."""
            pe, pk, pkz, peln = pressure_vars(s.delp, coord.ptop)
            from cam_nor_physics_tpu.utils import constants as c
            ua, va = d2a_winds(s.u, s.v)
            ke = 0.5 * (ua ** 2 + va ** 2)
            contrib = c.CPAIR * s.pt * (pk[1:] - pk[:-1])
            phi_edge = jnp.cumsum(contrib[::-1], axis=0)[::-1]
            te = ke + (phi_edge - contrib) + c.CPAIR * s.pt * pk[1:]
            w = np.asarray(grid.cosp).copy()
            w[0] = w[-1] = grid.acap / grid.im
            return float((jnp.asarray(w)[None, :, None] * s.delp * te).sum())

        e0 = tot_energy(st2)
        st3 = te_map(st2, coord, grid, coord.ptop, consv=True)
        e1 = tot_energy(st3)
        np.testing.assert_allclose(e1, e0, rtol=1e-12)


class TestVdotGradp:
    """ω pressure-advection term (compute_vdot_gradp, dyn_comp.F90:2071-2098)."""

    def test_zonal_advection_of_zonal_gradient(self, setup):
        from cam_nor_physics_tpu.models.fv.dyn_comp import compute_vdot_gradp
        from cam_nor_physics_tpu.utils import constants as c
        grid, coord, phis = setup
        st = isothermal_rest_state(grid, coord)
        # impose a zonal wavenumber-1 surface-pressure signal and a uniform
        # westerly: v·∇p must equal u ∂p/∂x analytically (discrete centered)
        lam = 2.0 * np.pi * np.arange(grid.im) / grid.im
        dps = 100.0 * np.sin(lam)                      # Pa
        delp = st.delp * (1.0 + jnp.asarray(dps)[None, None, :] / 1.0e5)
        u0 = 10.0
        st = st.replace(delp=delp, u=jnp.full_like(st.u, u0))
        vgp = compute_vdot_gradp(st, grid, coord.ptop)
        pe = pressure_vars(st.delp, coord.ptop)[0]
        pmid = 0.5 * (pe[1:] + pe[:-1])
        dpdx = (jnp.roll(pmid, -1, -1) - jnp.roll(pmid, 1, -1)) / \
            (2.0 * c.REARTH * jnp.asarray(grid.cosp)[None, :, None] * grid.dl)
        expect = u0 * dpdx
        np.testing.assert_allclose(np.asarray(vgp[:, 1:-1]),
                                   np.asarray(expect[:, 1:-1]), rtol=1e-10)
        # pole rows carry no horizontal direction
        assert float(jnp.abs(vgp[:, 0]).max()) == 0.0
        assert float(jnp.abs(vgp[:, -1]).max()) == 0.0

    def test_omega_includes_advection(self, setup):
        """dyn_run's omega diagnostic is not the pure local tendency:
        advecting a zonal pressure pattern with zero net mass change yields
        nonzero ω through v·∇p."""
        from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
        grid, coord, phis = setup
        st = hs_initial_state(grid, coord, pert=1.0)
        cfg = FVConfig(nsplit=4, nspltrac=2, nspltvrm=1)
        _, diags = dyn_run(st, grid, coord, phis, cfg, ndt=1800.0,
                           return_diags=True)
        om = np.asarray(diags["omega"])
        assert np.isfinite(om).all()
        assert np.abs(om).max() > 0.0


class TestDivergenceDamping:
    """div24del2flag family (fv_div24del2flag, dyn_comp.F90:190-192):
    2 = del2 div, 4 = del4 div, 24 = both, 42 = del4 + del2 velocity;
    repo extension 22 = del2 + del2 velocity (round-1 operating point)."""

    @pytest.mark.parametrize("flag", [2, 4, 22, 24, 42])
    def test_flag_stable(self, setup, flag):
        grid, coord, phis = setup
        st = hs_initial_state(grid, coord, pert=1.0, nq=1)
        cfg = FVConfig(div24del2flag=flag, use_pallas=False)
        step = jax.jit(lambda s: dyn_run(s, grid, coord, phis, cfg, 1800.0))
        for _ in range(4):
            st = step(st)
        for f in ("u", "v", "pt", "delp"):
            assert bool(jnp.all(jnp.isfinite(getattr(st, f)))), (flag, f)
        assert float(jnp.max(jnp.abs(st.u))) < 300.0

    def test_bad_flag_raises(self, setup):
        grid, coord, phis = setup
        st = hs_initial_state(grid, coord, pert=1.0, nq=1)
        cfg = FVConfig(div24del2flag=3, use_pallas=False)
        with pytest.raises(ValueError, match="div24del2flag"):
            dyn_run(st, grid, coord, phis, cfg, 1800.0)

    def test_div4_damps_checkerboard_divergence(self, setup):
        """A 2Δx checkerboard divergence anomaly must decay faster with
        del4 active than with damping off (scale selectivity)."""
        grid, coord, phis = setup
        jm, im = 46, 72
        st0 = isothermal_rest_state(grid, coord)
        cb = 5.0 * ((-1.0) ** jnp.arange(im))[None, None, :] * \
            jnp.ones((10, jm, im))
        st0 = st0.replace(u=st0.u + cb)      # 2Δx divergence in δx(u)

        def urms_after(div4):
            st1, _ = cd_step(st0, grid, coord.ptop, phis, 120.0,
                             div2_on=False, div4_coef_nd=div4,
                             dyn_filter=False, use_pallas=False)
            mid = st1.u[:, 10:-10, :]        # away from the polar rows
            return float(jnp.sqrt(jnp.mean(mid ** 2)))

        assert urms_after(0.02) < 0.98 * urms_after(0.0)

    def test_top_taper_profile(self):
        """The sponge taper max(1, 8(1+tanh ln(ptop/p)))/128 dominates the
        floor only above the switch pressure and is monotone with height."""
        coord = hybrid_coefficients(26)
        pref = np.asarray(coord.ak + coord.bk * coord.ps0)
        pmid = 0.5 * (pref[1:] + pref[:-1])
        tau = np.maximum(1.0, 8.0 * (1.0 + np.tanh(
            np.log(coord.ptop / pmid)))) / 128.0
        assert tau[0] > tau[-1]
        assert abs(tau[-1] - 1.0 / 128.0) < 1e-12
        assert tau[0] <= 1.0 / 16.0 + 1e-12
