"""Coupled atmosphere stepping tests (cam_comp sequence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.atm_comp import AtmModel, atm_init, atm_step
from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.utils.config import FVConfig


@pytest.fixture(scope="module")
def coupled():
    model = AtmModel.create(48, 24, 10, dt=1800.0,
                            fv_cfg=FVConfig(nsplit=4, nspltrac=1))
    st_dyn = hs_initial_state(model.grid, model.coord, pert=1.0,
                              nq=model.registry.pcnst)
    q = jnp.full_like(st_dyn.q, 1e-4)
    q = q.at[0].set(3e-3 * (st_dyn.delp / st_dyn.delp.max()))
    st_dyn = st_dyn.replace(q=q)
    phis = jnp.zeros((24, 48))
    state = atm_init(model, st_dyn, phis)
    ncol = 24 * 48
    cam_in = CamIn.zeros(ncol, model.registry.pcnst)
    cam_in = cam_in.replace(shf=jnp.full((ncol,), 10.0),
                            landfrac=jnp.full((ncol,), 0.3))
    return model, state, cam_in


class TestAtmStep:
    def test_five_steps_finite_and_active(self, coupled):
        model, state, cam_in = coupled
        step0 = jax.jit(lambda s: atm_step(model, s, cam_in,
                                           first_step=True))
        stepn = jax.jit(lambda s: atm_step(model, s, cam_in))
        state, cam_out, diags = step0(state)
        for _ in range(2):
            state, cam_out, diags = stepn(state)
        for leaf in jax.tree.leaves(state):
            assert bool(jnp.isfinite(leaf).all())
        assert int(state.nstep) == 3
        # deep convection active somewhere on a moist unstable planet
        assert float(diags["CAPE"].max()) > 0.0
        assert float(jnp.abs(state.dyn.u).max()) < 150.0

    def test_dry_air_mass_conserved(self, coupled):
        """Total dry-air mass must be exactly conserved by the coupled loop
        (the dme_adjust contract): moist mass changes only via precip/evap."""
        model, state, cam_in = coupled
        g = model.grid
        w = np.asarray(g.cosp).copy()
        w[0] = w[-1] = g.acap / g.im
        wj = jnp.asarray(w)[None, :, None]

        def dry_mass(dyn):
            return float((wj * dyn.delp * (1.0 - dyn.q[0])).sum())

        m0 = dry_mass(state.dyn)
        step0 = jax.jit(lambda s: atm_step(model, s, cam_in,
                                           first_step=True))
        state2, _, _ = step0(state)
        m1 = dry_mass(state2.dyn)
        np.testing.assert_allclose(m1, m0, rtol=5e-7)


class TestCouplingDiagWiring:
    """The d_p_coupling diagnostic hooks ride the coupled step: FRONTGF/
    FRONTGA/UZM land in the pbuf, ctem + AM + DTCORE in the diags dict."""

    def test_diag_flags_through_atm_step(self):
        from dataclasses import replace as dc_replace

        from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
        from cam_nor_physics_tpu.utils.config import PhysConfig

        model = AtmModel.create(
            48, 24, 10, dt=1800.0,
            fv_cfg=FVConfig(nsplit=2, nspltrac=1, am_fixer=True,
                            am_diag=True),
            phys_cfg=PhysConfig(use_gw_front=True, qbo_use_forcing=True,
                                do_circulation_diags=True))
        st_dyn = hs_initial_state(model.grid, model.coord, pert=1.0,
                                  nq=model.registry.pcnst)
        st_dyn = st_dyn.replace(q=jnp.full_like(st_dyn.q, 1e-4))
        state = atm_init(model, st_dyn, jnp.zeros((24, 48)))
        ncol = 24 * 48
        cam_in = CamIn.zeros(ncol, model.registry.pcnst)

        step = jax.jit(lambda s: atm_step(model, s, cam_in))
        state, _, diags = step(state)
        state, _, diags = step(state)

        for name in ("FRONTGF", "FRONTGA", "UZM"):
            v = state.pbuf.get(name)
            assert v.shape == (ncol, model.grid.km)
            assert bool(jnp.isfinite(v).all())
        assert float(jnp.abs(state.pbuf.get("UZM")).max()) > 0.0
        for name in ("U2d", "VTH2d", "AM_DU3S", "AM_DUFIX", "AM_TOTAL"):
            assert name in diags, name
        # dynamics-tendency diagnostics present after the first stored step
        for name in ("DTCORE", "DQCORE", "UTEND_CORE", "VTEND_CORE"):
            assert name in diags, name
            assert bool(jnp.isfinite(diags[name]).all())
        # DTCORE reflects a real (nonzero) dynamics+coupling tendency
        assert float(jnp.abs(diags["DTCORE"]).max()) > 0.0
