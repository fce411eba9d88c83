"""Aquaplanet configuration: SST profiles, bulk fluxes, full-GCM stepping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.atm_comp import AtmModel, atm_init, atm_step
from cam_nor_physics_tpu.models.coupling.surface_fluxes import (
    aquaplanet_sst, bulk_surface_fluxes)
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.utils.config import FVConfig, PhysConfig


class TestSST:
    def test_profiles(self):
        lat = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, 91)
        for prof in ("control", "flat", "qobs"):
            sst = np.asarray(aquaplanet_sst(lat, prof))
            assert abs(sst.max() - (273.15 + 27.0)) < 0.1   # equator
            np.testing.assert_allclose(sst[0], 273.15)      # polar cap
            assert (np.diff(sst[:45]) >= -1e-9).all()       # monotone to eq


class TestBulkFluxes:
    def test_signs_and_magnitudes(self):
        from cam_nor_physics_tpu.models.physics.state import \
            make_state_from_profiles
        ncol, pver = 4, 8
        pint = jnp.broadcast_to(jnp.linspace(1e4, 1e5, pver + 1),
                                (ncol, pver + 1))
        t = jnp.full((ncol, pver), 290.0)
        q = jnp.full((ncol, pver, 2), 5e-3)
        u = jnp.full((ncol, pver), 8.0)
        st = make_state_from_profiles(pint, t, u, jnp.zeros((ncol, pver)),
                                      q, jnp.zeros((ncol,)))
        sst = jnp.full((ncol,), 300.0)                  # warm ocean
        cam_in = bulk_surface_fluxes(st, sst, 2)
        assert (np.asarray(cam_in.shf) > 0).all()       # ocean heats air
        assert (np.asarray(cam_in.cflx[:, 0]) > 0).all()  # evaporation
        assert (np.asarray(cam_in.wsx) < 0).all()       # drag opposes u>0
        assert 1.0 < np.asarray(cam_in.shf).max() < 500.0


class TestAquaplanetGCM:
    def test_full_gcm_steps(self):
        model = AtmModel.create(48, 24, 10, dt=1800.0,
                                fv_cfg=FVConfig(nsplit=4, nspltrac=1),
                                phys_cfg=PhysConfig(radiation_scheme="gray"))
        dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                                nq=model.registry.pcnst)
        dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-6).at[0].set(
            1e-2 * (dyn0.delp / dyn0.delp.max()) ** 2))
        state = atm_init(model, dyn0, jnp.zeros((24, 48)))
        sst = aquaplanet_sst(state.phys.lat)

        def coupled(s, first=False):
            cam_in = bulk_surface_fluxes(s.phys, sst, model.registry.pcnst)
            return atm_step(model, s, cam_in, first_step=first)

        step0 = jax.jit(lambda s: coupled(s, True))
        stepn = jax.jit(lambda s: coupled(s))
        state, cam_out, diags = step0(state)
        for _ in range(3):
            state, cam_out, diags = stepn(state)
        for leaf in jax.tree.leaves(state):
            assert bool(jnp.isfinite(leaf).all())
        # a moist planet with radiation: OLR and absorbed solar plausible
        assert 100.0 < float(np.asarray(diags["FLNT"]).mean()) < 400.0
        assert 100.0 < float(np.asarray(diags["FSNT"]).mean()) < 450.0
        assert float(diags["CAPE"].max()) > 0.0
