"""Gray radiation tests: flux consistency, heating balance, physpkg wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
from cam_nor_physics_tpu.models.physics.radiation import (SB, lw_gray_fluxes,
                                                          radiation_tend)
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.utils import constants as c


@pytest.fixture(scope="module")
def state():
    ncol, pver = 6, 20
    pint = jnp.broadcast_to(jnp.linspace(1e3, 1e5, pver + 1),
                            (ncol, pver + 1))
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t = 288.0 * (pmid / 1e5) ** 0.19
    q = jnp.zeros((ncol, pver, 1)).at[:, :, 0].set(
        0.01 * (pmid / pmid[:, -1:]) ** 3)
    lat = jnp.linspace(-1.3, 1.3, ncol)
    return make_state_from_profiles(pint, t, jnp.zeros((ncol, pver)),
                                    jnp.zeros((ncol, pver)), q,
                                    jnp.zeros((ncol,)), lat=lat)


class TestLWGray:
    def test_isothermal_opaque_limit(self):
        """An isothermal atmosphere under an opaque gray gas radiates like a
        blackbody at that temperature from the TOA."""
        ncol, pver = 2, 40
        t = jnp.full((ncol, pver), 260.0)
        ts = jnp.full((ncol,), 260.0)
        tau = jnp.broadcast_to(jnp.linspace(0.0, 50.0, pver + 1),
                               (ncol, pver + 1))
        up, dn = lw_gray_fluxes(t, ts, tau)
        np.testing.assert_allclose(np.asarray(up[:, 0]), SB * 260.0 ** 4,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dn[:, -1]), SB * 260.0 ** 4,
                                   rtol=1e-3)

    def test_transparent_limit(self):
        """tau -> 0: OLR equals the surface emission, downwelling zero."""
        ncol, pver = 2, 10
        t = jnp.full((ncol, pver), 240.0)
        ts = jnp.full((ncol,), 290.0)
        tau = jnp.zeros((ncol, pver + 1))
        up, dn = lw_gray_fluxes(t, ts, tau)
        np.testing.assert_allclose(np.asarray(up[:, 0]), SB * 290.0 ** 4,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(dn), 0.0, atol=1e-12)


class TestRadiationTend:
    def test_heating_closes_flux_divergence(self, state):
        cam_in = CamIn.zeros(state.ncol, 1)
        rad = radiation_tend(state, cam_in)
        # column-integrated heating == air absorption:
        # SW absorbed in air = FSNT - FSNS; LW gain = FLNS - FLNT
        col = np.asarray(((rad["qrl"] + rad["qrs"]) * state.pdel
                          ).sum(axis=1)) / c.GRAVIT
        expect = (np.asarray(rad["FSNT"]) - np.asarray(rad["FSNS"])) + \
            (np.asarray(rad["FLNS"]) - np.asarray(rad["FLNT"]))
        np.testing.assert_allclose(col, expect, rtol=1e-6, atol=1e-8)

    def test_cools_warm_troposphere_heats_by_sun(self, state):
        cam_in = CamIn.zeros(state.ncol, 1)
        cam_in = cam_in.replace(ts=jnp.full((state.ncol,), 288.0))
        rad = radiation_tend(state, cam_in)
        assert float(np.asarray(rad["qrl"]).mean()) < 0.0   # net IR cooling
        assert float(np.asarray(rad["qrs"]).min()) >= 0.0   # SW only heats
        assert np.isfinite(np.asarray(rad["net_flx"])).all()

    def test_physpkg_gray_branch(self, state):
        from cam_nor_physics_tpu.models.physics.constituents import \
            default_registry
        from cam_nor_physics_tpu.models.physics.physics_buffer import \
            pbuf_register
        from cam_nor_physics_tpu.models.physics.physpkg import (
            phys_run2, physpkg_pbuf_specs)
        from cam_nor_physics_tpu.utils.config import PhysConfig
        reg = default_registry()
        ncol, pver = state.ncol, state.pver
        q = jnp.zeros((ncol, pver, reg.pcnst)).at[:, :, 0].set(
            state.q[:, :, 0])
        st = state.replace(q=q)
        pbuf = pbuf_register(physpkg_pbuf_specs(ncol, pver))
        pbuf = pbuf.update(PBLH=jnp.full((ncol,), 700.0),
                           TEOUT=jnp.zeros((ncol,)))
        cam_in = CamIn.zeros(ncol, reg.pcnst)
        out = phys_run2(PhysConfig(radiation_scheme="gray"), reg, st, pbuf,
                        cam_in, 1800.0)
        assert "FSNT" in out.diagnostics and "QRL" in out.diagnostics
        assert bool(jnp.isfinite(out.state.t).all())
