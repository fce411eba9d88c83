"""IC file round trip (read_inidat/write_inidat) and single-column mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.models.fv.inidat import (apply_pertlim,
                                                  pole_average, read_inidat,
                                                  write_inidat)
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.models.scam import ScamForcing, scam_run
from cam_nor_physics_tpu.utils.config import PhysConfig, ZMConfig


class TestInidat:
    def test_round_trip(self, tmp_path):
        grid = make_grid(24, 12, 5)
        coord = hybrid_coefficients(5)
        st = hs_initial_state(grid, coord, pert=1.0, nq=2)
        st = st.replace(u=st.u + 3.0, q=jnp.full_like(st.q, 1e-3))
        phis = jnp.zeros((12, 24))
        path = str(tmp_path / "ic.nc")
        write_inidat(path, st, phis, grid, coord,
                     constituent_names=("Q", "CLDLIQ"))
        st2, phis2 = read_inidat(path, grid, coord,
                                 constituent_names=("Q", "CLDLIQ"))
        # u row 0 is the unphysical south-pole edge (US lives on slat rows)
        np.testing.assert_allclose(np.asarray(st2.u[:, 1:, :]),
                                   np.asarray(st.u[:, 1:, :]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(st2.delp), np.asarray(st.delp),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(st2.pt), np.asarray(st.pt),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(st2.q), np.asarray(st.q),
                                   atol=1e-15)

    def test_pole_average_and_pertlim(self):
        a = np.arange(24.0).reshape(4, 6)
        b = pole_average(a)
        assert (b[0] == b[0, 0]).all() and (b[-1] == b[-1, 0]).all()
        np.testing.assert_allclose(b[1:-1], a[1:-1])
        t = np.full((3, 4), 250.0)
        t1 = apply_pertlim(t, 1e-3, seed=1)
        t2 = apply_pertlim(t, 1e-3, seed=1)
        np.testing.assert_array_equal(t1, t2)        # deterministic
        assert np.abs(t1 / t - 1.0).max() <= 1e-3

    def test_missing_constituent_zero_filled(self, tmp_path):
        grid = make_grid(24, 12, 5)
        coord = hybrid_coefficients(5)
        st = hs_initial_state(grid, coord, pert=0.0, nq=1)
        phis = jnp.zeros((12, 24))
        path = str(tmp_path / "ic.nc")
        write_inidat(path, st, phis, grid, coord, constituent_names=("Q",))
        st2, _ = read_inidat(path, grid, coord,
                             constituent_names=("Q", "DUST"))
        np.testing.assert_allclose(np.asarray(st2.q[1]), 0.0)


class TestScam:
    def test_forced_column_convects(self):
        from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
        from cam_nor_physics_tpu.models.physics.constituents import \
            default_registry
        from cam_nor_physics_tpu.models.physics.state import \
            make_state_from_profiles
        ncol, pver = 4, 26
        reg = default_registry()
        eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
        pint = jnp.asarray(eta[None, :] * 1.0e5 * np.ones((ncol, 1)))
        pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
        t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0)
        t = t.at[:, -1].add(2.0)
        q0 = (0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6)
        q = jnp.zeros((ncol, pver, reg.pcnst)).at[:, :, 0].set(q0)
        st = make_state_from_profiles(
            pint, t, jnp.zeros((ncol, pver)), jnp.zeros((ncol, pver)), q,
            jnp.zeros((ncol,)))
        cam_in = CamIn.zeros(ncol, reg.pcnst)
        cam_in = cam_in.replace(landfrac=jnp.ones((ncol,)))
        # weak moistening forcing sustains instability across steps
        forcing = ScamForcing.zeros(ncol, pver)
        forcing = forcing.replace(
            dqdt_ls=jnp.zeros((ncol, pver)).at[:, -5:].set(2e-8))
        state, pbuf, series = scam_run(PhysConfig(), ZMConfig(), reg, st,
                                       cam_in, forcing, 1800.0, nsteps=3)
        assert bool(jnp.isfinite(state.t).all())
        assert float(jnp.asarray(series["precc"]).max()) > 0.0
