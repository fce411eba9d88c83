"""Implicit vertical diffusion: tridiagonal solver, conservation, mixing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.models.physics.vertical_diffusion import (
    eddy_diffusivity, tridiag_solve, vertical_diffusion_tend)
from cam_nor_physics_tpu.utils import constants as c


class TestTridiag:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(0)
        ncol, n = 5, 12
        a = np.zeros((ncol, n)); a[:, 1:] = rng.uniform(-1, 0, (ncol, n - 1))
        cc = np.zeros((ncol, n)); cc[:, :-1] = rng.uniform(-1, 0, (ncol, n - 1))
        b = 2.0 + np.abs(a) + np.abs(cc)          # diagonally dominant
        d = rng.standard_normal((ncol, n))
        x = np.asarray(tridiag_solve(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(cc), jnp.asarray(d)))
        for i in range(ncol):
            M = np.diag(b[i]) + np.diag(a[i, 1:], -1) + np.diag(cc[i, :-1], 1)
            np.testing.assert_allclose(x[i], np.linalg.solve(M, d[i]),
                                       rtol=1e-10)


@pytest.fixture(scope="module")
def state():
    ncol, pver = 6, 20
    pint = jnp.broadcast_to(jnp.linspace(1e3, 1e5, pver + 1),
                            (ncol, pver + 1))
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t = 288.0 * (pmid / 1e5) ** 0.19              # stable stratification
    q = jnp.full((ncol, pver, 2), 1e-4)
    # sheared wind profile
    u = jnp.broadcast_to(jnp.linspace(30.0, 2.0, pver), (ncol, pver))
    return make_state_from_profiles(pint, t, u, jnp.zeros((ncol, pver)), q,
                                    jnp.zeros((ncol,)))


class TestVDiff:
    def test_conserves_columns_without_fluxes(self, state):
        ncol = state.ncol
        z = jnp.zeros((ncol,))
        vd = vertical_diffusion_tend(state, z, jnp.zeros((ncol, 2)), z, z,
                                     jnp.full((ncol,), 1000.0), 1800.0)
        # column integrals of s and q conserved (no surface fluxes)
        ds_col = np.asarray((vd["dsdt"] * state.pdel).sum(axis=1))
        dq_col = np.asarray((vd["dqdt"][:, :, 0] * state.pdel).sum(axis=1))
        s_scale = float(jnp.abs(state.s * state.pdel).sum())
        assert np.abs(ds_col).max() < 1e-10 * s_scale
        np.testing.assert_allclose(dq_col, 0.0, atol=1e-12)

    def test_surface_heat_flux_warms_column(self, state):
        ncol = state.ncol
        z = jnp.zeros((ncol,))
        shf = jnp.full((ncol,), 100.0)            # W/m2 in
        vd = vertical_diffusion_tend(state, shf, jnp.zeros((ncol, 2)), z, z,
                                     jnp.full((ncol,), 1000.0), 1800.0)
        ds_col = np.asarray((vd["dsdt"] * state.pdel).sum(axis=1)) / c.GRAVIT
        np.testing.assert_allclose(ds_col, 100.0, rtol=1e-6)

    def test_mixing_reduces_shear(self, state):
        ncol = state.ncol
        z = jnp.zeros((ncol,))
        vd = vertical_diffusion_tend(state, z, jnp.zeros((ncol, 2)), z, z,
                                     jnp.full((ncol,), 2000.0), 1800.0)
        u1 = np.asarray(state.u + vd["dudt"] * 1800.0)
        shear0 = np.abs(np.diff(np.asarray(state.u), axis=1)).sum()
        shear1 = np.abs(np.diff(u1, axis=1)).sum()
        assert shear1 < shear0

    def test_diffusivities_positive_bounded(self, state):
        kv = np.asarray(eddy_diffusivity(state, jnp.full((state.ncol,),
                                                         1500.0)))
        assert kv.shape == (state.ncol, state.pver + 1)
        assert (kv >= 0.0).all() and kv.max() <= 500.0
        assert kv[:, 0].max() == 0.0 and kv[:, -1].max() == 0.0
