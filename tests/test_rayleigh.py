"""Rayleigh friction tests: profile shape, implicit damping, KE->heat."""

import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics.rayleigh_friction import \
    rayleigh_friction_tend
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.utils import constants as c


@pytest.fixture(scope="module")
def state():
    ncol, pver = 4, 20
    pint = jnp.broadcast_to(jnp.linspace(1e2, 1e5, pver + 1),
                            (ncol, pver + 1))
    t = jnp.full((ncol, pver), 260.0)
    q = jnp.full((ncol, pver, 1), 1e-5)
    u = jnp.full((ncol, pver), 30.0)
    v = jnp.full((ncol, pver), -10.0)
    return make_state_from_profiles(pint, t, u, v, q, jnp.zeros((ncol,)))


class TestRayleigh:
    def test_disabled_returns_zero(self, state):
        du, dv, ds = rayleigh_friction_tend(state, 1800.0, raytau0=0.0)
        np.testing.assert_allclose(np.asarray(du), 0.0)

    def test_damps_top_not_bottom(self, state):
        du, dv, ds = rayleigh_friction_tend(state, 1800.0, rayk0=2,
                                            raytau0=2.0)
        du = np.asarray(du)
        assert du[0, 0] < 0.0                       # drag opposes u>0 at top
        assert abs(du[0, -1]) < 1e-3 * abs(du[0, 0])  # bottom untouched
        # monotone decay of the drag with depth
        assert (np.diff(np.abs(du[0, :6])) <= 1e-12).all()

    def test_energy_conserving(self, state):
        dt = 1800.0
        du, dv, ds = rayleigh_friction_tend(state, dt, rayk0=3, raytau0=1.0)
        u1 = np.asarray(state.u + du * dt)
        v1 = np.asarray(state.v + dv * dt)
        dke = 0.5 * ((u1 ** 2 + v1 ** 2) -
                     np.asarray(state.u ** 2 + state.v ** 2))
        np.testing.assert_allclose(np.asarray(ds) * dt, -dke, rtol=1e-12)

    def test_implicit_never_overshoots(self, state):
        # even with an absurdly short tau the implicit update cannot flip u
        du, dv, ds = rayleigh_friction_tend(state, 1800.0, rayk0=5,
                                            raytau0=1e-4)
        u1 = np.asarray(state.u + du * 1800.0)
        assert (u1 >= 0.0).all()
        assert (u1 <= np.asarray(state.u) + 1e-12).all()
