"""Entropy/enthalpy inversion solver equivalence: fixed-count secant
("newton") vs the reference's Brent loop."""

import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.ops.thermo import (enthalpy, entropy, ienthalpy,
                                            ientropy)


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(0)
    n = 2000
    return (jnp.asarray(rng.uniform(200.0, 310.0, n)),
            jnp.asarray(rng.uniform(100.0, 1000.0, n)),
            jnp.asarray(rng.uniform(1e-5, 0.02, n)),
            jnp.asarray(rng.uniform(0.0, 15000.0, n)),
            jnp.asarray(rng.uniform(-8.0, 8.0, n)))


class TestInversionSolvers:
    def test_entropy_solvers_agree(self, samples):
        t_true, p, qt, z, dt0 = samples
        s = entropy(t_true, p, qt)
        tb, _, cb = ientropy(s, p, qt, t_true + dt0, solver="brent")
        tn, _, cn = ientropy(s, p, qt, t_true + dt0, solver="newton")
        assert bool(cb.all()) and bool(cn.all())
        assert float(jnp.abs(tb - tn).max()) < 5e-3      # both within tol
        assert float(jnp.abs(tn - t_true).max()) < 1e-3  # reference tol

    def test_enthalpy_solvers_agree(self, samples):
        t_true, p, qt, z, dt0 = samples
        h = enthalpy(t_true, p, qt, z)
        tb, _, _ = ienthalpy(h, p, qt, z, t_true + dt0, solver="brent")
        tn, _, _ = ienthalpy(h, p, qt, z, t_true + dt0, solver="newton")
        assert float(jnp.abs(tb - tn).max()) < 5e-3
        assert float(jnp.abs(tn - t_true).max()) < 1e-3

    def test_newton_handles_saturation_kink(self):
        # targets straddling the saturated/unsaturated transition
        t_true = jnp.asarray(np.linspace(270.0, 290.0, 50))
        p = jnp.full((50,), 850.0)
        qt = jnp.full((50,), 0.012)       # saturates around ~287 K at 850 hPa
        s = entropy(t_true, p, qt)
        tn, _, cn = ientropy(s, p, qt, t_true - 6.0, solver="newton")
        assert bool(cn.all())
        assert float(jnp.abs(tn - t_true).max()) < 1e-3

    def test_newton_exact_matches_truth(self, samples):
        """Analytic-derivative Newton (4 iterations) hits the reference
        tolerance on both potentials, including across the saturation
        kink."""
        t_true, p, qt, z, dt0 = samples
        s = entropy(t_true, p, qt)
        h = enthalpy(t_true, p, qt, z)
        ts, _, cs = ientropy(s, p, qt, t_true + dt0, solver="newton_exact")
        th, _, ch = ienthalpy(h, p, qt, z, t_true + dt0,
                              solver="newton_exact")
        assert bool(cs.all()), f"unconverged: {int((~cs).sum())}"
        assert bool(ch.all()), f"unconverged: {int((~ch).sum())}"
        assert float(jnp.abs(ts - t_true).max()) < 1e-3
        assert float(jnp.abs(th - t_true).max()) < 1e-3

    def test_newton_exact_saturation_kink(self):
        t_true = jnp.asarray(np.linspace(270.0, 290.0, 50))
        p = jnp.full((50,), 850.0)
        qt = jnp.full((50,), 0.012)
        for pot, inv, args in (
                (entropy, ientropy, (p, qt)),
                (lambda t, p, q: enthalpy(t, p, q, jnp.full((50,), 1500.0)),
                 ienthalpy, (p, qt, jnp.full((50,), 1500.0)))):
            tgt = pot(t_true, p, qt)
            tn, _, cn = inv(tgt, *args, t_guess=t_true - 6.0,
                            solver="newton_exact")
            assert bool(cn.all())
            assert float(jnp.abs(tn - t_true).max()) < 1e-3
