"""Vertical PPM remap, filling, and hybrid coordinate tests."""

import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.fv.vertical import (hybrid_coefficients,
                                                    sigma_coefficients)
from cam_nor_physics_tpu.ops.fill import fillz, qneg3, qneg4
from cam_nor_physics_tpu.ops.remap import ppm_remap
from cam_nor_physics_tpu.utils import constants as c


def make_grids(ncol=6, km=26, seed=0):
    """Source = perturbed (Lagrangian-like) interfaces; target = hybrid."""
    rng = np.random.default_rng(seed)
    coord = hybrid_coefficients(km)
    ps = 1.0e5 * (1.0 + 0.02 * rng.standard_normal(ncol))
    pe_tgt = np.asarray(coord.pint(jnp.asarray(ps)))
    # deform interior interfaces (keep monotone + same endpoints)
    pert = 0.25 * rng.uniform(-1, 1, (ncol, km + 1))
    pe_src = pe_tgt.copy()
    dpe = np.diff(pe_tgt, axis=1)
    pe_src[:, 1:-1] += pert[:, 1:-1] * np.minimum(dpe[:, :-1], dpe[:, 1:])
    assert np.all(np.diff(pe_src, axis=1) > 0)
    return jnp.asarray(pe_src), jnp.asarray(pe_tgt)


class TestPPMRemap:
    def test_conservation(self):
        pe_src, pe_tgt = make_grids()
        rng = np.random.default_rng(1)
        q = jnp.asarray(np.abs(rng.standard_normal((6, 26))) + 0.1)
        qn = ppm_remap(pe_src, q, pe_tgt, kord=4)
        m_src = np.sum(np.asarray(q) * np.diff(np.asarray(pe_src), axis=1), axis=1)
        m_tgt = np.sum(np.asarray(qn) * np.diff(np.asarray(pe_tgt), axis=1), axis=1)
        np.testing.assert_allclose(m_tgt, m_src, rtol=1e-13)

    def test_identity_when_grids_equal(self):
        pe_src, _ = make_grids()
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.standard_normal((6, 26)))
        qn = ppm_remap(pe_src, q, pe_src, kord=4)
        np.testing.assert_allclose(np.asarray(qn), np.asarray(q), atol=1e-12)

    def test_constant_preserved(self):
        pe_src, pe_tgt = make_grids()
        q = jnp.full((6, 26), 3.7)
        qn = ppm_remap(pe_src, q, pe_tgt, kord=4)
        np.testing.assert_allclose(np.asarray(qn), 3.7, rtol=1e-13)

    def test_monotone_no_overshoot(self):
        pe_src, pe_tgt = make_grids()
        # monotone profile in k
        q = jnp.asarray(np.linspace(1.0, 0.0, 26)[None, :] ** 2 *
                        np.ones((6, 1)))
        qn = np.asarray(ppm_remap(pe_src, q, pe_tgt, kord=4))
        assert qn.min() >= -1e-13
        assert qn.max() <= float(q.max()) + 1e-12

    def test_smooth_accuracy(self):
        # remap of a smooth profile between grids loses little accuracy
        pe_src, pe_tgt = make_grids()
        pm_src = 0.5 * (pe_src[:, 1:] + pe_src[:, :-1])
        pm_tgt = 0.5 * (pe_tgt[:, 1:] + pe_tgt[:, :-1])
        q = jnp.sin(pm_src / 2.0e4)
        qn = np.asarray(ppm_remap(pe_src, q, pe_tgt, kord=4))
        expect = np.sin(np.asarray(pm_tgt) / 2.0e4)
        # bound includes the O(dp^2) cell-mean vs midpoint-sample difference
        assert np.max(np.abs(qn - expect)) < 1e-2

    def test_kord2_linear(self):
        pe_src, pe_tgt = make_grids()
        q = jnp.asarray(np.linspace(0.0, 1.0, 26)[None, :] * np.ones((6, 1)))
        qn = ppm_remap(pe_src, q, pe_tgt, kord=2)
        m_src = np.sum(np.asarray(q) * np.diff(np.asarray(pe_src), axis=1), axis=1)
        m_tgt = np.sum(np.asarray(qn) * np.diff(np.asarray(pe_tgt), axis=1), axis=1)
        np.testing.assert_allclose(m_tgt, m_src, rtol=1e-13)


class TestFill:
    def test_qneg3(self):
        q = jnp.asarray([[1.0, -0.5, 2.0, -0.1]])
        qf, worst, n = qneg3(q, 0.0)
        np.testing.assert_allclose(np.asarray(qf), [[1.0, 0.0, 2.0, 0.0]])
        assert float(worst) == -0.5 and int(n) == 2

    def test_qneg4_limits(self):
        cflx = jnp.asarray([-1.0, 0.5])
        qbot = jnp.asarray([1e-3, 1e-3])
        pdel = jnp.asarray([2000.0, 2000.0])
        out = qneg4(cflx, qbot, pdel, 1800.0, c.GRAVIT)
        lim = 1e-3 * 2000.0 / (c.GRAVIT * 1800.0)
        np.testing.assert_allclose(np.asarray(out), [-lim, 0.5])

    def test_fillz_conserves(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((4, 10)) * 0.1 + 0.05)
        dp = jnp.asarray(np.abs(rng.standard_normal((4, 10))) + 1.0)
        qf, resid = fillz(q, dp)
        assert np.all(np.asarray(qf) >= 0.0)
        # residual = mass created when the column is net-negative
        m0 = np.sum(np.asarray(q * dp), axis=-1)
        m1 = np.sum(np.asarray(qf * dp), axis=-1) - np.asarray(resid)
        np.testing.assert_allclose(m1, m0, rtol=1e-10, atol=1e-14)


class TestHybridCoord:
    def test_surface_pressure_exact(self):
        coord = hybrid_coefficients(26)
        ps = jnp.asarray([9.3e4, 1.01e5])
        pint = np.asarray(coord.pint(ps))
        np.testing.assert_allclose(pint[:, -1], np.asarray(ps))
        np.testing.assert_allclose(pint[:, 0], coord.ptop)
        assert np.all(np.diff(pint, axis=1) > 0)

    def test_sigma(self):
        coord = sigma_coefficients(20)
        ps = jnp.asarray([1.0e5])
        pint = np.asarray(coord.pint(ps))
        assert np.all(np.diff(pint, axis=1) > 0)
        np.testing.assert_allclose(pint[0, -1], 1.0e5)
