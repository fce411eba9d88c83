"""Modal aerosol optics tests: Chebyshev basis, volume mixing, table
interpolation, SW/LW physical-range invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics.modal_aer_opt import (
    NCOEF, AeroMode, make_synthetic_table, modal_aero_lw, modal_aero_sw,
    modal_size_parameters, _bilinear_cell)


@pytest.fixture(scope="module")
def mode():
    tbl = make_synthetic_table()
    return AeroMode(
        name="accum",
        species_names=("so4", "pom", "dst"),
        species_density=(1770.0, 1000.0, 2600.0),
        species_refindex_sw=(complex(1.43, 1e-8), complex(1.55, 5e-3),
                             complex(1.53, 6e-3)),
        species_refindex_lw=(complex(1.35, 0.2), complex(1.5, 0.1),
                             complex(1.5, 0.3)),
        table=tbl)


@pytest.fixture(scope="module")
def fields():
    ncol, pver = 6, 12
    rng = np.random.default_rng(3)
    specmmr = [jnp.asarray(np.abs(rng.normal(1e-9, 5e-10, (ncol, pver))))
               for _ in range(3)]
    dgnumwet = jnp.asarray(rng.uniform(0.05e-6, 1.0e-6, (ncol, pver)))
    qaerwat = jnp.asarray(np.abs(rng.normal(1e-9, 5e-10, (ncol, pver))))
    mass = jnp.full((ncol, pver), 800.0)
    return specmmr, dgnumwet, qaerwat, mass


class TestSizeParameters:
    def test_chebyshev_recurrence_and_range(self):
        tbl = make_synthetic_table()
        d = jnp.asarray([[0.2e-6, 1.0e-6, 30.0e-6, 1.0e-9]])
        radsurf, logradsurf, cheb = modal_size_parameters(
            d, tbl.rmmin, tbl.rmmax, 1.8)
        assert cheb.shape == (1, 4, NCOEF)
        # T0 == 1; |Tn| <= 1 on the clipped domain
        np.testing.assert_allclose(np.asarray(cheb[..., 0]), 1.0)
        assert float(jnp.abs(cheb).max()) <= 1.0 + 1e-12
        # surface radius = d/2 exp(2 ln^2 sigma); log is unclipped
        np.testing.assert_allclose(
            np.asarray(radsurf),
            np.asarray(d) / 2 * np.exp(2 * np.log(1.8) ** 2), rtol=1e-12)
        assert float(logradsurf[0, 2]) > np.log(tbl.rmmax)

    def test_bilinear_weights_partition_of_unity(self):
        nband = 3
        grid = np.tile(np.linspace(1.3, 1.7, 7)[:, None], (1, nband))
        x = jnp.broadcast_to(
            jnp.asarray([1.29, 1.31, 1.5, 1.69, 1.8])[None, :, None],
            (2, 5, nband))
        w = _bilinear_cell(grid, x)
        np.testing.assert_allclose(np.asarray(w.sum(axis=-1)), 1.0,
                                   rtol=1e-12)
        # interpolation of the grid itself reproduces clipped x
        xi = jnp.einsum('cpbn,bn->cpb', w, jnp.asarray(grid.T))
        np.testing.assert_allclose(np.asarray(xi),
                                   np.clip(np.asarray(x), 1.3, 1.7),
                                   rtol=1e-12)


class TestSWLW:
    def test_sw_ranges(self, mode, fields):
        specmmr, dgnumwet, qaerwat, mass = fields
        out = jax.jit(lambda: modal_aero_sw(mode, specmmr, dgnumwet,
                                            qaerwat, mass))()
        tau = np.asarray(out["tau"])
        assert tau.shape == (6, 12, 14)
        assert (tau >= 0).all()
        assert (np.asarray(out["tau_w"]) <= tau + 1e-12).all()
        assert (np.asarray(out["AODVIS"]) >= 0).all()
        # tau_w_f <= tau_w_g in magnitude (f = g^2 weighting)
        assert (np.abs(np.asarray(out["tau_w_f"])) <=
                np.abs(np.asarray(out["tau_w_g"])) + 1e-12).all()

    def test_sw_scales_with_wet_volume(self, mode, fields):
        specmmr, dgnumwet, qaerwat, mass = fields
        o1 = modal_aero_sw(mode, specmmr, dgnumwet, qaerwat, mass)
        # doubling species mass AND water doubles the wet volume at fixed
        # bulk refractive index and fixed radius, so tau doubles exactly
        # (tau = exp(chebsum(m)) * wetvol * rhoh2o * mass, :869-896)
        o2 = modal_aero_sw(mode, [2.0 * s for s in specmmr], dgnumwet,
                           2.0 * qaerwat, mass)
        np.testing.assert_allclose(np.asarray(o2["tau"]),
                                   2.0 * np.asarray(o1["tau"]), rtol=1e-10)

    def test_lw_nonnegative(self, mode, fields):
        specmmr, dgnumwet, qaerwat, mass = fields
        tau = np.asarray(modal_aero_lw(mode, specmmr, dgnumwet, qaerwat,
                                       mass))
        assert tau.shape == (6, 12, 16)
        assert (tau >= 0).all()
