"""Modal aerosol calcsize + Koehler wateruptake tests (the upstream
modal_aero_calcsize / modal_aero_wateruptake contracts consumed at
/root/reference/physics/modal_aer_opt.F90:697-704)."""

import jax
import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.physics.modal_aero_wateruptake import (
    PI43, KELVIN_A, modal_aero_calcsize, modal_aero_wateruptake,
    kohler_wet_radius)

DENS = (1770.0, 1000.0)
HYGRO = (0.507, 0.10)
SIG = 1.8


def _specmmr(ncol=4, pver=8, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(np.abs(rng.normal(2e-9, 1e-9, (ncol, pver)))),
            jnp.asarray(np.abs(rng.normal(1e-9, 5e-10, (ncol, pver))))]


class TestCalcsize:
    def test_volume_number_diameter_consistency(self):
        specmmr = _specmmr()
        dg, naer, dryvol = modal_aero_calcsize(
            specmmr, DENS, SIG, 0.11e-6, 0.0535e-6, 0.44e-6)
        # invert: vfac * dg^3 * n == dryvol where unclipped
        vfac = (np.pi / 6) * np.exp(4.5 * np.log(SIG) ** 2)
        np.testing.assert_allclose(
            np.asarray(vfac * dg ** 3 * naer), np.asarray(dryvol),
            rtol=1e-10)

    def test_number_clipped_into_diameter_bounds(self):
        specmmr = _specmmr()
        # absurdly large number -> diameter pinned at dgnumlo
        num = jnp.full_like(specmmr[0], 1e18)
        dg, naer, _ = modal_aero_calcsize(
            specmmr, DENS, SIG, 0.11e-6, 0.0535e-6, 0.44e-6, num)
        np.testing.assert_allclose(np.asarray(dg), 0.0535e-6, rtol=1e-10)
        # absurdly small number -> pinned at dgnumhi
        dg2, _, _ = modal_aero_calcsize(
            specmmr, DENS, SIG, 0.11e-6, 0.0535e-6, 0.44e-6,
            jnp.full_like(specmmr[0], 1e-6))
        np.testing.assert_allclose(np.asarray(dg2), 0.44e-6, rtol=1e-10)


class TestKohler:
    def test_solution_satisfies_kohler_equation(self):
        rd = jnp.asarray([0.05e-6, 0.1e-6, 0.5e-6])
        hygro = jnp.asarray([0.5, 0.2, 0.8])
        rh = jnp.asarray([0.6, 0.8, 0.95])
        rw = kohler_wet_radius(rd, hygro, rh)
        # ln S = A/rw - B rd^3/(rw^3 - rd^3)
        lhs = np.log(np.asarray(rh))
        rwn, rdn = np.asarray(rw), np.asarray(rd)
        rhs = KELVIN_A / rwn - np.asarray(hygro) * rdn ** 3 / \
            (rwn ** 3 - rdn ** 3)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-6)

    def test_growth_monotone_in_rh_and_hygro(self):
        rd = jnp.full((5,), 0.1e-6)
        rh = jnp.asarray([0.1, 0.4, 0.7, 0.9, 0.97])
        rw = np.asarray(kohler_wet_radius(rd, 0.5, rh))
        assert (np.diff(rw) > 0).all()
        rw2 = np.asarray(kohler_wet_radius(rd, 0.9, rh))
        assert (rw2 >= rw).all()

    def test_zero_hygro_stays_dry(self):
        rw = kohler_wet_radius(jnp.asarray([0.1e-6]), 0.0,
                               jnp.asarray([0.9]))
        np.testing.assert_allclose(np.asarray(rw), 0.1e-6, rtol=1e-12)


class TestWateruptake:
    def _run(self, rh_val):
        specmmr = _specmmr()
        dg, naer, _ = modal_aero_calcsize(
            specmmr, DENS, SIG, 0.11e-6, 0.0535e-6, 0.44e-6)
        rh = jnp.full_like(specmmr[0], rh_val)
        return specmmr, dg, naer, modal_aero_wateruptake(
            specmmr, DENS, HYGRO, SIG, dg, naer, rh)

    def test_dry_below_crystallization(self):
        _, dg, _, wu = self._run(0.2)          # < rhcrystal=0.35
        np.testing.assert_allclose(np.asarray(wu["qaerwat"]), 0.0,
                                   atol=1e-30)
        np.testing.assert_allclose(np.asarray(wu["dgnumwet"]),
                                   np.asarray(dg), rtol=1e-10)

    def test_hysteresis_ramp_below_deliquescence(self):
        _, _, _, lo = self._run(0.5)
        _, _, _, hi = self._run(0.7)
        _, _, _, deli = self._run(0.80)
        q_lo, q_hi = np.asarray(lo["qaerwat"]), np.asarray(hi["qaerwat"])
        q_del = np.asarray(deli["qaerwat"])
        assert (q_lo > 0).all() and (q_hi > q_lo).all()
        # linear ramp: water at rh on [crystal, deliques) is
        # (rh-0.35)/0.45 of the deliquesced water
        np.testing.assert_allclose(q_lo, q_del * (0.5 - 0.35) / 0.45,
                                   rtol=1e-6)

    def test_wet_humid_growth_and_density(self):
        specmmr, dg, naer, wu = self._run(0.95)
        assert (np.asarray(wu["dgnumwet"]) > np.asarray(dg)).all()
        wd = np.asarray(wu["wetdens"])
        assert (wd > 900.0).all() and (wd < 2700.0).all()
        # water mass consistent with the volume budget
        dryvol = sum(np.asarray(m) / d for m, d in zip(specmmr, DENS))
        wetvol = PI43 * np.asarray(naer) * \
            (np.asarray(wu["dgnumwet"]) / np.asarray(dg)) ** 3 * \
            (dryvol / (PI43 * np.asarray(naer)))
        np.testing.assert_allclose(np.asarray(wu["qaerwat"]),
                                   1000.0 * (wetvol - dryvol), rtol=1e-6)

    def test_jit_clean(self):
        specmmr = _specmmr()
        dg, naer, _ = modal_aero_calcsize(
            specmmr, DENS, SIG, 0.11e-6, 0.0535e-6, 0.44e-6)
        rh = jnp.full_like(specmmr[0], 0.9)
        f = jax.jit(lambda s, d, n, r: modal_aero_wateruptake(
            s, DENS, HYGRO, SIG, d, n, r))
        out = f(specmmr, dg, naer, rh)
        assert np.isfinite(np.asarray(out["qaerwat"])).all()
