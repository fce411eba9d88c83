"""Modal aerosol dry-size diagnosis and hygroscopic water uptake.

TPU-native equivalents of the upstream CAM modules `modal_aero_calcsize`
and `modal_aero_wateruptake` (SURVEY §2.2): both are hard dependencies of
the reference's modal optics — `modal_aero_sw` consumes pbuf DGNUMWET /
QAERWAT that these fill (/root/reference/physics/modal_aer_opt.F90:697-704,
the `modal_aero_calcsize_sub` + `modal_aero_wateruptake_dr` calls), and
physpkg drives them at nstep 0 (/root/reference/physics/physpkg.F90:2899-2930).

Algorithms (standard CAM modal-aerosol formulation):

  calcsize: per mode, the dry number-mode diameter from the mode's total
    dry volume mixing ratio and number mixing ratio,
        v = (pi/6) dgnum^3 exp(4.5 ln^2 sigma) * n,
    with the number first clipped so dgnum lands in [dgnumlo, dgnumhi].

  wateruptake: per mode, the equilibrium wet radius of the volume-mean
    particle from Koehler theory,
        ln S = A/r_w  -  B r_d^3 / (r_w^3 - r_d^3),
    with Kelvin parameter A and volume-weighted hygroscopicity B, solved
    by a fixed-iteration contraction (TPU-friendly: no data-dependent
    branching, unlike the reference ecosystem's closed-form quartic with
    per-point case analysis). Crystallization/deliquescence hysteresis
    ramps the water content linearly between rhcrystal and rhdeliques.

All functions are whole-array over (ncol, pver) and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RHOH2O = 1000.0          # density of liquid water (kg/m3)
KELVIN_A = 2.1e-9        # Kelvin-effect parameter A (m), CAM's kohlerc value
RH_CAP = 0.98            # max RH seen by the uptake (CAM caps hygroscopic
                         # growth at 98% to avoid the Koehler singularity)
PI43 = 4.0 * np.pi / 3.0


def mode_dry_volume(specmmr, species_density):
    """Total dry volume mixing ratio of a mode (m3 per kg air)."""
    return sum(m / d for m, d in zip(specmmr, species_density))


def modal_aero_calcsize(specmmr, species_density, sigma_logr,
                        dgnum_default, dgnumlo, dgnumhi, num_mmr=None):
    """Diagnose the dry number-mode diameter (upstream modal_aero_calcsize
    role, called at /root/reference/physics/modal_aer_opt.F90:699-700).

    specmmr: list of (ncol, pver) species mass mixing ratios; num_mmr:
    optional (ncol, pver) number mixing ratio (# per kg air). Returns
    (dgnumdry, naer, dryvol): diameter (m), number (#/kg), volume (m3/kg).
    """
    dryvol = mode_dry_volume(specmmr, species_density)
    alnsg2 = jnp.log(sigma_logr) ** 2
    vfac = (np.pi / 6.0) * jnp.exp(4.5 * alnsg2)      # vol = vfac dg^3 n
    if num_mmr is None:
        naer = dryvol / (vfac * dgnum_default ** 3)
    else:
        # clip number so the implied diameter stays inside [dgnumlo, dgnumhi]
        n_min = dryvol / (vfac * dgnumhi ** 3)
        n_max = dryvol / (vfac * dgnumlo ** 3)
        naer = jnp.clip(num_mmr, n_min, n_max)
    safe_n = jnp.maximum(naer, 1.0e-30)
    dgnum = jnp.cbrt(dryvol / (vfac * safe_n))
    dgnum = jnp.clip(dgnum, dgnumlo, dgnumhi)
    dgnum = jnp.where(dryvol > 1.0e-30, dgnum, dgnum_default)
    return dgnum, naer, dryvol


def kohler_wet_radius(rdry, hygro, rh, n_iter: int = 40):
    """Equilibrium wet radius from Koehler theory.

    Solves  ln S = A/r_w - B r_d^3/(r_w^3 - r_d^3)  by the fixed-point
        r_w = r_d * (1 + B / (A/r_w - ln S))^(1/3),
    which is a contraction for S < 1 (A/r_w - ln S > 0 throughout). RH is
    capped at RH_CAP. Whole-array, fixed trip count (lax-friendly).
    rdry, hygro, rh broadcastable; returns r_w >= r_d.
    """
    s = jnp.clip(rh, 0.0, RH_CAP)
    lns = jnp.log(jnp.maximum(s, 1.0e-10))            # <= log(0.98) < 0
    b = jnp.maximum(hygro, 0.0)
    rw = rdry * jnp.cbrt(1.0 + b / jnp.maximum(-lns, 1.0e-10))
    for _ in range(n_iter):
        denom = jnp.maximum(KELVIN_A / jnp.maximum(rw, 1.0e-12) - lns,
                            1.0e-12)
        rw = rdry * jnp.cbrt(1.0 + b / denom)
    return jnp.maximum(rw, rdry)


def modal_aero_wateruptake(specmmr, species_density, species_hygro,
                           sigma_logr, dgnumdry, naer, rh,
                           rhcrystal: float = 0.35,
                           rhdeliques: float = 0.80):
    """Hygroscopic growth of one mode (upstream modal_aero_wateruptake_dr
    role, /root/reference/physics/modal_aer_opt.F90:701-704; fills the
    DGNUMWET / QAERWAT pbuf fields the optics consume at :713-714).

    Returns dict(dgnumwet, qaerwat, wetdens, hygro):
      dgnumwet (m), qaerwat (kg water / kg air), wetdens (kg/m3) of the
      wet mode, and the volume-weighted hygroscopicity diagnostic.
    Hysteresis: no water below rhcrystal; linear ramp of the deliquesced
    water content on [rhcrystal, rhdeliques); full Koehler equilibrium
    above (the CAM hystfac treatment).
    """
    vols = [m / d for m, d in zip(specmmr, species_density)]
    dryvol = sum(vols)
    drymass = sum(specmmr)
    safe_dv = jnp.maximum(dryvol, 1.0e-30)
    hygro = sum(v * h for v, h in zip(vols, species_hygro)) / safe_dv

    # volume-mean dry radius given the mode number (the wateruptake_sub
    # dryrad, not the number-mode radius)
    safe_n = jnp.maximum(naer, 1.0e-30)
    rdry = jnp.cbrt(safe_dv / (PI43 * safe_n))

    rwet_eq = kohler_wet_radius(rdry, hygro, rh)
    rwet_del = kohler_wet_radius(rdry, hygro, jnp.full_like(rh, rhdeliques))

    wetvol_eq = PI43 * safe_n * rwet_eq ** 3
    wetvol_del = PI43 * safe_n * rwet_del ** 3
    hystfac = 1.0 / max(rhdeliques - rhcrystal, 1.0e-5)
    ramp = jnp.clip((rh - rhcrystal) * hystfac, 0.0, 1.0)
    wetvol_ramp = dryvol + (wetvol_del - dryvol) * ramp

    wetvol = jnp.where(rh >= rhdeliques, wetvol_eq,
                       jnp.where(rh >= rhcrystal, wetvol_ramp, dryvol))
    wetvol = jnp.maximum(wetvol, dryvol)

    qaerwat = RHOH2O * (wetvol - dryvol)
    rwet = jnp.cbrt(wetvol / (PI43 * safe_n))
    dgnumwet = dgnumdry * rwet / jnp.maximum(rdry, 1.0e-12)
    dgnumwet = jnp.where(dryvol > 1.0e-30, dgnumwet, dgnumdry)
    qaerwat = jnp.where(dryvol > 1.0e-30, qaerwat, 0.0)

    wetdens = jnp.where(wetvol > 1.0e-30,
                        (drymass + qaerwat) / jnp.maximum(wetvol, 1.0e-30),
                        RHOH2O)
    return dict(dgnumwet=dgnumwet, qaerwat=qaerwat, wetdens=wetdens,
                hygro=hygro)
