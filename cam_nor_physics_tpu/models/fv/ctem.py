"""TEM circulation diagnostics — ctem equivalent.

Re-implementation of /root/reference/fv/ctem.F90 (616 lines): Transformed
Eulerian Mean diagnostics. The reference interpolates u, v, ω, θ to pressure
surfaces, forms zonal means and eddy covariances v'θ', ω'θ', u'v', u'ω'
(ctem_diags :32-493), gathering full latitude circles across the x-decomposed
ranks (`pargatherint`, :40).

TPU-native: with the resident layout keeping x chip-local (SURVEY §5.7) the
zonal mean is a plain mean over the minor axis — no gather; under an
x-sharded mesh the same `jnp.mean` lowers to a psum. Pressure interpolation
is linear in log p with a comparison-count cell search (gather-free,
SPMD-safe).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils import constants as c


def default_ctem_levels(km: int = 26) -> np.ndarray:
    """Standard pressure surfaces for the TEM output (ctem_init's use of
    hycoef reference pressures)."""
    return np.geomspace(30.0e2, 1000.0e2, km)


def interp_to_pressure(field, pmid, plev):
    """Linear-in-log-p interpolation of (km, jm, im) field to (nplev,)
    target surfaces; out-of-range levels clamp to the boundary values
    (interpolate_data role). Gather-free: one-hot contraction over km."""
    km = field.shape[0]
    lnp = jnp.log(pmid)                              # (km, jm, im)
    lnt = jnp.log(jnp.asarray(plev, field.dtype))    # (npl,)

    # containing layer per target: k with lnp[k] <= t < lnp[k+1]
    cnt = jnp.sum(lnp[None] <= lnt[:, None, None, None], axis=1)  # (npl,jm,im)
    k = jnp.clip(cnt - 1, 0, km - 2)
    onehot_lo = (k[..., None] == jnp.arange(km)).astype(field.dtype)
    onehot_hi = (k[..., None] + 1 == jnp.arange(km)).astype(field.dtype)

    def at_k(a, oh):                                 # (km,jm,im) -> (npl,jm,im)
        return jnp.einsum('pjik,kji->pji', oh, a)

    p_lo = at_k(lnp, onehot_lo)
    p_hi = at_k(lnp, onehot_hi)
    f_lo = at_k(field, onehot_lo)
    f_hi = at_k(field, onehot_hi)
    w = jnp.clip((lnt[:, None, None] - p_lo) /
                 jnp.where(p_hi == p_lo, 1.0, p_hi - p_lo), 0.0, 1.0)
    return f_lo + w * (f_hi - f_lo)


def ctem_diags(u3, v3, omega, t3, pmid, plev=None) -> dict:
    """TEM diagnostics (ctem_diags, ctem.F90:32-493).

    Inputs on (km, jm, im) cell centers (A-grid winds). Returns zonal-mean
    fields (nplev, jm) — the reference's history payload (VTH2d, UV2d, WTH2d,
    U2d, V2d, TH2d, W2d plus the zonal-mean products MSKtem masked upstream).
    """
    if plev is None:
        plev = default_ctem_levels(u3.shape[0])
    theta = t3 * (1.0e5 / pmid) ** c.CAPPA

    up = interp_to_pressure(u3, pmid, plev)
    vp = interp_to_pressure(v3, pmid, plev)
    wp = interp_to_pressure(omega, pmid, plev)
    thp = interp_to_pressure(theta, pmid, plev)

    def zm(a):
        return jnp.mean(a, axis=-1)                  # zonal mean (npl, jm)

    ub, vb, wb, thb = zm(up), zm(vp), zm(wp), zm(thp)
    upr = up - ub[..., None]
    vpr = vp - vb[..., None]
    wpr = wp - wb[..., None]
    thpr = thp - thb[..., None]

    return {
        "U2d": ub, "V2d": vb, "W2d": wb, "TH2d": thb,
        "VTH2d": zm(vpr * thpr),      # meridional eddy heat flux
        "WTH2d": zm(wpr * thpr),      # vertical eddy heat flux
        "UV2d": zm(upr * vpr),        # meridional eddy momentum flux
        "UW2d": zm(upr * wpr),        # vertical eddy momentum flux
    }
