"""Climate statistics accumulator — zonal-time-mean climatology on pressure
surfaces (the analysis the Held–Suarez 1994 benchmark is judged by).

HS94 (BAMS 75, 1825-1830) defines the test by the long-time zonal-mean
climate: subtropical westerly jets of ~30 m/s near 250 hPa at ±40-50°,
surface easterlies in the tropics, a single thermally-direct Hadley cell per
hemisphere, and temperature variance maxima in midlatitudes. The reference
model itself relies on the same CTEM-style zonal-mean products for this
analysis (/root/reference/fv/ctem.F90:32-493, history payload U2d/V2d/...).

Accumulation is a pure pytree update (jit-safe, device-resident); the
summary/verdict runs host-side at the end of the run.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.fv.ctem import default_ctem_levels, interp_to_pressure


def climo_init(km: int, jm: int, nplev: int | None = None,
               dtype=jnp.float32) -> dict:
    """Zeroed accumulator: running sums of zonal-mean u, v, T, T², u², and
    the sample count, on (nplev, jm) pressure-latitude sections."""
    npl = nplev or len(default_ctem_levels(km))
    z = jnp.zeros((npl, jm), dtype)
    return {"u": z, "v": z, "t": z, "t2": z, "u2": z,
            "count": jnp.zeros((), dtype)}


def climo_update(acc: dict, u3, v3, t3, pmid, plev=None) -> dict:
    """Accumulate one sample of the zonal-mean state. Inputs (km, jm, im)
    A-grid winds/temperature and layer mid-pressures."""
    if plev is None:
        plev = default_ctem_levels(u3.shape[0])
    up = jnp.mean(interp_to_pressure(u3, pmid, plev), axis=-1)
    vp = jnp.mean(interp_to_pressure(v3, pmid, plev), axis=-1)
    tp = jnp.mean(interp_to_pressure(t3, pmid, plev), axis=-1)
    return {"u": acc["u"] + up, "v": acc["v"] + vp, "t": acc["t"] + tp,
            "t2": acc["t2"] + tp * tp, "u2": acc["u2"] + up * up,
            "count": acc["count"] + 1.0}


def climo_resolve(acc: dict) -> dict:
    """Time means (and temporal variances of the zonal means), host-side."""
    n = float(np.maximum(np.asarray(acc["count"]), 1.0))
    u = np.asarray(acc["u"]) / n
    v = np.asarray(acc["v"]) / n
    t = np.asarray(acc["t"]) / n
    return {"u": u, "v": v, "t": t,
            "u_var": np.asarray(acc["u2"]) / n - u * u,
            "t_var": np.asarray(acc["t2"]) / n - t * t,
            "nsamples": n}


def hs94_checks(climo: dict, lats_deg: np.ndarray,
                plev: np.ndarray) -> dict:
    """Quantitative HS94-climatology structure checks.

    Returns {name: (value, ok)} per criterion; criteria follow the published
    HS94 figures (their Fig. 1-2) with generous tolerances — this is a
    structure test, not a regression against their exact contours:
      jet_speed      : max time-zonal-mean u in 20 - 45 m/s
      jet_latitude   : |lat of max| in 30 - 60°
      jet_pressure   : p of max u in 150 - 400 hPa
      tropical_east  : equatorial-band zonal wind easterly (min u < 0)
      sfc_polar_t    : lowest-level T decreases equator->pole by > 20 K
      temp_monotone  : T at 300 hPa colder than at 850 hPa (lapse)
    """
    u, t = climo["u"], climo["t"]
    npl, jm = u.shape
    imax = np.unravel_index(np.argmax(u), u.shape)
    jet_speed = float(u[imax])
    jet_lat = float(abs(lats_deg[imax[1]]))
    jet_p = float(plev[imax[0]] / 100.0)

    trop = np.abs(lats_deg) < 15.0
    tropical_min_u = float(u[:, trop].min())

    low = -1                     # largest pressure = lowest level
    eq = np.argmin(np.abs(lats_deg))
    sfc_dt = float(t[low, eq] - min(t[low, 0], t[low, -1]))

    k300 = int(np.argmin(np.abs(plev - 300e2)))
    k850 = int(np.argmin(np.abs(plev - 850e2)))
    lapse_dt = float(np.mean(t[k850] - t[k300]))

    return {
        "jet_speed_ms": (jet_speed, 20.0 <= jet_speed <= 45.0),
        "jet_latitude_deg": (jet_lat, 30.0 <= jet_lat <= 60.0),
        "jet_pressure_hpa": (jet_p, 150.0 <= jet_p <= 400.0),
        "tropical_easterlies_ms": (tropical_min_u, tropical_min_u < 0.0),
        "sfc_eq_pole_dT_K": (sfc_dt, sfc_dt > 20.0),
        "lapse_850_300_dT_K": (lapse_dt, lapse_dt > 20.0),
    }
