"""General physics diagnostics — cam_diagnostics equivalent.

Re-implementation of the output side of
/root/reference/physics/cam_diagnostics.F90 (2833 lines). The reference's
hundreds of addfld declarations + per-chunk outfld calls become: declaration
via utils.history.HistoryRegistry, and the payload builders here, each
returning a {name: array} dict to feed `outfld_many`:

  diag_phys_writeout (:1953)  — state fields T/U/V/Q/PS/OMEGA/Z3/...
  diag_conv          (:2021)  — convective transport budget terms
  diag_surf          (:2199)  — surface fields from cam_in/cam_out
  diag_export        (:2307)  — precip/flux fields bound for the coupler
  diag_conv_tend_ini (:1306)  — store pre-convection T/q for budget diffs
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils import constants as c
from ...utils.history import HistoryRegistry


def diag_register(reg: HistoryRegistry) -> None:
    """Declare the diagnostic field set (diag_init_dry/moist role,
    cam_diagnostics.F90:195-1304, reduced to the implemented payloads)."""
    pairs = [
        ("OMEGA", "Pa/s", "Vertical velocity (pressure)", "mid"),
        ("PSL", "Pa", "Sea level pressure", "srf"),
        ("TREFHT", "K", "Reference height temperature", "srf"),
        ("RELHUM", "percent", "Relative humidity", "mid"),
        ("TMQ", "kg/m2", "Total precipitable water", "srf"),
        ("DTCOND", "K/s", "T tendency - moist processes", "mid"),
        ("DCQ", "kg/kg/s", "Q tendency - moist processes", "mid"),
        ("SHFLX", "W/m2", "Surface sensible heat flux", "srf"),
        ("LHFLX", "W/m2", "Surface latent heat flux", "srf"),
        ("QFLX", "kg/m2/s", "Surface water flux", "srf"),
        ("TAUX", "N/m2", "Zonal surface stress", "srf"),
        ("TAUY", "N/m2", "Meridional surface stress", "srf"),
        ("PRECT", "m/s", "Total precipitation rate", "srf"),
        ("PRECST", "m/s", "Total snow rate", "srf"),
        ("TS", "K", "Surface temperature", "srf"),
        ("SST", "K", "Sea surface temperature (slab/prescribed ocean)",
         "srf"),
        # pressure-level slices (diag_init's T850/T500/U250/Z500 family)
        ("T850", "K", "Temperature at 850 mbar pressure surface", "srf"),
        ("T500", "K", "Temperature at 500 mbar pressure surface", "srf"),
        ("U850", "m/s", "Zonal wind at 850 mbar pressure surface", "srf"),
        ("U250", "m/s", "Zonal wind at 250 mbar pressure surface", "srf"),
        ("Z500", "m", "Geopotential Z at 500 mbar pressure surface", "srf"),
        # meridional transport products + second moments (diag_phys_writeout
        # VT/VU/VQ/TT/UU/VV family, cam_diagnostics.F90:1953-2020)
        ("VT", "K m/s", "Meridional heat transport", "mid"),
        ("VU", "m2/s2", "Meridional flux of zonal momentum", "mid"),
        ("VQ", "m/s kg/kg", "Meridional water transport", "mid"),
        ("TT", "K2", "Eddy temperature variance", "mid"),
        ("UU", "m2/s2", "Zonal velocity squared", "mid"),
        ("VV", "m2/s2", "Meridional velocity squared", "mid"),
        ("WSPEED", "m/s", "Horizontal total wind speed maximum", "mid",
         "X"),
        ("QREFHT", "kg/kg", "Reference height humidity", "srf"),
        ("PHIS", "m2/s2", "Surface geopotential", "srf"),
        # cloud-cover summaries (cldsav role)
        ("CLDTOT", "fraction", "Vertically-integrated total cloud", "srf"),
        ("CLDLOW", "fraction", "Vertically-integrated low cloud", "srf"),
        ("CLDMED", "fraction", "Vertically-integrated mid-level cloud",
         "srf"),
        ("CLDHGH", "fraction", "Vertically-integrated high cloud", "srf"),
    ]
    for row in pairs:
        name, units, long_name, vdim = row[:4]
        avgflag = row[4] if len(row) > 4 else "A"
        if name not in reg.fields:
            reg.addfld(name, units, long_name, vdim=vdim, avgflag=avgflag)


def plevel_slice(field, pmid, p_target: float):
    """Linear-in-log-p interpolation of a (ncol, pver) field to one pressure
    surface (vertical_interpolate role); clamps outside the column range."""
    lnp = jnp.log(pmid)
    lnt = jnp.log(jnp.asarray(p_target, field.dtype))
    km = field.shape[1]
    cnt = jnp.sum(lnp <= lnt, axis=1)
    k = jnp.clip(cnt - 1, 0, km - 2)
    oh_lo = (k[:, None] == jnp.arange(km)).astype(field.dtype)
    oh_hi = (k[:, None] + 1 == jnp.arange(km)).astype(field.dtype)
    p_lo = jnp.sum(oh_lo * lnp, axis=1)
    p_hi = jnp.sum(oh_hi * lnp, axis=1)
    f_lo = jnp.sum(oh_lo * field, axis=1)
    f_hi = jnp.sum(oh_hi * field, axis=1)
    w = jnp.clip((lnt - p_lo) / jnp.where(p_hi == p_lo, 1.0, p_hi - p_lo),
                 0.0, 1.0)
    return f_lo + w * (f_hi - f_lo)


def diag_phys_writeout(state) -> dict:
    """State snapshot payload (diag_phys_writeout, cam_diagnostics.F90:1953)."""
    from ...ops.saturation import qsat
    _, qs = qsat(state.t, state.pmid)
    z3 = state.zm + state.phis[:, None] / c.GRAVIT
    return {
        "T": state.t, "U": state.u, "V": state.v, "Q": state.q[:, :, 0],
        "PS": state.ps, "OMEGA": state.omega,
        "Z3": z3,
        "RELHUM": 100.0 * state.q[:, :, 0] / jnp.maximum(qs, 1e-12),
        "TMQ": jnp.sum(state.q[:, :, 0] * state.pdel, axis=-1) / c.GRAVIT,
        "TREFHT": state.t[:, -1],
        "QREFHT": state.q[:, -1, 0],
        "PHIS": state.phis,
        "T850": plevel_slice(state.t, state.pmid, 850e2),
        "T500": plevel_slice(state.t, state.pmid, 500e2),
        "U850": plevel_slice(state.u, state.pmid, 850e2),
        "U250": plevel_slice(state.u, state.pmid, 250e2),
        "Z500": plevel_slice(z3, state.pmid, 500e2),
        "VT": state.v * state.t,
        "VU": state.v * state.u,
        "VQ": state.v * state.q[:, :, 0],
        "TT": state.t * state.t,
        "UU": state.u * state.u,
        "VV": state.v * state.v,
        "WSPEED": jnp.sqrt(state.u ** 2 + state.v ** 2),
    }


def diag_cloud(cld, pmid) -> dict:
    """Cloud-cover summaries by maximum-random overlap (cldsav role,
    cam_diagnostics' CLDTOT/CLDLOW/CLDMED/CLDHGH; bands at 700/400 hPa)."""
    eps = 1.0e-6

    def overlap(mask):
        cf = jnp.where(mask, cld, 0.0)
        cf_up = jnp.concatenate([cf[:, :1] * 0.0, cf[:, :-1]], axis=1)
        num = 1.0 - jnp.maximum(cf, cf_up)
        den = 1.0 - jnp.minimum(cf_up, 1.0 - eps)
        return 1.0 - jnp.prod(num / den, axis=1)

    ones = jnp.ones_like(cld, bool)
    return {
        "CLDTOT": overlap(ones),
        "CLDLOW": overlap(pmid > 700e2),
        "CLDMED": overlap((pmid <= 700e2) & (pmid > 400e2)),
        "CLDHGH": overlap(pmid <= 400e2),
    }


def diag_conv_tend_ini(state) -> dict:
    """Pre-convection snapshot for budget differencing (diag_conv_tend_ini,
    cam_diagnostics.F90:1306) — kept in the step-local diag carry."""
    return {"T_ini": state.t, "Q_ini": state.q[:, :, 0]}


def diag_conv(state, ini: dict, ztodt: float) -> dict:
    """Convective/moist budget terms (diag_conv, cam_diagnostics.F90:2021)."""
    return {
        "DTCOND": (state.t - ini["T_ini"]) / ztodt,
        "DCQ": (state.q[:, :, 0] - ini["Q_ini"]) / ztodt,
    }


def diag_surf(cam_in, cam_out) -> dict:
    """Surface diagnostics (diag_surf, cam_diagnostics.F90:2199)."""
    return {
        "SHFLX": cam_in.shf, "LHFLX": cam_in.lhf,
        "QFLX": cam_in.cflx[:, 0],
        "TAUX": cam_in.wsx, "TAUY": cam_in.wsy, "TS": cam_in.ts,
        "PSL": cam_out.psl,
    }


def diag_export(cam_out) -> dict:
    """Coupler-bound precip/flux payload (diag_export,
    cam_diagnostics.F90:2307)."""
    return {
        "PRECT": cam_out.precc + cam_out.precl,
        "PRECST": cam_out.precsc + cam_out.precsl,
        "PRECC": cam_out.precc,
    }
