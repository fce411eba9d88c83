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
    ]
    for name, units, long_name, vdim in pairs:
        if name not in reg.fields:
            reg.addfld(name, units, long_name, vdim=vdim)


def diag_phys_writeout(state) -> dict:
    """State snapshot payload (diag_phys_writeout, cam_diagnostics.F90:1953)."""
    from ...ops.saturation import qsat
    _, qs = qsat(state.t, state.pmid)
    return {
        "T": state.t, "U": state.u, "V": state.v, "Q": state.q[:, :, 0],
        "PS": state.ps, "OMEGA": state.omega,
        "Z3": state.zm + state.phis[:, None] / c.GRAVIT,
        "RELHUM": 100.0 * state.q[:, :, 0] / jnp.maximum(qs, 1e-12),
        "TMQ": jnp.sum(state.q[:, :, 0] * state.pdel, axis=-1) / c.GRAVIT,
        "TREFHT": state.t[:, -1],
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
