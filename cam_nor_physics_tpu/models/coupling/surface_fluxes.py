"""Bulk surface fluxes + aquaplanet SST — the surface-coupler injection.

The reference receives cam_in from the NorESM coupler (ocean/land/ice models)
each step (SURVEY §1: "phys_run1 -> surface coupler -> phys_run2"). For
standalone runs this module provides the classic data-ocean stand-in:
prescribed SST (Neale & Hoskins aquaplanet profiles) + bulk aerodynamic
fluxes, producing a CamIn from the current physics state — which makes the
framework a complete, self-contained moist GCM.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.saturation import qsat
from ...utils import constants as c
from .camsrfexch import CamIn

CD = 1.3e-3          # bulk transfer coefficient (momentum/heat/moisture)
WIND_MIN = 1.0       # gustiness floor (m/s)


def aquaplanet_sst(lat, profile: str = "control"):
    """Neale & Hoskins (2000) zonally symmetric SST profiles (K)."""
    phi = jnp.abs(lat)
    lim = jnp.pi / 3.0
    x = jnp.sin(1.5 * phi) ** 2
    if profile == "flat":
        t = 27.0 * (1.0 - x ** 4)
    elif profile == "qobs":
        t = 27.0 * (1.0 - 0.5 * (x + x ** 2))
    else:                                  # control
        t = 27.0 * (1.0 - x)
    return jnp.where(phi < lim, t, 0.0) + c.TMELT


def bulk_surface_fluxes(state, sst, pcnst: int) -> CamIn:
    """Bulk aerodynamic surface fluxes over ocean (the coupler's cam_in
    product): sensible/latent heat, water-vapor flux, wind stress."""
    ncol = state.ncol
    dtype = state.t.dtype
    ub, vb = state.u[:, -1], state.v[:, -1]
    tb = state.t[:, -1]
    qb = state.q[:, -1, 0]
    pb = state.pmid[:, -1]
    rho = pb / (c.RAIR * tb)
    vmag = jnp.sqrt(ub ** 2 + vb ** 2 + WIND_MIN ** 2)

    shf = rho * c.CPAIR * CD * vmag * (sst - tb)
    _, qs_sst = qsat(sst, state.ps)
    qflx = rho * CD * vmag * jnp.maximum(qs_sst - qb, -qb)  # kg/m2/s
    lhf = c.LATVAP * qflx
    wsx = -rho * CD * vmag * ub
    wsy = -rho * CD * vmag * vb

    cflx = jnp.zeros((ncol, pcnst), dtype).at[:, 0].set(qflx)
    base = CamIn.zeros(ncol, pcnst, dtype)
    return base.replace(shf=shf, lhf=lhf, cflx=cflx, wsx=wsx, wsy=wsy,
                        ts=sst, sst=sst,
                        landfrac=jnp.zeros((ncol,), dtype),
                        ocnfrac=jnp.ones((ncol,), dtype))
