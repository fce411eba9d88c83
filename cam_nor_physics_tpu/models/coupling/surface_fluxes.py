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


# ---------------------------------------------------------------------------
# Slab ("mixed-layer") ocean — closes the surface energy budget so the
# standalone GCM has a finite equilibrium (a fixed-SST ocean is an infinite
# heat source under a greenhouse; see VALIDATION.md). dSST/dt =
# (net surface energy flux into the ocean) / (rho_w c_w h).
# ---------------------------------------------------------------------------

RHO_W = 1000.0
CW = 4218.0
SB_ = 5.670374419e-8


def slab_ocean_step(sst, cam_in, cam_out, dt: float, h_mix: float = 30.0,
                    q_flux=None, sst_min: float = 271.35):
    """Advance the mixed-layer SST one step.

    Net flux into the ocean = netsw + flwds − σSST⁴ − shf − lhf − L_f·snow.
    `q_flux`: optional prescribed ocean heat transport divergence (W/m2,
    positive = ocean loses heat, the aquaplanet "Q-flux"). SST floored at the
    freezing point of seawater (a crude ice cap).
    """
    net = (cam_out.netsw + cam_out.flwds - SB_ * sst ** 4
           - cam_in.shf - cam_in.lhf
           - c.LATICE * c.RHOH2O * (cam_out.precsc + cam_out.precsl))
    if q_flux is not None:
        net = net - q_flux
    sst_new = sst + dt * net / (RHO_W * CW * h_mix)
    return jnp.maximum(sst_new, sst_min)
