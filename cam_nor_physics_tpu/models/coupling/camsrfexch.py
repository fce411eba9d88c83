"""Surface-exchange container types — cam_in_t / cam_out_t equivalents.

The reference's `control/` directory (shadow of camsrfexch.F90) is listed in
its README but absent from the mounted copy (SURVEY §0); the types are pinned
as an upstream dependency of the physics driver
(/root/reference/physics/physpkg.F90:22 `use camsrfexch`). These pytrees carry
the atmosphere↔surface coupling state: fluxes and surface properties in
(cam_in), lowest-level state and precipitation out (cam_out).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CamIn:
    """Surface -> atmosphere (cam_in_t role): fluxes and surface state."""

    shf: jnp.ndarray        # sensible heat flux (W/m2)
    lhf: jnp.ndarray        # latent heat flux (W/m2)
    cflx: jnp.ndarray       # constituent surface fluxes (ncol, pcnst) kg/m2/s
    wsx: jnp.ndarray        # zonal surface stress (N/m2)
    wsy: jnp.ndarray        # meridional surface stress (N/m2)
    ts: jnp.ndarray         # surface temperature (K)
    sst: jnp.ndarray        # sea-surface temperature (K)
    landfrac: jnp.ndarray
    icefrac: jnp.ndarray
    ocnfrac: jnp.ndarray
    snowhland: jnp.ndarray  # snow depth over land (m)
    asdir: jnp.ndarray      # shortwave albedos (direct/diffuse, vis/nir)
    asdif: jnp.ndarray
    aldir: jnp.ndarray
    aldif: jnp.ndarray

    @classmethod
    def zeros(cls, ncol: int, pcnst: int, dtype=jnp.float64) -> "CamIn":
        z = jnp.zeros((ncol,), dtype)
        return cls(shf=z, lhf=z, cflx=jnp.zeros((ncol, pcnst), dtype),
                   wsx=z, wsy=z, ts=jnp.full((ncol,), 288.0, dtype),
                   sst=jnp.full((ncol,), 288.0, dtype),
                   landfrac=z, icefrac=z, ocnfrac=jnp.ones((ncol,), dtype),
                   snowhland=z, asdir=z, asdif=z, aldir=z, aldif=z)


@struct.dataclass
class CamOut:
    """Atmosphere -> surface (cam_out_t role): bottom-level state + precip
    (filled by cam_export, physpkg.F90:2933-2940)."""

    tbot: jnp.ndarray       # bottom-level temperature (K)
    zbot: jnp.ndarray       # bottom-level height (m)
    ubot: jnp.ndarray
    vbot: jnp.ndarray
    qbot: jnp.ndarray       # (ncol, pcnst)
    pbot: jnp.ndarray       # bottom mid-level pressure (Pa)
    rho: jnp.ndarray        # bottom air density (kg/m3)
    psl: jnp.ndarray        # sea-level pressure (Pa)
    precc: jnp.ndarray      # convective precip (m/s)
    precl: jnp.ndarray      # large-scale precip (m/s)
    precsc: jnp.ndarray     # convective snow (m/s)
    precsl: jnp.ndarray     # large-scale snow (m/s)
    netsw: jnp.ndarray      # net shortwave at surface (W/m2)
    flwds: jnp.ndarray      # downwelling longwave at surface (W/m2)

    @classmethod
    def zeros(cls, ncol: int, pcnst: int, dtype=jnp.float64) -> "CamOut":
        z = jnp.zeros((ncol,), dtype)
        return cls(tbot=z, zbot=z, ubot=z, vbot=z,
                   qbot=jnp.zeros((ncol, pcnst), dtype), pbot=z, rho=z,
                   psl=z, precc=z, precl=z, precsc=z, precsl=z,
                   netsw=z, flwds=z)


def cam_export(state, prec_dp, snow_dp, prec_sed=None, snow_sed=None,
               prec_pcw=None, snow_pcw=None) -> CamOut:
    """Fill cam_out from the physics state (cam_export role,
    physpkg.F90:2933; precip partitioning per cam_export in upstream CAM)."""
    from ...utils import constants as c
    ncol, pver, pcnst = state.ncol, state.pver, state.pcnst
    z = jnp.zeros_like(state.ps)
    prec_sed = z if prec_sed is None else prec_sed
    snow_sed = z if snow_sed is None else snow_sed
    prec_pcw = z if prec_pcw is None else prec_pcw
    snow_pcw = z if snow_pcw is None else snow_pcw
    tbot = state.t[:, -1]
    pbot = state.pmid[:, -1]
    rho = pbot / (c.RAIR * tbot)
    # sea-level pressure: simple isothermal-layer reduction
    psl = state.ps * jnp.exp(state.phis / (c.RAIR * tbot))
    return CamOut(
        tbot=tbot, zbot=state.zm[:, -1], ubot=state.u[:, -1],
        vbot=state.v[:, -1], qbot=state.q[:, -1, :], pbot=pbot, rho=rho,
        psl=psl,
        precc=prec_dp, precl=prec_sed + prec_pcw,
        precsc=snow_dp, precsl=snow_sed + snow_pcw,
        netsw=z, flwds=z)
