"""Diagnostic cloud fraction — cloud_fraction (cldfrc) equivalent.

The reference uses the upstream `cloud_fraction` module (its `cldfrc_fice`
ramp is re-exported from zm_conv here); the fraction itself feeds the CLD
pbuf field that ZM evaporation consumes (zm_conv_evap's cloud-weighted
Sundqvist evaporation, zm_conv.F90:1712-1972). This provides the classic
CAM diagnostic: Sundqvist RH-based stratiform fraction with
pressure-dependent thresholds, plus a convective fraction from the updraft
mass flux, combined as overlapping areas.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.saturation import qsat

RHMIN_HIGH = 0.80      # RH threshold, p < premib (high/mid cloud)
RHMIN_LOW = 0.91       # RH threshold, low cloud
PREMIB = 750.0e2       # Pa: boundary between regimes
SH1 = 0.04             # convective-fraction coefficients (CAM cldfrc)
SH2 = 500.0


def cldfrc_sundqvist(rh, rhmin):
    """Sundqvist (1988) fraction: C = 1 - sqrt((1-RH)/(1-RHmin))."""
    x = jnp.clip((rh - rhmin) / (1.0 - rhmin), 0.0, 1.0)
    return 1.0 - jnp.sqrt(jnp.clip(1.0 - x, 0.0, 1.0))


def cldfrc(state, cmfmc=None) -> jnp.ndarray:
    """Total diagnostic cloud fraction (ncol, pver).

    RH from the state (vapor vs qsat); stratiform Sundqvist fraction with
    low/high thresholds switching at PREMIB; convective fraction
    sh1*log(1 + sh2*mc) from the interface mass flux when provided. Combined
    with random overlap: C = Cc + (1-Cc)*Cs.
    """
    _, qs = qsat(state.t, state.pmid)
    rh = jnp.clip(state.q[:, :, 0] / jnp.maximum(qs, 1.0e-12), 0.0, 1.0)
    rhmin = jnp.where(state.pmid > PREMIB, RHMIN_LOW, RHMIN_HIGH)
    c_strat = cldfrc_sundqvist(rh, rhmin)

    if cmfmc is not None:
        mc = 0.5 * (cmfmc[:, 1:] + cmfmc[:, :-1])      # to midpoints
        c_conv = jnp.clip(SH1 * jnp.log1p(SH2 * jnp.maximum(mc, 0.0)),
                          0.0, 0.8)
    else:
        c_conv = jnp.zeros_like(c_strat)
    return jnp.clip(c_conv + (1.0 - c_conv) * c_strat, 0.0, 1.0)
