"""Saturation vapor pressure / mixing ratio (wv_saturation equivalent).

The reference's physics depends on the upstream `wv_saturation` module
(`qsat`, `qsat_water` — used at /root/reference/physics/zm_conv.F90:1729,5423-5433).
That module evaluates Goff-Gratch saturation vapor pressure through a lookup
table built at init (a scalar-CPU artifact). Here we evaluate the Goff-Gratch
formulas directly with jnp — branch-free, fully vectorized, differentiable, and
cheap on the VPU — with the same water/ice blending semantics (linear
transition over the 20 K band below freezing).

All functions are shape-polymorphic and jit-safe.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils import constants as c

TMELT = c.TMELT
EPSILO = c.EPSILO
OMEPS = 1.0 - EPSILO
TRICE = 20.0  # width (K) of the water->ice transition band below freezing


def svp_water(t):
    """Goff-Gratch (1946) saturation vapor pressure over liquid water, Pa."""
    ts = 373.16
    e = (-7.90298 * (ts / t - 1.0)
         + 5.02808 * jnp.log10(ts / t)
         - 1.3816e-7 * (10.0 ** (11.344 * (1.0 - t / ts)) - 1.0)
         + 8.1328e-3 * (10.0 ** (-3.49149 * (ts / t - 1.0)) - 1.0)
         + math.log10(1013.246))
    return 10.0 ** e * 100.0


def svp_ice(t):
    """Goff-Gratch saturation vapor pressure over ice, Pa."""
    h2otrip = 273.16
    e = (-9.09718 * (h2otrip / t - 1.0)
         - 3.56654 * jnp.log10(h2otrip / t)
         + 0.876793 * (1.0 - t / h2otrip)
         + math.log10(6.1071))
    return 10.0 ** e * 100.0


def svp_trans(t):
    """Blended svp: water above freezing, ice 20 K below, linear weight between."""
    weight = jnp.clip((TMELT - t) / TRICE, 0.0, 1.0)
    return (1.0 - weight) * svp_water(t) + weight * svp_ice(t)


def svp_to_qsat(es, p):
    """Saturation mixing ratio from svp and pressure.

    qs = epsilo*es / (p - omeps*es); if p <= es the atmosphere is all vapor
    and qs is capped at 1 (matching upstream wv_sat_svp_to_qsat semantics).
    """
    qs = EPSILO * es / (p - OMEPS * es)
    return jnp.where(p - es <= 0.0, 1.0, qs)


def qsat(t, p):
    """(es, qs) with water/ice transition blending — upstream `qsat` equivalent."""
    es = svp_trans(t)
    es = jnp.minimum(es, p)
    return es, svp_to_qsat(es, p)


def qsat_water(t, p):
    """(es, qs) over liquid water only — upstream `qsat_water` equivalent."""
    es = svp_water(t)
    es = jnp.minimum(es, p)
    return es, svp_to_qsat(es, p)


def qsat_ice(t, p):
    """(es, qs) over ice only — upstream `qsat_ice` equivalent."""
    es = svp_ice(t)
    es = jnp.minimum(es, p)
    return es, svp_to_qsat(es, p)


def qsat_hpa(t, p_hpa):
    """hPa-interface wrapper used by the ZM plume code.

    Matches /root/reference/physics/zm_conv.F90:5421-5437: pressure in comes in
    hPa, es goes out in hPa, qs is the saturation mixing ratio over water.
    """
    es, qs = qsat_water(t, p_hpa * 100.0)
    return es * 0.01, qs


def dqsdt_water(t, p):
    """d(qsat_water)/dT via the Clausius-Clapeyron-consistent analytic derivative.

    Uses des/dT from differentiating Goff-Gratch directly through jnp — here a
    cheap finite-free closed form is obtained from qs and L:
    dqs/dT ~ qs * L / (Rv T^2) * p/(p - omeps*es).  Used by evaporation code.
    """
    es, qs = qsat_water(t, p)
    hltalt = c.LATVAP
    desdt = hltalt * es / (c.RH2O * t * t)
    return qs * p * desdt / (es * (p - OMEPS * es))
