"""Hydrostatic geopotential (geopotential_t / geopotential_dse equivalents).

The reference integrates bottom-up per column with a k-loop
(/root/reference/physics/geopotential.F90:29-311). The recursion for zi is a
pure prefix sum (zi(k) depends only on levels below), so here it becomes a
reversed `jnp.cumsum` along the level axis — one fused VPU pass over
(ncol, pver) instead of pver serial steps. geopotential_dse, whose temperature
depends on zi of the level below, stays a genuine recursion and uses
`lax.scan` over levels.

Array convention: level index k=0 is the model top, k=pver-1 the surface layer
(same as the reference). Interfaces have pver+1 entries; zi[:, pver] = 0.

Hydrostatic matrix elements (LR/FV dycore branch, geopotential.F90:93-97):
    hkl = ln pint(k+1) - ln pint(k)
    hkk = 1 - pint(k) * hkl * rpdel(k)
The EUL/SE branch (hkl = pdel/pmid, hkk = hkl/2) is selectable via `dycore`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import constants as c


def _hydrostatic_elements(piln, pint, pmid, pdel, rpdel, dycore: str):
    if dycore in ("LR", "FV3"):
        hkl = piln[:, 1:] - piln[:, :-1]
        hkk = 1.0 - pint[:, :-1] * hkl * rpdel
    else:  # EUL / SE / MPAS midpoint rule
        hkl = pdel / pmid
        hkk = 0.5 * hkl
    return hkl, hkk


def geopotential_t(piln, pmln, pint, pmid, pdel, rpdel, t, q1,
                   zvir=c.ZVIR, rair=c.RAIR, gravit=c.GRAVIT,
                   dycore: str = "LR"):
    """Heights zi (ncol, pver+1), zm (ncol, pver) from T and pressures.

    Equivalent of geopotential_t (/root/reference/physics/geopotential.F90:153-311),
    LR branch. `q1` is the water vapor mixing ratio (constituent 0).
    """
    hkl, hkk = _hydrostatic_elements(piln, pint, pmid, pdel, rpdel, dycore)
    rog = rair / gravit
    tv = t * (1.0 + zvir * q1)
    dz = rog * tv * hkl                       # thickness of each layer
    # zi[k] = sum of dz over levels k..pver-1  (reversed cumulative sum)
    zi_top = jnp.flip(jnp.cumsum(jnp.flip(dz, axis=-1), axis=-1), axis=-1)
    zi = jnp.concatenate([zi_top, jnp.zeros_like(zi_top[:, :1])], axis=-1)
    zm = zi[:, 1:] + rog * tv * hkk
    return zi, zm


def geopotential_dse(piln, pmln, pint, pmid, pdel, rpdel, dse, q1, phis,
                     zvir=c.ZVIR, rair=c.RAIR, gravit=c.GRAVIT,
                     cpair=c.CPAIR, dycore: str = "LR"):
    """(t, zi, zm) from dry static energy — geopotential_dse equivalent
    (/root/reference/physics/geopotential.F90:29-150, LR branch).

    tv(k) depends on zi(k+1), which depends on tv below — a true bottom-up
    recursion, expressed as lax.scan over levels from the surface upward.
    """
    hkl, hkk = _hydrostatic_elements(piln, pint, pmid, pdel, rpdel, dycore)
    rog = rair / gravit
    tvfac = 1.0 + zvir * q1

    def step(zi_below, inputs):
        dse_k, hkl_k, hkk_k, tvfac_k = inputs
        tv = (dse_k - phis - gravit * zi_below) / (cpair / tvfac_k + rair * hkk_k)
        t_k = tv / tvfac_k
        zm_k = zi_below + rog * tv * hkk_k
        zi_k = zi_below + rog * tv * hkl_k
        return zi_k, (t_k, zm_k, zi_k)

    # scan from surface (k=pver-1) to top (k=0): feed reversed level sequence
    xs = (dse.T[::-1], hkl.T[::-1], hkk.T[::-1], tvfac.T[::-1])
    zi_sfc = jnp.zeros(dse.shape[0], dtype=dse.dtype)
    _, (t_rev, zm_rev, zi_rev) = jax.lax.scan(step, zi_sfc, xs)
    t = t_rev[::-1].T
    zm = zm_rev[::-1].T
    zi = jnp.concatenate([zi_rev[::-1].T, zi_sfc[:, None]], axis=-1)
    return t, zi, zm
