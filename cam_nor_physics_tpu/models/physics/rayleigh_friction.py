"""Rayleigh friction — rayleigh_friction_tend equivalent.

The reference calls upstream `rayleigh_friction_tend` from tphysac
(/root/reference/physics/physpkg.F90:2177-2185): linear drag on the winds in
the top model layers (sponge for resolved waves near the model top), with the
frictional kinetic-energy loss returned as heating (energy-conserving).

CAM's profile: k_f(k) = rayk0-centered hyperbolic-tangent ramp over the top
levels with e-folding time raytau0 (days). Column-local, trivially batched.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils import constants as c


def rayleigh_friction_tend(state, ztodt: float, rayk0: int = 2,
                           raykrange: float = 0.0, raytau0: float = 5.0):
    """(dudt, dvdt, dsdt) from linear top-of-model drag.

    rayk0: center level of the ramp (0-based from the top); raykrange: ramp
    width in levels (0 -> derived as rayk0/2 like CAM); raytau0: e-folding
    time at the top (days). raytau0 <= 0 disables (the reference's default
    when the namelist is absent).
    """
    ncol, pver = state.u.shape
    if raytau0 <= 0.0:
        z = jnp.zeros_like(state.u)
        return z, z, z

    krange = raykrange if raykrange > 0 else max(rayk0 / 2.0, 1.0)
    k = jnp.arange(pver, dtype=state.u.dtype)
    # CAM's profile: f = 1/(2 tau0) (1 + tanh((rayk0 - k)/krange)), 1/s
    tau0_s = raytau0 * 86400.0
    kf = (1.0 / (2.0 * tau0_s)) * (1.0 + jnp.tanh((rayk0 - k) / krange))

    # implicit-in-time linear drag: u_new = u/(1 + kf dt)
    fac = (1.0 / (1.0 + kf * ztodt) - 1.0) / ztodt      # (pver,) 1/s
    dudt = state.u * fac[None, :]
    dvdt = state.v * fac[None, :]
    # frictional heating closes the KE budget
    u_new = state.u + dudt * ztodt
    v_new = state.v + dvdt * ztodt
    dsdt = -0.5 * ((u_new ** 2 + v_new ** 2) -
                   (state.u ** 2 + state.v ** 2)) / ztodt
    return dudt, dvdt, dsdt
