"""Tracer-mass conservation bookkeeping — check_tracers equivalent.

The reference brackets physics with `check_tracers_init` / `check_tracers_chng`
(/root/reference/physics/physpkg.F90:2719, 1993): per-tracer column masses are
recorded at step start and every subsequent check verifies the change equals
the accumulated surface fluxes (within roundoff), aborting on violation. Here
the check returns a residual diagnostic (the blow-up-sentinel policy of
SURVEY §5.3) instead of aborting.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ...utils import constants as c


@struct.dataclass
class TracerState:
    """Per-tracer column masses at the last init/chng (kg/m2)."""

    mass: jnp.ndarray          # (ncol, pcnst)


def check_tracers_init(state) -> TracerState:
    """Record per-tracer column mass (check_tracers_init)."""
    mass = jnp.sum(state.q * state.pdel[:, :, None], axis=1) / c.GRAVIT
    return TracerState(mass=mass)


def check_tracers_chng(state, tracers: TracerState, cflx=None,
                       dt: float = 0.0):
    """Verify tracer-mass change equals surface-flux input
    (check_tracers_chng). cflx: (ncol, pcnst) kg/m2/s accumulated surface
    fluxes since init. Returns (new TracerState, residual (ncol, pcnst))."""
    mass = jnp.sum(state.q * state.pdel[:, :, None], axis=1) / c.GRAVIT
    expected = tracers.mass
    if cflx is not None and dt > 0.0:
        expected = expected + cflx * dt
    resid = mass - expected
    return TracerState(mass=mass), resid
