"""Prescribed-meteorology (offline dynamics) mode — metdata equivalent.

The reference's OFFLINE_DYN build (#ifdef in /root/reference/fv/dyn_comp.F90:
500-502, 1274-1281) replaces the computed dynamics with meteorology read from
files (`metdata`), so the physics can be driven/tested against prescribed
winds and temperature (SURVEY §4: the de-facto physics test harness alongside
SCAM).

TPU-native: a `MetData` holds a time series of dycore fields; `met_state_at`
linearly interpolates in time (jit-safe: time index arithmetic is static
per-call); `offline_dyn_run` either overwrites the dynamical fields entirely
(met_rlx -> inf) or linearly relaxes toward them (the reference's met_rlx
nudging knob in upstream metdata).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .cd_core import DynState


@struct.dataclass
class MetData:
    """Time series of prescribed meteorology on the model grid.

    Arrays are (ntime, km, jm, im) for u, v, pt, delp and
    (ntime, nq, km, jm, im) for q; times (ntime,) in seconds.
    """

    times: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    pt: jnp.ndarray
    delp: jnp.ndarray
    q: jnp.ndarray


def met_state_at(met: MetData, t: float) -> DynState:
    """Linear time interpolation of the prescribed fields to model time t
    (metdata's interpolation role). Clamps outside the record."""
    times = met.times
    n = times.shape[0]
    t = jnp.asarray(t, times.dtype)
    cnt = jnp.sum(times <= t)
    k = jnp.clip(cnt - 1, 0, n - 2)
    onehot_lo = (jnp.arange(n) == k).astype(met.u.dtype)
    onehot_hi = (jnp.arange(n) == k + 1).astype(met.u.dtype)

    t_lo = jnp.sum(onehot_lo * times)
    t_hi = jnp.sum(onehot_hi * times)
    w = jnp.clip((t - t_lo) / jnp.where(t_hi == t_lo, 1.0, t_hi - t_lo),
                 0.0, 1.0)

    def interp(a):
        sel = onehot_lo.reshape((n,) + (1,) * (a.ndim - 1))
        sel_hi = onehot_hi.reshape((n,) + (1,) * (a.ndim - 1))
        lo = jnp.sum(sel * a, axis=0)
        hi = jnp.sum(sel_hi * a, axis=0)
        return lo + w * (hi - lo)

    return DynState(u=interp(met.u), v=interp(met.v), pt=interp(met.pt),
                    delp=interp(met.delp), q=interp(met.q))


def offline_dyn_run(state: DynState, met: MetData, t: float, ndt: float,
                    met_rlx: float = 0.0) -> DynState:
    """Offline replacement for dyn_run (OFFLINE_DYN branch role,
    dyn_comp.F90:1274-1281): advance to the prescribed meteorology at time
    t+ndt. met_rlx in [0, 1]: 1 = fully overwrite winds/thermo (classic
    offline mode), otherwise linear relaxation toward the met fields.
    Tracers stay prognostic (they are what offline mode transports)."""
    tgt = met_state_at(met, t + ndt)
    a = 1.0 if met_rlx == 0.0 else met_rlx

    def mix(cur, new):
        return cur + a * (new - cur)

    return state.replace(u=mix(state.u, tgt.u), v=mix(state.v, tgt.v),
                         pt=mix(state.pt, tgt.pt),
                         delp=mix(state.delp, tgt.delp))
