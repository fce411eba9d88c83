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


def load_metdata_netcdf(path: str, coord, zvir: float | None = None,
                        dtype=None) -> MetData:
    """Read a CAM-convention meteorology file into MetData
    (the metdata module's read path, OFFLINE_DYN:
    /root/reference/fv/dyn_comp.F90:500-502, 1274-1281).

    Expects NetCDF-3 classic (scipy reader — same route as
    modal_aer_opt.load_modal_optics_netcdf) with dims (time, lev, lat, lon)
    and variables:
      time (s) | U, V, T (time, lev, lat, lon) | PS (time, lat, lon)
      Q (time, lev, lat, lon) and optionally further tracers Q2..Qn.

    Conversion to prognostic variables: delp from PS via the hybrid ak/bk;
    pt = Tv/pkz (the dycore's scaled virtual potential temperature) with
    Tv = T(1 + zvir·q)."""
    import numpy as np
    from scipy.io import netcdf_file

    from ...utils import constants as c
    zvir = c.ZVIR if zvir is None else zvir

    with netcdf_file(path, "r", mmap=False) as nc:
        times = np.array(nc.variables["time"][:], np.float64)
        u = np.array(nc.variables["U"][:], np.float64)
        v = np.array(nc.variables["V"][:], np.float64)
        t = np.array(nc.variables["T"][:], np.float64)
        ps = np.array(nc.variables["PS"][:], np.float64)
        qs = [np.array(nc.variables["Q"][:], np.float64)]
        i = 2
        while f"Q{i}" in nc.variables:
            qs.append(np.array(nc.variables[f"Q{i}"][:], np.float64))
            i += 1
    q = np.stack(qs, axis=1)                      # (ntime, nq, km, jm, im)

    ak = np.asarray(coord.ak)
    bk = np.asarray(coord.bk)
    pe = ak[None, :, None, None] + bk[None, :, None, None] * ps[:, None]
    delp = pe[:, 1:] - pe[:, :-1]
    peln = np.log(pe)
    pk = pe ** c.CAPPA
    pkz = (pk[:, 1:] - pk[:, :-1]) / (c.CAPPA * (peln[:, 1:] - peln[:, :-1]))
    tv = t * (1.0 + zvir * q[:, 0])
    pt = tv / pkz

    dt_ = dtype or jnp.float64
    a = lambda x: jnp.asarray(x, dt_)
    return MetData(times=a(times), u=a(u), v=a(v), pt=a(pt), delp=a(delp),
                   q=a(q))


def save_metdata_netcdf(path: str, times, u, v, t, ps, q_list) -> None:
    """Write a CAM-convention met file (the inverse of load_metdata_netcdf;
    used by the round-trip tests and for exporting nudging datasets).
    u/v/t: (ntime, km, jm, im); ps: (ntime, jm, im); q_list: list of
    (ntime, km, jm, im) mixing ratios (Q, Q2, ...)."""
    import numpy as np
    from scipy.io import netcdf_file

    u = np.asarray(u)
    ntime, km, jm, im = u.shape
    with netcdf_file(path, "w") as nc:
        nc.createDimension("time", ntime)
        nc.createDimension("lev", km)
        nc.createDimension("lat", jm)
        nc.createDimension("lon", im)

        def var(name, dims, data, units):
            vv = nc.createVariable(name, "d", dims)
            vv[:] = np.asarray(data, np.float64)
            vv.units = units

        var("time", ("time",), times, "s")
        var("U", ("time", "lev", "lat", "lon"), u, "m/s")
        var("V", ("time", "lev", "lat", "lon"), v, "m/s")
        var("T", ("time", "lev", "lat", "lon"), t, "K")
        var("PS", ("time", "lat", "lon"), ps, "Pa")
        for i, qi in enumerate(q_list):
            name = "Q" if i == 0 else f"Q{i + 1}"
            var(name, ("time", "lev", "lat", "lon"), qi, "kg/kg")


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
