"""Single-column model mode — SCAM equivalent.

The reference treats single-column mode as the de-facto physics unit-test
harness (SURVEY §4): `single_column`/`scm_crm_mode` short-circuit the dycore
(/root/reference/physics/physpkg.F90:28, 1167, 1221-1228) and the physics is
driven by prescribed large-scale forcing (IOP soundings).

`scam_run` steps the full tphysbc/tphysac sequence on a 1..N-column state
with prescribed advective tendencies applied between physics calls — the
BFB_CAM_SCAM_IOP-style workflow, batched (many independent columns at once is
the natural TPU formulation of an IOP ensemble).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.config import PhysConfig, ZMConfig
from .coupling.camsrfexch import CamIn
from .physics.constituents import ConstituentRegistry
from .physics.physics_buffer import PhysicsBuffer, pbuf_register
from .physics.physpkg import phys_run1, phys_run2, physpkg_pbuf_specs
from .physics.state import PhysicsState


@struct.dataclass
class ScamForcing:
    """Prescribed large-scale forcing per step (IOP role): advective
    tendencies of T and q, and vertical velocity."""

    dtdt_ls: jnp.ndarray       # (ncol, pver) K/s
    dqdt_ls: jnp.ndarray       # (ncol, pver) kg/kg/s
    omega: jnp.ndarray         # (ncol, pver) Pa/s

    @classmethod
    def zeros(cls, ncol: int, pver: int, dtype=jnp.float64) -> "ScamForcing":
        z = jnp.zeros((ncol, pver), dtype)
        return cls(dtdt_ls=z, dqdt_ls=z, omega=z)


def scam_init_pbuf(ncol: int, pver: int, dtype=jnp.float64,
                   pcnst: int = 1) -> PhysicsBuffer:
    pbuf = pbuf_register(physpkg_pbuf_specs(ncol, pver, pcnst=pcnst), dtype)
    return pbuf.update(CLD=jnp.full((ncol, pver), 0.1, dtype),
                       PBLH=jnp.full((ncol,), 500.0, dtype))


def scam_step(phys_cfg: PhysConfig, zm_cfg: ZMConfig,
              registry: ConstituentRegistry, state: PhysicsState,
              pbuf: PhysicsBuffer, cam_in: CamIn, forcing: ScamForcing,
              ztodt: float, nstep: int = 0):
    """One SCAM step: large-scale forcing -> tphysbc -> tphysac.

    Returns (state, pbuf, cam_out, diags)."""
    # prescribed large-scale advective tendencies (the dycore surrogate)
    state = state.replace(
        t=state.t + ztodt * forcing.dtdt_ls,
        q=state.q.at[:, :, 0].add(ztodt * forcing.dqdt_ls),
        omega=forcing.omega)

    o1 = phys_run1(phys_cfg, zm_cfg, registry, state, pbuf, cam_in, ztodt,
                   nstep=nstep)
    o2 = phys_run2(phys_cfg, registry, o1.state, o1.pbuf, cam_in, ztodt)
    diags = dict(o1.diagnostics)
    diags.update(o2.diagnostics)
    return o2.state, o2.pbuf, o2.cam_out, diags


@struct.dataclass
class IopData:
    """Time series of IOP large-scale forcing + surface fluxes (the
    BFB_CAM_SCAM_IOP file contract, /root/reference/physics/physpkg.F90:
    1069, 1137-1141): divT/divq are the horizontal+vertical advective
    tendencies, omega the prescribed vertical velocity; shflx/lhflx the
    surface turbulent fluxes."""

    tsec: jnp.ndarray         # (ntime,) seconds
    divT: jnp.ndarray         # (ntime, pver) K/s
    divq: jnp.ndarray         # (ntime, pver) kg/kg/s
    omega: jnp.ndarray        # (ntime, pver) Pa/s
    shflx: jnp.ndarray        # (ntime,) W/m2
    lhflx: jnp.ndarray        # (ntime,) W/m2


def load_iop_netcdf(path: str, dtype=jnp.float64) -> IopData:
    """Read a SCAM IOP forcing file (NetCDF-3 classic via scipy, like the
    other table readers). Expects dims (time, lev) and variables tsec/divT/
    divq/omega (+ optional shflx/lhflx). CAM IOP files carry a unit lat/lon
    dimension on each field; trailing singleton axes are squeezed."""
    import numpy as np
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as nc:
        def get(name, default=None):
            if name not in nc.variables:
                return default
            a = np.array(nc.variables[name][:], np.float64)
            while a.ndim > 2 and a.shape[-1] == 1:
                a = a[..., 0]
            return a

        tsec = get("tsec")
        if tsec is None:
            tsec = get("time")
        divT = get("divT")
        divq = get("divq")
        omega = get("omega")
        ntime = tsec.shape[0]
        z1 = np.zeros((ntime,))
        shflx = get("shflx", z1)
        lhflx = get("lhflx", z1)
    a = lambda x: jnp.asarray(x, dtype)
    return IopData(tsec=a(tsec), divT=a(divT), divq=a(divq),
                   omega=a(omega), shflx=a(shflx.reshape(ntime)),
                   lhflx=a(lhflx.reshape(ntime)))


def save_iop_netcdf(path: str, tsec, divT, divq, omega, shflx=None,
                    lhflx=None) -> None:
    """Write an IOP forcing file (inverse of load_iop_netcdf; round-trip
    tests + synthetic-case generation)."""
    import numpy as np
    from scipy.io import netcdf_file

    divT = np.asarray(divT)
    ntime, pver = divT.shape
    with netcdf_file(path, "w") as nc:
        nc.createDimension("time", ntime)
        nc.createDimension("lev", pver)

        def var(name, dims, data, units):
            vv = nc.createVariable(name, "d", dims)
            vv[:] = np.asarray(data, np.float64)
            vv.units = units

        var("tsec", ("time",), tsec, "s")
        var("divT", ("time", "lev"), divT, "K/s")
        var("divq", ("time", "lev"), divq, "kg/kg/s")
        var("omega", ("time", "lev"), omega, "Pa/s")
        if shflx is not None:
            var("shflx", ("time",), shflx, "W/m2")
        if lhflx is not None:
            var("lhflx", ("time",), lhflx, "W/m2")


def iop_forcing_at(iop: IopData, t, ncol: int) -> ScamForcing:
    """Linear time interpolation of the IOP series to model time t,
    broadcast to ncol columns (the reference's IOP time interpolation)."""
    times = iop.tsec
    n = times.shape[0]
    t = jnp.asarray(t, times.dtype)
    cnt = jnp.sum(times <= t)
    k = jnp.clip(cnt - 1, 0, n - 2)
    lo = (jnp.arange(n) == k).astype(iop.divT.dtype)
    hi = (jnp.arange(n) == k + 1).astype(iop.divT.dtype)
    t_lo = jnp.sum(lo * times)
    t_hi = jnp.sum(hi * times)
    w = jnp.clip((t - t_lo) / jnp.where(t_hi == t_lo, 1.0, t_hi - t_lo),
                 0.0, 1.0)

    def interp(a):
        sel = lo.reshape((n,) + (1,) * (a.ndim - 1))
        sel_hi = hi.reshape((n,) + (1,) * (a.ndim - 1))
        v = jnp.sum(sel * a, axis=0) + w * (jnp.sum(sel_hi * a, axis=0) -
                                            jnp.sum(sel * a, axis=0))
        return jnp.broadcast_to(v[None], (ncol,) + v.shape)

    return ScamForcing(dtdt_ls=interp(iop.divT), dqdt_ls=interp(iop.divq),
                       omega=interp(iop.omega))


def scam_run_iop(phys_cfg: PhysConfig, zm_cfg: ZMConfig,
                 registry: ConstituentRegistry, state: PhysicsState,
                 cam_in: CamIn, iop: IopData, ztodt: float, nsteps: int):
    """Integrate single-column physics driven by an IOP forcing file: per
    step, interpolate the forcing series to model time and fold the IOP
    surface fluxes into cam_in (the scam_use_iop_srf role). Returns
    (state, pbuf, series dict)."""
    ncol = state.ncol
    pbuf = scam_init_pbuf(ncol, state.pver, state.t.dtype)
    precc, tbot = [], []
    for i in range(nsteps):
        t_mod = i * ztodt
        forcing = iop_forcing_at(iop, t_mod, ncol)
        n_lo = jnp.sum(iop.tsec <= t_mod) - 1
        k = jnp.clip(n_lo, 0, iop.tsec.shape[0] - 1)
        sel = (jnp.arange(iop.tsec.shape[0]) == k).astype(state.t.dtype)
        ci = cam_in.replace(
            shf=jnp.broadcast_to(jnp.sum(sel * iop.shflx), (ncol,)),
            lhf=jnp.broadcast_to(jnp.sum(sel * iop.lhflx), (ncol,)))
        state, pbuf, cam_out, _ = scam_step(phys_cfg, zm_cfg, registry,
                                            state, pbuf, ci, forcing, ztodt,
                                            nstep=i)
        precc.append(cam_out.precc)
        tbot.append(state.t[:, -1])
    return state, pbuf, dict(precc=jnp.stack(precc), tbot=jnp.stack(tbot))


def scam_run(phys_cfg: PhysConfig, zm_cfg: ZMConfig,
             registry: ConstituentRegistry, state: PhysicsState,
             cam_in: CamIn, forcing: ScamForcing, ztodt: float,
             nsteps: int):
    """Run nsteps of single-column physics with fixed forcing, jitted as one
    scan (the IOP integration loop)."""
    pbuf = scam_init_pbuf(state.ncol, state.pver, state.t.dtype)

    def step(carry, i):
        st, pb = carry
        st, pb, cam_out, _ = scam_step(phys_cfg, zm_cfg, registry, st, pb,
                                       cam_in, forcing, ztodt,
                                       nstep=1)
        return (st, pb), (cam_out.precc, st.t[:, -1])

    # first step without the energy fixer (no TEOUT yet)
    state, pbuf, cam_out, _ = scam_step(phys_cfg, zm_cfg, registry, state,
                                        pbuf, cam_in, forcing, ztodt,
                                        nstep=0)
    (state, pbuf), (precc, tbot) = jax.lax.scan(
        step, (state, pbuf), jnp.arange(nsteps - 1)) if nsteps > 1 else \
        ((state, pbuf), (cam_out.precc[None], state.t[None, :, -1]))
    return state, pbuf, dict(precc=precc, tbot=tbot)
