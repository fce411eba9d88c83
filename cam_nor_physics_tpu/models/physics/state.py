"""Physics data model: state, tendency, and per-parameterization tendencies.

TPU-native equivalent of /root/reference/physics/physics_types.F90 (2483 lines):
  - `physics_state` (:62-121)  -> PhysicsState pytree of (ncol, ...) arrays
  - `physics_tend`  (:124-133) -> PhysicsTend
  - `physics_ptend` (:137-173) -> PhysicsPtend with ls/lu/lv/lq activation flags
  - `physics_update` (:210-497), `physics_ptend_sum` (:698+), scale/init,
    `set_state_pdry` (:1925), `set_wet_to_dry`/`set_dry_to_wet` (:1968/1988),
    `physics_dme_adjust` (:1213+), `physics_state_check` (:501).

Design: the reference mutates chunked Fortran derived types under OpenMP; here
states are immutable pytrees over the full chip-local column batch, updates are
pure functions, and chunks/pcols/OMP disappear (SURVEY §7.1.2 — physics is
embarrassingly column-parallel, so the batch dimension is simply `ncol`).
Activation flags (ls/lu/lv/lq) are *static* pytree metadata so jit specializes
and dead branches cost nothing.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ...ops.geopotential import geopotential_t
from ...utils import constants as c
from .constituents import ConstituentRegistry


@struct.dataclass
class PhysicsState:
    """Column-batched physics state (physics_state equivalent).

    Shapes: (ncol,) for surface fields, (ncol, pver) midpoints,
    (ncol, pver+1) interfaces, (ncol, pver, pcnst) tracers.
    Level k=0 is the model top.
    """

    ps: jnp.ndarray            # surface pressure (Pa)
    phis: jnp.ndarray          # surface geopotential (m2/s2)
    t: jnp.ndarray             # temperature (K)
    u: jnp.ndarray             # zonal wind (m/s)
    v: jnp.ndarray             # meridional wind (m/s)
    s: jnp.ndarray             # dry static energy (J/kg)
    omega: jnp.ndarray         # vertical pressure velocity (Pa/s)
    pmid: jnp.ndarray          # midpoint pressure (Pa)
    pdel: jnp.ndarray          # layer thickness (Pa)
    rpdel: jnp.ndarray         # 1/pdel
    lnpmid: jnp.ndarray        # ln(pmid)
    pint: jnp.ndarray          # interface pressure (Pa)
    lnpint: jnp.ndarray        # ln(pint)
    q: jnp.ndarray             # constituent mixing ratios (kg/kg)
    zi: jnp.ndarray            # interface height above surface (m)
    zm: jnp.ndarray            # midpoint height above surface (m)
    # dry-pressure companion set (set_state_pdry, physics_types.F90:1925-1961)
    psdry: jnp.ndarray
    pmiddry: jnp.ndarray
    pdeldry: jnp.ndarray
    rpdeldry: jnp.ndarray
    lnpmiddry: jnp.ndarray
    pintdry: jnp.ndarray
    lnpintdry: jnp.ndarray
    # energy/water bookkeeping (te/tw, physics_types.F90:104-110)
    te_ini: jnp.ndarray
    te_cur: jnp.ndarray
    tw_ini: jnp.ndarray
    tw_cur: jnp.ndarray
    # grid metadata
    lat: jnp.ndarray           # column latitude (radians)
    lon: jnp.ndarray           # column longitude (radians)

    @property
    def ncol(self) -> int:
        return self.t.shape[0]

    @property
    def pver(self) -> int:
        return self.t.shape[1]

    @property
    def pcnst(self) -> int:
        return self.q.shape[2]

    @property
    def exner(self):
        """Exner function pint_sfc^kappa / pmid^kappa-style ratio used by physics."""
        return (self.pint[:, -1:] / self.pmid) ** c.CAPPA


@struct.dataclass
class PhysicsTend:
    """Accumulated physics tendencies over a timestep (physics_tend equivalent)."""

    dtdt: jnp.ndarray
    dudt: jnp.ndarray
    dvdt: jnp.ndarray
    flx_net: jnp.ndarray
    te_tnd: jnp.ndarray
    tw_tnd: jnp.ndarray

    @classmethod
    def zeros(cls, ncol: int, pver: int, dtype=jnp.float64) -> "PhysicsTend":
        z2 = jnp.zeros((ncol, pver), dtype=dtype)
        z1 = jnp.zeros((ncol,), dtype=dtype)
        return cls(dtdt=z2, dudt=z2, dvdt=z2, flx_net=z1, te_tnd=z1, tw_tnd=z1)


@struct.dataclass
class PhysicsPtend:
    """Single-parameterization tendencies (physics_ptend equivalent).

    `ls/lu/lv` and per-tracer `lq` are static metadata (pytree aux data): jit
    compiles away inactive branches, mirroring the reference's flag checks
    (physics_types.F90:293-340,425-448). top/bot levels bound the update range.
    """

    s: jnp.ndarray             # heating rate (J/kg/s)
    u: jnp.ndarray
    v: jnp.ndarray
    q: jnp.ndarray             # (ncol, pver, pcnst)
    # boundary fluxes (physics_types.F90:158-170)
    hflux_srf: jnp.ndarray
    hflux_top: jnp.ndarray
    taux_srf: jnp.ndarray
    taux_top: jnp.ndarray
    tauy_srf: jnp.ndarray
    tauy_top: jnp.ndarray
    cflx_srf: jnp.ndarray      # (ncol, pcnst)
    cflx_top: jnp.ndarray
    name: str = struct.field(pytree_node=False, default="none")
    ls: bool = struct.field(pytree_node=False, default=False)
    lu: bool = struct.field(pytree_node=False, default=False)
    lv: bool = struct.field(pytree_node=False, default=False)
    lq: tuple = struct.field(pytree_node=False, default=())
    top_level: int = struct.field(pytree_node=False, default=0)
    bot_level: int = struct.field(pytree_node=False, default=-1)

    @property
    def any_active(self) -> bool:
        return self.ls or self.lu or self.lv or any(self.lq)


def ptend_init(name: str, ncol: int, pver: int, pcnst: int,
               ls=False, lu=False, lv=False, lq=None,
               dtype=jnp.float64) -> PhysicsPtend:
    """physics_ptend_init equivalent (physics_types.F90:1000-1063)."""
    if lq is None:
        lq = (False,) * pcnst
    z2 = jnp.zeros((ncol, pver), dtype=dtype)
    z1 = jnp.zeros((ncol,), dtype=dtype)
    zq = jnp.zeros((ncol, pver, pcnst), dtype=dtype)
    zc = jnp.zeros((ncol, pcnst), dtype=dtype)
    return PhysicsPtend(s=z2, u=z2, v=z2, q=zq,
                        hflux_srf=z1, hflux_top=z1, taux_srf=z1, taux_top=z1,
                        tauy_srf=z1, tauy_top=z1, cflx_srf=zc, cflx_top=zc,
                        name=name, ls=ls, lu=lu, lv=lv, lq=tuple(lq),
                        top_level=0, bot_level=pver - 1)


def ptend_sum(a: PhysicsPtend, b: PhysicsPtend, name: str | None = None) -> PhysicsPtend:
    """physics_ptend_sum equivalent (physics_types.F90:698-860): a + b."""
    lq = tuple(x or y for x, y in zip(a.lq, b.lq))
    return PhysicsPtend(
        s=a.s + b.s if (a.ls and b.ls) else (b.s if b.ls else a.s),
        u=a.u + b.u if (a.lu and b.lu) else (b.u if b.lu else a.u),
        v=a.v + b.v if (a.lv and b.lv) else (b.v if b.lv else a.v),
        q=a.q + b.q,
        hflux_srf=a.hflux_srf + b.hflux_srf,
        hflux_top=a.hflux_top + b.hflux_top,
        taux_srf=a.taux_srf + b.taux_srf, taux_top=a.taux_top + b.taux_top,
        tauy_srf=a.tauy_srf + b.tauy_srf, tauy_top=a.tauy_top + b.tauy_top,
        cflx_srf=a.cflx_srf + b.cflx_srf, cflx_top=a.cflx_top + b.cflx_top,
        name=name or f"{a.name}+{b.name}",
        ls=a.ls or b.ls, lu=a.lu or b.lu, lv=a.lv or b.lv, lq=lq,
        top_level=min(a.top_level, b.top_level),
        bot_level=max(a.bot_level, b.bot_level))


def ptend_scale(p: PhysicsPtend, fac) -> PhysicsPtend:
    """physics_ptend_scale equivalent (physics_types.F90:900-963)."""
    return p.replace(s=p.s * fac, u=p.u * fac, v=p.v * fac, q=p.q * fac,
                     hflux_srf=p.hflux_srf * fac, hflux_top=p.hflux_top * fac,
                     taux_srf=p.taux_srf * fac, taux_top=p.taux_top * fac,
                     tauy_srf=p.tauy_srf * fac, tauy_top=p.tauy_top * fac,
                     cflx_srf=p.cflx_srf * fac, cflx_top=p.cflx_top * fac)


def _level_mask(pver: int, top: int, bot: int, dtype) -> jnp.ndarray:
    """1.0 on levels [top, bot] inclusive (top_level/bot_level semantics)."""
    k = jnp.arange(pver)
    return ((k >= top) & (k <= (bot % pver))).astype(dtype)


def refresh_dse(state: PhysicsState) -> PhysicsState:
    """Recompute zi/zm and dry static energy from the current t/q
    (the tail of physics_update, physics_types.F90:452-467)."""
    zi, zm = geopotential_t(state.lnpint, state.lnpmid, state.pint,
                            state.pmid, state.pdel, state.rpdel,
                            state.t, state.q[:, :, 0])
    s = state.t * c.CPAIR + c.GRAVIT * zm + state.phis[:, None]
    return state.replace(zi=zi, zm=zm, s=s)


def physics_update(state: PhysicsState, ptend: PhysicsPtend, dt: float,
                   registry: ConstituentRegistry,
                   tend: PhysicsTend | None = None,
                   refresh: bool = True,
                   ) -> tuple[PhysicsState, PhysicsTend | None]:
    """Apply parameterization tendencies to the state (physics_update equivalent,
    /root/reference/physics/physics_types.F90:210-497).

    Order preserved from the reference: u, v -> q (+ qneg3 clamps, number-conc
    clamps, cldliq/ice min-nz for deep-convection ptends) -> t from s ->
    geopotential & dry-static-energy refresh when heat/moisture changed.
    """
    if not ptend.any_active:
        return state, tend

    ncol, pver, pcnst = state.ncol, state.pver, state.pcnst
    mask = _level_mask(pver, ptend.top_level, ptend.bot_level, state.t.dtype)[None, :]

    u, v, t, q = state.u, state.v, state.t, state.q
    if ptend.lu:
        u = u + ptend.u * dt * mask
        if tend is not None:
            tend = tend.replace(dudt=tend.dudt + ptend.u * mask)
    if ptend.lv:
        v = v + ptend.v * dt * mask
        if tend is not None:
            tend = tend.replace(dvdt=tend.dvdt + ptend.v * mask)

    ixnum = {registry.index(n) for n in ("NUMICE", "NUMLIQ", "NUMRAI", "NUMSNO")}
    cols = []
    for m in range(pcnst):
        qm = q[:, :, m]
        if ptend.lq[m]:
            qm = qm + ptend.q[:, :, m] * dt * mask
            if m in ixnum:
                # number concentrations: clamp to [1e-12, 1e10] (:331-335)
                qm = jnp.clip(qm, 1.0e-12, 1.0e10)
            else:
                # qneg3 repair: reset below-minimum values to qmin (:329);
                # scalar literal, NOT registry.qmin_array — an embedded
                # array constant disables the axon fast execution path
                qm = jnp.maximum(qm, float(registry.constituents[m].qmin))
                if m == 0:
                    # physical ceiling for vapor (guard-rail family): no
                    # atmosphere holds >0.1 kg/kg; values beyond it are
                    # numerical blow-up precursors
                    qm = jnp.minimum(qm, 0.1)
        cols.append(qm)
    q = jnp.stack(cols, axis=-1)

    # cldliq/cldice minimum-nonzero enforcement for deep-convection updates
    # (state_cnst_min_nz, physics_types.F90:359-381,469-494)
    if ptend.name in ("convect_deep", "zm_conv_tend"):
        for cname, nname in (("CLDLIQ", "NUMLIQ"), ("CLDICE", "NUMICE")):
            ix = registry.index(cname)
            if ix > 0 and ptend.lq[ix]:
                small = q[:, :, ix] < 1.0e-36
                q = q.at[:, :, ix].set(jnp.where(small, 0.0, q[:, :, ix]))
                nix = registry.index(nname)
                if nix > 0:
                    q = q.at[:, :, nix].set(jnp.where(small, 0.0, q[:, :, nix]))

    if ptend.ls:
        t = t + ptend.s * dt / c.CPAIR * mask
        if tend is not None:
            tend = tend.replace(dtdt=tend.dtdt + ptend.s / c.CPAIR * mask)

    state = state.replace(u=u, v=v, t=t, q=q)

    # refresh geopotential + dry static energy when heating or moisture
    # changed. `refresh=False` lets a driver that applies several ptends
    # back-to-back defer this to a single final refresh_dse() — valid
    # whenever no intermediate consumer reads zi/zm/s.
    if refresh and (ptend.ls or (len(ptend.lq) > 0 and ptend.lq[0])):
        state = refresh_dse(state)

    return state, tend


def set_state_pdry(state: PhysicsState) -> PhysicsState:
    """Derive the dry-pressure companion fields (set_state_pdry equivalent,
    physics_types.F90:1925-1961): pdeldry = pdel*(1 - qv)."""
    pdeldry = state.pdel * (1.0 - state.q[:, :, 0])
    pintdry_top = state.pint[:, :1]
    pintdry = jnp.concatenate(
        [pintdry_top, pintdry_top + jnp.cumsum(pdeldry, axis=-1)], axis=-1)
    psdry = pintdry[:, -1]
    pmiddry = 0.5 * (pintdry[:, 1:] + pintdry[:, :-1])
    return state.replace(
        pdeldry=pdeldry, rpdeldry=1.0 / pdeldry, pintdry=pintdry,
        psdry=psdry, pmiddry=pmiddry, lnpmiddry=jnp.log(pmiddry),
        lnpintdry=jnp.log(pintdry))


def set_wet_to_dry(state: PhysicsState, registry: ConstituentRegistry) -> PhysicsState:
    """Convert DRY-type constituents from the (moist) dycore's wet mixing
    ratio basis to their declared dry basis (set_wet_to_dry equivalent,
    physics_types.F90:1968-1985 — the reference loops constituents with
    cnst_type == 'dry'; wet-type ones, including water vapor, stay wet)."""
    fac = (state.pdel / state.pdeldry)[:, :, None]
    dry = jnp.array([cn.mixtype == "dry" for cn in registry.constituents])
    return state.replace(q=jnp.where(dry[None, None, :], state.q * fac, state.q))


def set_dry_to_wet(state: PhysicsState, registry: ConstituentRegistry) -> PhysicsState:
    """Inverse of set_wet_to_dry (physics_types.F90:1988-2005): dry-type
    constituents back to the dycore's wet basis."""
    fac = (state.pdeldry / state.pdel)[:, :, None]
    dry = jnp.array([cn.mixtype == "dry" for cn in registry.constituents])
    return state.replace(q=jnp.where(dry[None, None, :], state.q * fac, state.q))


def physics_dme_adjust(state: PhysicsState, qini, registry: ConstituentRegistry,
                       variant: str = "tht") -> PhysicsState:
    """Dry-mass/energy adjustment after physics (physics_dme_adjust,
    /root/reference/physics/physics_types.F90:1213-1794).

    The FV ("LR") dycore is moist: water-vapor changes from physics must
    change layer mass. Per-layer factor fdq = 1 + (qv - qini) scales pdel;
    wet constituents are rescaled to conserve their mass; pressure fields are
    rebuilt. variant="tht" additionally applies a uniform column temperature
    correction restoring total (cp·T + K + L·qv) energy — the reference's
    energy-conserving `_THT` dispatch (:1413-1794); variant="bab" skips it
    (:1265).  qini: vapor mixing ratio (wet) at the start of physics.
    """
    qv = state.q[:, :, 0]
    fdq = 1.0 + qv - qini
    pdel_new = state.pdel * fdq
    wet = jnp.array([cn.mixtype == "wet" for cn in registry.constituents])
    q_new = jnp.where(wet[None, None, :], state.q / fdq[:, :, None], state.q)

    pint_top = state.pint[:, :1]
    pint_new = jnp.concatenate(
        [pint_top, pint_top + jnp.cumsum(pdel_new, axis=-1)], axis=-1)
    ps_new = pint_new[:, -1]
    lnpint_new = jnp.log(pint_new)
    pmid_new = pdel_new / (lnpint_new[:, 1:] - lnpint_new[:, :-1])

    t_new = state.t
    if variant == "tht":
        # uniform additive T correction closing the column moist static
        # energy budget across the mass adjustment
        e0 = jnp.sum(state.pdel * (c.CPAIR * state.t +
                                   (c.LATVAP + c.LATICE) * qv), axis=-1)
        e1 = jnp.sum(pdel_new * (c.CPAIR * t_new +
                                 (c.LATVAP + c.LATICE) * q_new[:, :, 0]),
                     axis=-1)
        corr = (e0 - e1) / (c.CPAIR * jnp.sum(pdel_new, axis=-1))
        t_new = t_new + corr[:, None]

    state = state.replace(
        t=t_new, q=q_new, ps=ps_new, pint=pint_new, lnpint=lnpint_new,
        pdel=pdel_new, rpdel=1.0 / pdel_new, pmid=pmid_new,
        lnpmid=jnp.log(pmid_new))
    zi, zm = geopotential_t(state.lnpint, state.lnpmid, state.pint,
                            state.pmid, state.pdel, state.rpdel,
                            state.t, state.q[:, :, 0])
    s = state.t * c.CPAIR + c.GRAVIT * zm + state.phis[:, None]
    return state.replace(zi=zi, zm=zm, s=s)


def physics_state_check(state: PhysicsState, name: str = "") -> dict[str, Any]:
    """Finite/range validation (physics_state_check equivalent,
    physics_types.F90:501-694). Returns a dict of boolean scalars; callers can
    assert on host or feed blow-up sentinels — no process abort inside jit."""
    checks = {
        "t_finite": jnp.all(jnp.isfinite(state.t)),
        "t_range": jnp.all((state.t > 0.0) & (state.t < 1000.0)),
        "u_finite": jnp.all(jnp.isfinite(state.u)),
        "v_finite": jnp.all(jnp.isfinite(state.v)),
        "q_finite": jnp.all(jnp.isfinite(state.q)),
        "ps_range": jnp.all((state.ps > 1.0) & (state.ps < 2.0e5)),
        "pdel_pos": jnp.all(state.pdel > 0.0),
    }
    checks["ok"] = jnp.array(True)
    for k, v in list(checks.items()):
        if k != "ok":
            checks["ok"] = checks["ok"] & v
    return checks


def make_state_from_profiles(pint, t, u, v, q, phis, lat=None, lon=None,
                             omega=None) -> PhysicsState:
    """Build a hydrostatically consistent PhysicsState from interface pressures
    and midpoint profiles. Convenience constructor for tests / SCAM-style runs
    (the reference's single-column mode, physpkg.F90:28)."""
    ncol, pver = t.shape
    dtype = t.dtype
    pdel = pint[:, 1:] - pint[:, :-1]
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    lnpmid = jnp.log(pmid)
    lnpint = jnp.log(pint)
    rpdel = 1.0 / pdel
    ps = pint[:, -1]
    if omega is None:
        omega = jnp.zeros_like(t)
    zi, zm = geopotential_t(lnpint, lnpmid, pint, pmid, pdel, rpdel,
                            t, q[:, :, 0])
    s = t * c.CPAIR + c.GRAVIT * zm + phis[:, None]
    z1 = jnp.zeros((ncol,), dtype=dtype)
    state = PhysicsState(
        ps=ps, phis=phis, t=t, u=u, v=v, s=s, omega=omega,
        pmid=pmid, pdel=pdel, rpdel=rpdel, lnpmid=lnpmid,
        pint=pint, lnpint=lnpint, q=q, zi=zi, zm=zm,
        psdry=ps, pmiddry=pmid, pdeldry=pdel, rpdeldry=rpdel,
        lnpmiddry=lnpmid, pintdry=pint, lnpintdry=lnpint,
        te_ini=z1, te_cur=z1, tw_ini=z1, tw_cur=z1,
        lat=lat if lat is not None else z1,
        lon=lon if lon is not None else z1)
    return set_state_pdry(state)
