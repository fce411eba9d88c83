"""Dynamics ↔ physics coupling — d_p_coupling / p_d_coupling equivalents.

Re-implementation of /root/reference/fv/dp_coupling.F90 (960 lines), TPU-first:
the reference's block↔chunk MPI transposes (dp_coupling.F90:403-534, 815-913)
and `local_dp_map` index copies have NO equivalent here — physics uses the
dycore's resident (y, x)-sharded layout directly, with columns flattened to a
batch axis (SURVEY §2.3 P4: physics is embarrassingly column-parallel, so the
chip-local block IS the chunk).

d_p_coupling (dp_coupling.F90:71-671):
  - D-grid staggered winds -> A-grid (d2a3dikj role, :269)
  - t = pt·pkz/(1+zvir·q1)  (:366-370 — pt is scaled virt. pot. temp)
  - derived pressure fields pdel/rpdel/pmid/lnpmid (:552-559)
  - bottom-layer negative-tracer borrow fix (:561-591)
  - geopotential (zi/zm) + dry static energy s (:617-629)
  - dry-pressure companion set + wet->dry conversion (:634-635)
  - qneg3 repair (:642-649), check_energy_timestep_init (:655)

p_d_coupling (dp_coupling.F90:679-958):
  - T -> pt update (:916-923)
  - A-grid wind tendencies -> D-grid staggered update with dt5 = dt/2
    (uv3s_update role, :928-936)
  - pressure-field re-derivation from new delp (p_d_adjust role, :944-955)
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.fill import qneg3
from ...ops.geopotential import geopotential_t
from ...ops.tp_core import _rolly, wset_row
from ...utils import constants as c
from ..fv.cd_core import DynState, d2a_winds, pressure_vars
from ..fv.grid import FVGrid
from ..physics.check_energy import check_energy_timestep_init
from ..physics.constituents import ConstituentRegistry
from ..physics.state import (PhysicsState, set_state_pdry, set_wet_to_dry)


def _to_cols(a):
    """(… , km, jm, im) -> (jm*im, km); surface (jm, im) -> (jm*im,)."""
    if a.ndim == 2:
        return a.reshape(-1)
    km = a.shape[-3]
    return jnp.moveaxis(a.reshape(a.shape[:-2] + (-1,)), -2, -1)


def _from_cols(a, jm, im):
    """(ncol, km) -> (km, jm, im); (ncol,) -> (jm, im)."""
    if a.ndim == 1:
        return a.reshape(jm, im)
    return jnp.moveaxis(a, -1, -2).reshape(a.shape[:-2] + (a.shape[-1], jm, im))


def d_p_coupling(state: DynState, grid: FVGrid, phis, ptop: float,
                 registry: ConstituentRegistry, omega=None) -> PhysicsState:
    """Dycore export -> physics state (d_p_coupling, dp_coupling.F90:71-671).

    Returns a PhysicsState with ncol = jm*im columns (row-major over the
    resident sharding, so the column batch stays chip-local).
    """
    jm, im = grid.jm, grid.im
    pe, pk, pkz, peln = pressure_vars(state.delp, ptop)

    # D -> A winds (d2a3dikj role)
    ua, va = d2a_winds(state.u, state.v)

    # temperature from scaled virtual potential temperature
    qv = state.q[0]
    t3 = state.pt * pkz / (1.0 + c.ZVIR * qv)

    # derived pressure fields; pmid is the FV log-mean (pdel / Δln p)
    pdel = state.delp
    pmid = pdel / (peln[1:] - peln[:-1])

    # flatten to columns
    ps = _to_cols(pe[-1])
    pint = _to_cols(pe)
    lnpint = _to_cols(peln)
    pmid_c = _to_cols(pmid)
    pdel_c = _to_cols(pdel)
    t_c = _to_cols(t3)
    u_c = _to_cols(ua)
    v_c = _to_cols(va)
    q_c = jnp.moveaxis(
        _to_cols(state.q), 0, -1)               # (ncol, km, nq)
    phis_c = _to_cols(phis)
    omega_c = _to_cols(omega) if omega is not None else jnp.zeros_like(t_c)

    # bottom-layer negative-tracer borrow fix (dp_coupling.F90:561-591):
    # borrow from the layer above where the surface layer went negative
    qbot = q_c[:, -1, :]
    qnxt = q_c[:, -2, :]
    ratio = (pdel_c[:, -1] / pdel_c[:, -2])[:, None]
    need = qbot < 0.0
    q_c = q_c.at[:, -2, :].set(
        jnp.where(need, qnxt + qbot * ratio, qnxt))
    q_c = q_c.at[:, -1, :].set(jnp.where(need, 0.0, qbot))

    lnpmid = jnp.log(pmid_c)
    rpdel = 1.0 / pdel_c

    zi, zm = geopotential_t(lnpint, lnpmid, pint, pmid_c, pdel_c, rpdel,
                            t_c, q_c[:, :, 0])
    s = t_c * c.CPAIR + c.GRAVIT * zm + phis_c[:, None]

    lats = jnp.broadcast_to(
        jnp.asarray(grid.lats)[:, None], (jm, im)).reshape(-1)
    lons = jnp.broadcast_to(
        jnp.asarray(grid.lons)[None, :], (jm, im)).reshape(-1)

    z1 = jnp.zeros_like(ps)
    pstate = PhysicsState(
        ps=ps, phis=phis_c, t=t_c, u=u_c, v=v_c, s=s, omega=omega_c,
        pmid=pmid_c, pdel=pdel_c, rpdel=rpdel, lnpmid=lnpmid,
        pint=pint, lnpint=lnpint, q=q_c, zi=zi, zm=zm,
        psdry=ps, pmiddry=pmid_c, pdeldry=pdel_c, rpdeldry=rpdel,
        lnpmiddry=lnpmid, pintdry=pint, lnpintdry=lnpint,
        te_ini=z1, te_cur=z1, tw_ini=z1, tw_cur=z1, lat=lats, lon=lons)

    pstate = set_state_pdry(pstate)                       # (:634)
    pstate = set_wet_to_dry(pstate, registry)             # (:635)
    # qneg3 repair on all tracers (:642-649)
    qmin = jnp.asarray(registry.qmin_array(), pstate.q.dtype)
    q_fixed, _, _ = qneg3(pstate.q, qmin[None, None, :])
    pstate = pstate.replace(q=q_fixed)
    return check_energy_timestep_init(pstate, registry)   # (:655)


def gws_src_fnct(ua, va, t3, pmid, grid: FVGrid):
    """Frontogenesis function and angle for the gravity-wave frontal source
    (gws_src_fnct role, /root/reference/fv/dp_coupling.F90:313-316; consumed
    via the FRONTGF/FRONTGA pbuf fields registered at dyn_comp.F90:469-474).

    The kinematic 2-D frontogenesis function on the A grid (Charron &
    Manzini 2002, the formulation CAM's gw_front uses):

        F = -[ (θx)²·ux + θxθy·(vx + uy) + (θy)²·vy ]

    with spherical-metric derivatives; frontga is the gradient angle
    atan2(θy, θx). Pole rows are zeroed (no unique direction on the cap).
    Inputs (km, jm, im) cell-centered; returns (frontgf, frontga).
    """
    cosp = jnp.asarray(grid.cosp)
    safe_cosp = jnp.where(cosp > 0, cosp, 1.0)[:, None]
    rdx = 1.0 / (2.0 * c.REARTH * safe_cosp * grid.dl)
    rdy = 1.0 / (2.0 * c.REARTH * grid.dp)

    theta = t3 * (1.0e5 / pmid) ** c.CAPPA

    def ddx(a):
        return (jnp.roll(a, -1, axis=-1) - jnp.roll(a, 1, axis=-1)) * rdx

    def ddy(a):
        # centered in the interior; pole rows zeroed below
        return (_rolly(a, -1) - _rolly(a, 1)) * rdy

    tx, ty = ddx(theta), ddy(theta)
    ux, uy = ddx(ua), ddy(ua)
    vx, vy = ddx(va), ddy(va)
    frontgf = -(tx * tx * ux + tx * ty * (vx + uy) + ty * ty * vy)
    frontga = jnp.arctan2(ty, tx + jnp.where(tx == 0.0, 1e-30, 0.0))
    for row in (0, -1):
        frontgf = wset_row(frontgf, row, 0.0)
        frontga = wset_row(frontga, row, 0.0)
    return frontgf, frontga


def zonal_mean_3d(a):
    """Zonal mean of a (km, jm, im) field broadcast back over x
    (zonal_mean_3D role, dp_coupling.F90:318-320 — the QBO forcing's UZM).
    Chip-local when x is unsharded; lowers to a psum otherwise."""
    return jnp.broadcast_to(jnp.mean(a, axis=-1, keepdims=True), a.shape)


def d_p_coupling_diags(state: DynState, grid: FVGrid, ptop: float,
                       omega=None, *, use_gw_front: bool = False,
                       qbo_use_forcing: bool = False,
                       do_circulation_diags: bool = False) -> dict:
    """Diagnostic side of d_p_coupling (dp_coupling.F90:274-320): the
    gravity-wave frontogenesis sources, the QBO zonal-mean wind, and the
    TEM circulation diagnostics. Returns column-layout (ncol, km) arrays
    for the pbuf payloads (FRONTGF/FRONTGA/UZM) and zonal-mean (npl, jm)
    arrays under "ctem"."""
    out = {}
    if not (use_gw_front or qbo_use_forcing or do_circulation_diags):
        return out
    pe, pk, pkz, peln = pressure_vars(state.delp, ptop)
    ua, va = d2a_winds(state.u, state.v)
    qv = state.q[0]
    t3 = state.pt * pkz / (1.0 + c.ZVIR * qv)
    pmid = state.delp / (peln[1:] - peln[:-1])
    if use_gw_front:
        fgf, fga = gws_src_fnct(ua, va, t3, pmid, grid)
        out["FRONTGF"] = _to_cols(fgf)
        out["FRONTGA"] = _to_cols(fga)
    if qbo_use_forcing:
        out["UZM"] = _to_cols(zonal_mean_3d(ua))
    if do_circulation_diags:
        from ..fv.ctem import ctem_diags
        om = omega if omega is not None else jnp.zeros_like(t3)
        out["ctem"] = ctem_diags(ua, va, om, t3, pmid)
    return out


def p_d_coupling(state: DynState, pstate: PhysicsState, grid: FVGrid,
                 ptop: float, dt: float,
                 registry: ConstituentRegistry) -> DynState:
    """Physics state -> dycore import (p_d_coupling, dp_coupling.F90:679-958).

    Applies the physics-updated T and q, and converts accumulated A-grid wind
    increments (pstate.u/v vs the exported A winds) to D-grid staggered
    updates (uv3s_update role with dt5 = dt/2 two-row averaging).
    """
    jm, im = grid.jm, grid.im
    km = state.km

    t_new = _from_cols(pstate.t, jm, im)
    q_new = _from_cols(jnp.moveaxis(pstate.q, -1, 0), jm, im)

    # wind increments on the A grid
    ua0, va0 = d2a_winds(state.u, state.v)
    du_a = _from_cols(pstate.u, jm, im) - ua0
    dv_a = _from_cols(pstate.v, jm, im) - va0

    # uv3s_update (dp_coupling.F90:928-936): D-u at south edge j averages the
    # A-increments of rows j and j-1; D-v at west edge i averages i and i-1
    du_d = wset_row(0.5 * (du_a + _rolly(du_a, 1)), 0, 0.0)
    dv_d = 0.5 * (dv_a + jnp.roll(dv_a, 1, axis=-1))
    dv_d = wset_row(wset_row(dv_d, 0, 0.0), -1, 0.0)
    u_new = state.u + du_d
    v_new = state.v + dv_d

    # delp from the (possibly dme-adjusted) physics pdel; pt from T
    delp_new = _from_cols(pstate.pdel, jm, im)
    pe, pk, pkz, peln = pressure_vars(delp_new, ptop)     # p_d_adjust role
    qv = q_new[0]
    pt_new = t_new * (1.0 + c.ZVIR * qv) / pkz

    return state.replace(u=u_new, v=v_new, pt=pt_new, delp=delp_new,
                         q=q_new)
