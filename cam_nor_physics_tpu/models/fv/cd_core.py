"""C/D-grid Lagrangian shallow-water solver — cd_core equivalent.

The reference's `cd_core` is an upstream dependency, not shipped in the repo;
its contract is pinned at /root/reference/fv/dyn_comp.F90:1926-1941 (arg list:
u, v, pt, delp, pe, pk in; cx/cy/mfx/mfy Courant & mass-flux accumulators out;
damping flags; polar filtering) and the grid tables it consumes at
/root/reference/fv/dynamics_vars.F90:196-224. This module rebuilds the solver
from the Lin & Rood (1996, 1997) formulation (SURVEY §7.4.2):

  - D-grid staggering: u at (λ_center, φ_edge) [south edge of row j],
    v at (λ_edge, φ_center) [west edge of cell i]; scalars at centers.
  - C-grid advective winds obtained by 4-point averaging (d2a2c role) and
    advanced a half step with Coriolis + PGF (the nonlinear advective terms of
    the C half-step are omitted in this round — a documented structural
    simplification; the D step's upwind PPM fluxes keep the scheme stable).
  - D-grid full step: delp and pt transported with tp2c/tp2d (the exact
    reference kernels from ops/tp_core); winds updated in vector-invariant
    form: u += Δt[ Fy(ζ_a) − δx(K + Φ) − cpθv δx(π) ], with the SAME
    upwind-PPM vorticity flux construction as the reference (ytp/xtp of
    center absolute vorticity) so no spurious vorticity source arises.
  - Hydrostatic geopotential (geopk role): Φ(k) = Φ(k+1) + cp·pt·δ(p^κ),
    a local cumulative sum over on-chip levels (SURVEY §2.3 P9).
  - del2 divergence damping on corner divergence; FFT polar filtering of the
    wind tendencies poleward of ycrit.
  - Courant/mass-flux accumulation (cx, cy, mfx, mfy) for trac2d.

All functions are whole-(km, jm, im)-array and jit-safe; level axis handled by
vmap where the computation is columnar-independent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ...ops import tp_core as tp
from ...utils import constants as c
from .grid import FVGrid, polar_filter


@struct.dataclass
class DynState:
    """Prognostic dycore state (T_FVDYCORE_VARS equivalent,
    /root/reference/fv/dynamics_vars.F90:55-62). Shapes (km, jm, im) with
    k=0 the model top; tracers (nq, km, jm, im)."""

    u: jnp.ndarray        # D-grid zonal wind at south edges (m/s)
    v: jnp.ndarray        # D-grid meridional wind at west edges (m/s)
    pt: jnp.ndarray       # scaled virtual potential temperature Tv / pkz
    delp: jnp.ndarray     # layer pressure thickness (Pa)
    q: jnp.ndarray        # tracers (mixing ratio w.r.t. moist air)

    @property
    def km(self):
        return self.delp.shape[0]


def pressure_vars(delp, ptop: float):
    """Derive pe, pk, pkz, peln from delp (p_d_adjust / geopk role).

    pe: interface pressures (km+1, jm, im); pk = pe^kappa; pkz = mean Exner
    of the layer Δ(p^κ)/(κ Δln p) — the reference's pkz definition.
    """
    kshape = (1,) + delp.shape[1:]
    pe = jnp.concatenate(
        [jnp.full(kshape, ptop, delp.dtype),
         ptop + jnp.cumsum(delp, axis=0)], axis=0)
    peln = jnp.log(pe)
    pk = pe ** c.CAPPA
    pkz = (pk[1:] - pk[:-1]) / (c.CAPPA * (peln[1:] - peln[:-1]))
    return pe, pk, pkz, peln


def geopotential_k(pt, pk, phis):
    """Interface geopotential by upward integration (geopk equivalent):
    Φ(k) = Φ(k+1) + cp·pt(k)·(pk(k+1) − pk(k)). Returns wz (km+1, jm, im)."""
    dgz = c.CPAIR * pt * (pk[1:] - pk[:-1])          # (km, jm, im)
    wz_top = phis[None] + jnp.flip(
        jnp.cumsum(jnp.flip(dgz, axis=0), axis=0), axis=0)
    return jnp.concatenate([wz_top, phis[None]], axis=0)


def d2a_winds(u, v):
    """D-grid -> A-grid (cell-center) winds (d2a3dikj role,
    /root/reference/fv/dp_coupling.F90:269). u edges j&j+1 average to row j;
    v west edges i&i+1 average to center i. Pole rows get zero A winds (the
    cap carries no unique vector direction on the lat-lon grid)."""
    ua = jnp.zeros_like(u)
    ua = ua.at[..., 1:-1, :].set(0.5 * (u[..., 1:-1, :] + u[..., 2:, :]))
    va = 0.5 * (v + jnp.roll(v, -1, axis=-1))
    va = va.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
    return ua, va


def _corner_from_center(a):
    """Average center field to SW corners: corner (j-1/2, i-1/2)."""
    a_w = jnp.roll(a, 1, axis=-1)
    out = jnp.zeros_like(a)
    return out.at[..., 1:, :].set(
        0.25 * (a[..., 1:, :] + a_w[..., 1:, :] +
                a[..., :-1, :] + a_w[..., :-1, :]))


def absolute_vorticity(u, v, grid: FVGrid):
    """Relative + planetary vorticity at cell centers from D winds:
    ζ = [δλ v − δφ(u cosφ_edge)] / (a cosφ dl·dp-weighted) + f0.

    Circulation around the scalar cell: south edge carries u(j), north edge
    u(j+1), east/west edges v. Pole rows: cap-mean circulation.
    """
    jm, im = u.shape[-2:]
    dl, dp = grid.dl, grid.dp
    cose = jnp.asarray(grid.cose)
    cosp = jnp.asarray(grid.cosp)
    f0 = jnp.asarray(grid.f0)

    u_s = u                                  # south edge of row j
    u_n = jnp.concatenate([u[..., 1:, :], jnp.zeros_like(u[..., :1, :])],
                          axis=-2)           # north edge (edge j+1)
    cose_n = jnp.concatenate([cose[1:], cose[-1:]])
    v_e = jnp.roll(v, -1, axis=-1)

    circ = (u_s * cose[:, None] - u_n * cose_n[:, None]) * dl * c.REARTH + \
        (v_e - v) * dp * c.REARTH
    area = c.REARTH ** 2 * cosp[:, None] * dl * dp
    zeta = circ / jnp.where(area == 0.0, 1.0, area)

    # polar caps: ζ_cap = ∓∮ u cose dl / cap-area (mean over the cap)
    cap_area = c.REARTH ** 2 * grid.acap * dp * dl / im
    circ_s = -jnp.sum(u[..., 1, :] * cose[1] * dl * c.REARTH, axis=-1,
                      keepdims=True) / (im * cap_area)
    circ_n = jnp.sum(u[..., -1, :] * cose[-1] * dl * c.REARTH, axis=-1,
                     keepdims=True) / (im * cap_area)
    zeta = zeta.at[..., 0, :].set(circ_s)
    zeta = zeta.at[..., -1, :].set(circ_n)
    return zeta + f0[:, None]


def divergence_corner(u, v, grid: FVGrid):
    """Horizontal divergence at SW corners from D winds:
    D = [δλ u + δφ(v cosφ)] / (a cosφ_edge dl·dp)."""
    jm, im = u.shape[-2:]
    cosp = jnp.asarray(grid.cosp)
    cose = jnp.asarray(grid.cose)
    u_w = jnp.roll(u, 1, axis=-1)
    div = jnp.zeros_like(u)
    # corner (j-1/2 edge row j, i-1/2): δλ u at edge row j; δφ(v cosφ)
    # between center rows j and j-1
    vterm = v * cosp[:, None]
    div = div.at[..., 1:-1, :].set(
        (u[..., 1:-1, :] - u_w[..., 1:-1, :]) / (c.REARTH * cose[1:-1, None] * grid.dl)
        + (vterm[..., 1:-1, :] - vterm[..., :-2, :]) /
        (c.REARTH * cose[1:-1, None] * grid.dp))
    return div


def cd_step(state: DynState, grid: FVGrid, ptop: float, phis, dt: float,
            iord: int = 4, jord: int = 4, div2_coef_nd: float = 0.08,
            dyn_filter: bool = True):
    """One small Lagrangian step (cd_core equivalent). Returns
    (new_state_nolagrangian_remap, diagnostics dict with cx, cy, mfx, mfy)."""
    u, v, pt, delp = state.u, state.v, state.pt, state.delp
    km, jm, im = delp.shape
    dl, dp_ = grid.dl, grid.dp
    cosp = jnp.asarray(grid.cosp)
    cose = jnp.asarray(grid.cose)
    acosp = jnp.asarray(grid.acosp)
    fc_e = jnp.asarray(grid.fc)

    # ---- C-grid advective winds (d2a2c + half-step Coriolis/PGF) ----
    ua, va = d2a_winds(u, v)
    # uc at west edges (x-edge, center row); vc at south edges
    uc = 0.5 * (ua + jnp.roll(ua, 1, axis=-1))
    vc = jnp.zeros_like(v)
    vc = vc.at[..., 1:, :].set(0.5 * (va[..., 1:, :] + va[..., :-1, :]))

    # half-step Coriolis rotation of the advective winds (C step role)
    f_c = jnp.asarray(grid.f0)[:, None]
    dt5 = 0.5 * dt
    uc = uc + dt5 * f_c * vc_at_uc(vc)
    vc = vc - dt5 * fc_e[:, None] * uc_at_vc(uc)

    # Courant numbers / background fluxes at D-flux positions
    safe_cosp = jnp.where(cosp > 0, cosp, 1.0)[:, None]
    crx = uc * dt / (c.REARTH * safe_cosp * dl)
    crx = crx.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
    # cry at south edges: (km, jm+1, im); edge row e uses vc at edge e
    cry_rows = vc * dt / (c.REARTH * dp_)
    cry = jnp.concatenate([cry_rows, jnp.zeros_like(cry_rows[..., :1, :])],
                          axis=-2)
    cry = cry.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)
    yfx = cry * jnp.concatenate([cose, cose[-1:]])[:, None]
    va_c = 0.5 * (cry[..., :-1, :] + cry[..., 1:, :])

    ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0

    # ---- transport delp (mass) and pt with tp2c/tp2d ----
    def transport_level(args):
        delp_k, pt_k, crx_k, cry_k, yfx_k, va_k, ffsl_k = args
        ddp, mfx_k, mfy_k = tp.tp2c(va_k, delp_k, crx_k, cry_k, iord, jord,
                                    crx_k, yfx_k, cosp, acosp, grid.rcap,
                                    ffsl_k)
        # pt advected as mixing-ratio-like with the same mass fluxes (id=1)
        fx_pt, fy_pt = tp.tp2d(va_k, pt_k, crx_k, cry_k, iord, jord,
                               mfx_k, mfy_k, cosp, ffsl_k, 1)
        dpt = fx_pt - jnp.roll(fx_pt, -1, axis=-1) + \
            (fy_pt[:-1, :] - fy_pt[1:, :]) * acosp[:, None]
        dpt = dpt.at[0, :].set(-jnp.sum(fy_pt[1, :]) * grid.rcap)
        dpt = dpt.at[-1, :].set(jnp.sum(fy_pt[jm - 1, :]) * grid.rcap)
        return ddp, dpt, mfx_k, mfy_k

    ddp, dpt, mfx, mfy = jax.vmap(transport_level)(
        (delp, pt, crx, cry, yfx, va_c, ffsl))
    delp_new = delp + ddp
    pt_new = (pt * delp + dpt) / delp_new

    # ---- thermodynamics from the UPDATED mass/pt fields (geopk role) ----
    # forward-backward time staggering: the wind update sees the transported
    # delp/pt, which is what makes the gravity-wave coupling stable (the
    # reference calls geopk after the D-grid transport for the same reason)
    pe, pk, pkz, peln = pressure_vars(delp_new, ptop)
    wz = geopotential_k(pt_new, pk, phis)
    phi_m = 0.5 * (wz[1:] + wz[:-1])        # layer-mid geopotential

    # ---- vector-invariant wind update ----
    zeta_a = absolute_vorticity(u, v, grid)
    ke = 0.5 * (ua ** 2 + va ** 2)
    energy = ke + phi_m + c.CPAIR * pt_new * pkz   # K + Φ + cp·θv·π
    # the cpθv·δπ term is applied as δ(cpθvπ) − cpπδθv (product rule), i.e.
    # gradient of the Montgomery-like potential minus the compensation term
    pi_ = pkz
    theta = pt_new

    # u update at south edges (rows 1..jm-1)
    def yflux_vort(args):
        zeta_k, cry_k, vdt_k, ffsl_k = args
        # flux of ζ northward across y-edges with upwind PPM (ytp)
        return tp.ytp(zeta_k, cry_k, vdt_k, jord, 0)

    # edge mass flux for vorticity: v̄·dt at u points (edge rows)
    v_edge = jnp.zeros((km, jm + 1, im), u.dtype)
    v_c4 = _corner_from_center(0.5 * (v + jnp.roll(v, -1, axis=-1)))
    v_edge = v_edge.at[..., :jm, :].set(
        0.5 * (v_c4 + jnp.roll(v_c4, -1, axis=-1)))
    fy_z = jax.vmap(yflux_vort)((zeta_a, cry, v_edge * dt, ffsl))

    # x-flux of vorticity at west edges with uc·dt
    def xflux_vort(args):
        zeta_k, crx_k, udt_k, ffsl_k = args
        return tp.xtp(zeta_k, crx_k, udt_k, cosp, ffsl_k, iord, 1)

    fx_z = jax.vmap(xflux_vort)((zeta_a, crx, uc * dt, ffsl))

    # gradients via corner-averaged fields (half-cell differences; a centered
    # 2Δx stencil would admit a checkerboard null space)
    cose_s = jnp.where(cose[:, None] > 0, cose[:, None], 1.0)
    en_c = _corner_from_center(energy)       # corner (i-1/2, j-1/2)
    th_c = _corner_from_center(theta)
    pi_c = _corner_from_center(pi_)
    # δx at u point (i, j-1/2): corners (i+1/2)-(i-1/2) = roll(-1) - self
    dx_en = (jnp.roll(en_c, -1, axis=-1) - en_c) / (c.REARTH * cose_s * dl)
    dx_th = (jnp.roll(th_c, -1, axis=-1) - th_c) / (c.REARTH * cose_s * dl)
    pi_u = 0.5 * (pi_c + jnp.roll(pi_c, -1, axis=-1))

    du = fy_z[..., :jm, :] - dt * (dx_en - c.CPAIR * pi_u * dx_th)
    du = du.at[..., 0, :].set(0.0)

    # δy at v point (i-1/2, j): corners (j+1/2)-(j-1/2) = rows j+1 and j
    def dy_of(ac):
        out = jnp.zeros_like(v)
        return out.at[..., 1:-1, :].set(
            (ac[..., 2:, :] - ac[..., 1:-1, :]) / (c.REARTH * dp_))

    dy_en = dy_of(en_c)
    dy_th = dy_of(th_c)
    pi_v = jnp.zeros_like(v)
    pi_v = pi_v.at[..., 1:-1, :].set(0.5 * (pi_c[..., 2:, :] +
                                            pi_c[..., 1:-1, :]))

    dv = -fx_z - dt * (dy_en - c.CPAIR * pi_v * dy_th)
    dv = dv.at[..., 0, :].set(0.0).at[..., -1, :].set(0.0)

    # ---- del2 divergence damping ----
    div = divergence_corner(u, v, grid)
    nu = div2_coef_nd * (c.REARTH * dp_) ** 2 / dt
    ddiv_x = (jnp.roll(div, -1, axis=-1) - div) / \
        (c.REARTH * jnp.where(cose[:, None] > 0, cose[:, None], 1.0) * dl)
    du = du + dt * nu * ddiv_x
    ddiv_y = jnp.zeros_like(v)
    ddiv_y = ddiv_y.at[..., 1:-1, :].set(
        (div[..., 2:, :] - div[..., 1:-1, :]) / (c.REARTH * dp_))
    dv = dv + dt * nu * ddiv_y

    # ---- polar filter on wind tendencies ----
    if dyn_filter:
        du = polar_filter(du, jnp.asarray(grid.pft_edge))
        dv = polar_filter(dv, jnp.asarray(grid.pft_center))

    u_new = u + du
    v_new = v + dv

    new_state = state.replace(u=u_new, v=v_new, pt=pt_new, delp=delp_new)
    diags = dict(cx=crx, cy=cry, mfx=mfx, mfy=mfy, pe=pe, pk=pk, pkz=pkz,
                 peln=peln, wz=wz)
    return new_state, diags


def vc_at_uc(vc):
    """Average vc (south edges) to uc points (west edges, center rows)."""
    vc_n = jnp.concatenate([vc[..., 1:, :], jnp.zeros_like(vc[..., :1, :])],
                           axis=-2)
    vc_c = 0.5 * (vc + vc_n)                       # to centers
    return 0.5 * (vc_c + jnp.roll(vc_c, 1, axis=-1))


def uc_at_vc(uc):
    """Average uc (west edges, center rows) to vc points (south edges)."""
    out = jnp.zeros_like(uc)
    return out.at[..., 1:, :].set(0.5 * (uc[..., 1:, :] + uc[..., :-1, :]))
