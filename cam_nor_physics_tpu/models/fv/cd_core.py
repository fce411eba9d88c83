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
import numpy as np
from flax import struct

from ...ops import tp_core as tp
from ...ops.pallas_kernels import transport3d, vort_flux3d
from ...ops.tp_core import _rollx, _rolly, edge_north, wset_interior, wset_row
from ...utils import constants as c
from .grid import (FVGrid, circulant_filter_matrices, polar_filter,
                   polar_filter_matmul)


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
    ua = wset_interior(jnp.zeros_like(u), 0.5 * (u + _rolly(u, -1)))
    va = 0.5 * (v + jnp.roll(v, -1, axis=-1))
    va = wset_row(wset_row(va, 0, 0.0), -1, 0.0)
    return ua, va


def _corner_from_center(a):
    """Average center field to SW corners: corner (j-1/2, i-1/2); row 0 (the
    south polar edge) zeroed."""
    a_w = jnp.roll(a, 1, axis=-1)
    cor = 0.25 * ((a + a_w) + _rolly(a + a_w, 1))
    return wset_row(cor, 0, 0.0)


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
    u_n = wset_row(_rolly(u, -1), -1, 0.0)   # north edge (edge j+1)
    cose_n = jnp.concatenate([jnp.asarray(grid.cose)[1:],
                              jnp.asarray(grid.cose)[-1:]])
    cose_n = jnp.asarray(cose_n)
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
    zeta = wset_row(zeta, 0, circ_s[..., None, :])
    zeta = wset_row(zeta, -1, circ_n[..., None, :])
    return zeta + f0[:, None]


def divergence_corner(u, v, grid: FVGrid):
    """Horizontal divergence at SW corners from D winds:
    D = [δλ u + δφ(v cosφ)] / (a cosφ_edge dl·dp)."""
    jm, im = u.shape[-2:]
    cosp = jnp.asarray(grid.cosp)
    cose = jnp.asarray(grid.cose)
    u_w = jnp.roll(u, 1, axis=-1)
    # corner (j-1/2 edge row j, i-1/2): δλ u at edge row j; δφ(v cosφ)
    # between center rows j and j-1
    vterm = v * cosp[:, None]
    cose_s = jnp.where(cose > 0, cose, 1.0)[:, None]
    full = (u - u_w) / (c.REARTH * cose_s * grid.dl) + \
        (vterm - _rolly(vterm, 1)) / (c.REARTH * cose_s * grid.dp)
    return wset_interior(jnp.zeros_like(u), full)


def cd_step(state: DynState, grid: FVGrid, ptop: float, phis, dt: float,
            iord: int = 4, jord: int = 4, div2_coef_nd: float = 0.08,
            dyn_filter: bool = True, filter_impl: str = "fft",
            ke_method: str = "centered", del2_velocity: float = 0.0,
            c_sw_pgf: bool = False, filter_dm: bool = False,
            filter_csw_dm: bool = False, use_pallas: bool = True,
            mesh=None, return_debug: bool = False, div2_on: bool = True,
            div4_coef_nd: float = 0.0, div_taper=None):
    """One small Lagrangian step (cd_core equivalent). Returns
    (new_state_nolagrangian_remap, diagnostics dict with cx, cy, mfx, mfy).

    `return_debug` adds the wind-update term decomposition (half-step
    kicks, vorticity fluxes, PGF pieces, damping) to the diagnostics for
    stability forensics. With `mesh` (a ('y','x') Mesh, y-sharded inputs)
    the transport/vorticity kernels run as shard_map Pallas strips
    (parallel/shard_stencil.py) instead of the auto-partitioned jnp path."""
    jm_ = state.delp.shape[-2]
    from ...parallel.shard_stencil import use_sharded_pallas
    sharded = (use_pallas and use_sharded_pallas(mesh)
               and jm_ % mesh.shape['y'] == 0
               and jm_ // mesh.shape['y'] >= 8)
    if sharded:
        from functools import partial as _pt

        from ...parallel.shard_stencil import (sharded_transport3d,
                                               sharded_vort_flux3d)
        transport = _pt(sharded_transport3d, mesh)
        vort_flux = _pt(sharded_vort_flux3d, mesh)
    else:
        def transport(*a, **kw):
            return transport3d(*a, **kw, prefer_pallas=use_pallas)

        def vort_flux(*a, **kw):
            return vort_flux3d(*a, **kw, prefer_pallas=use_pallas)
    if (use_pallas and not sharded and not filter_dm
            and not filter_csw_dm):
        from .cd_pallas import (cd_step_fused, fused_lowering_ok,
                                use_fused_cd)
        if use_fused_cd(grid, dyn_filter, c_sw_pgf, ke_method, filter_impl,
                        return_debug) and fused_lowering_ok(
                            state, grid, ptop, phis, dt, iord, jord,
                            div2_coef_nd, dyn_filter, ke_method,
                            del2_velocity, div2_on, div4_coef_nd, div_taper):
            # 4-kernel fused path (cd_pallas.py): same formulas; the polar
            # filter runs as an in-kernel DFT matmul (== rfft to roundoff)
            return cd_step_fused(state, grid, ptop, phis, dt, iord, jord,
                                 div2_coef_nd, dyn_filter, ke_method,
                                 del2_velocity, div2_on=div2_on,
                                 div4_coef_nd=div4_coef_nd,
                                 div_taper=div_taper)
    dbg = {}
    u, v, pt, delp = state.u, state.v, state.pt, state.delp
    km, jm, im = delp.shape
    band5 = tp.ffsl_band(jm, grid.dl, 0.5 * dt)
    band1 = tp.ffsl_band(jm, grid.dl, dt)
    dl, dp_ = grid.dl, grid.dp
    cosp = jnp.asarray(grid.cosp)
    cose = jnp.asarray(grid.cose)
    acosp = jnp.asarray(grid.acosp)
    fc_e = jnp.asarray(grid.fc)

    # ---- C-grid advective winds (d2a2c + c_sw half step) ----
    ua, va = d2a_winds(u, v)
    # uc at west edges (x-edge, center row); vc at south edges
    uc0 = 0.5 * (ua + jnp.roll(ua, 1, axis=-1))
    vc0 = wset_row(0.5 * (va + _rolly(va, 1)), 0, 0.0)

    f_c = jnp.asarray(grid.f0)[:, None]
    dt5 = 0.5 * dt
    safe_cosp = jnp.where(cosp > 0, cosp, 1.0)[:, None]

    if c_sw_pgf:
        # Full c_sw half step (the default): advance delp/pt dt/2 on the C
        # grid, then kick uc/vc with Coriolis + the PGF of the half-advanced
        # state (the reference c_sw's role, which buys its cΔt/Δ ≈ 1
        # stability and lets nsplit match the reference's auto value). The
        # polar filtering of the increments below is load-bearing: without
        # it the pole rows blow up within ~15 small steps.
        crx_c = uc0 * dt5 / (c.REARTH * safe_cosp * dl)
        crx_c = wset_row(wset_row(crx_c, 0, 0.0), -1, 0.0)
        cry_c = wset_row(vc0 * dt5 / (c.REARTH * dp_), 0, 0.0)
        yfx_c = cry_c * cose[:, None]
        va_c2 = 0.5 * (cry_c + edge_north(cry_c))
        ffsl_c = jnp.max(jnp.abs(crx_c), axis=-1) > 1.0

        ddp_c, dpt_c, _, _ = transport(
            delp, pt, crx_c, cry_c, yfx_c, va_c2, ffsl_c, cosp, acosp,
            grid.rcap, 1, 1, **({} if sharded else dict(band=band5)))
        if dyn_filter and filter_csw_dm:
            # polar-filter the half-step mass/pt increments (the reference
            # cd_core filters the c_sw products delpf/ptc with pft2d before
            # they feed the D-step PGF). Mode 0 untouched -> the half-step
            # zonal-mean mass budget is unchanged.
            if filter_impl == "matmul":
                circ_c = jnp.asarray(grid.circ_center(ddp_c.dtype))
                ddp_c = polar_filter_matmul(ddp_c, circ_c)
                dpt_c = polar_filter_matmul(dpt_c, circ_c)
            else:
                pftc = jnp.asarray(grid.pft_center)
                ddp_c = polar_filter(ddp_c, pftc)
                dpt_c = polar_filter(dpt_c, pftc)
        # same thickness floor as the D step: an extreme near-pole Courant
        # event must not hand a negative thickness to the PGF (measured:
        # day-47 HS polar blow-up began with pt_h < 0 from exactly this)
        delp_h = jnp.maximum(delp + ddp_c, 0.05 * delp)
        pt_h = (pt * delp + dpt_c) / delp_h
        pt_h = jnp.maximum(pt_h, 0.1 * pt)

        pe_h, pk_h, pkz_h, _ = pressure_vars(delp_h, ptop)
        wz_h = geopotential_k(pt_h, pk_h, phis)
        phi_h = 0.5 * (wz_h[1:] + wz_h[:-1])
        en_h = phi_h + c.CPAIR * pt_h * pkz_h

        # C-grid PGF: plain center differences at the staggered points,
        # product-rule form δ(Φ+cpθπ) − cpπδθ
        dx_en = (en_h - _rollx(en_h, 1)) / (c.REARTH * safe_cosp * dl)
        dx_th = (pt_h - _rollx(pt_h, 1)) / (c.REARTH * safe_cosp * dl)
        pi_u = 0.5 * (pkz_h + _rollx(pkz_h, 1))
        pgf_u = -(dx_en - c.CPAIR * pi_u * dx_th)
        pgf_u = wset_row(wset_row(pgf_u, 0, 0.0), -1, 0.0)

        dy_en = wset_row((en_h - _rolly(en_h, 1)) / (c.REARTH * dp_),
                         0, 0.0)
        dy_th = wset_row((pt_h - _rolly(pt_h, 1)) / (c.REARTH * dp_),
                         0, 0.0)
        pi_v = wset_row(0.5 * (pkz_h + _rolly(pkz_h, 1)), 0, pkz_h)
        pgf_v = wset_row(-(dy_en - c.CPAIR * pi_v * dy_th), 0, 0.0)

        duc = dt5 * (f_c * vc_at_uc(vc0) + pgf_u)
        dvc = dt5 * (-fc_e[:, None] * uc_at_vc(uc0) + pgf_v)
        if dyn_filter:
            # polar-filter the C-wind increments (filtcw role,
            # dyn_comp.F90 namelist `filtcw`): the staggered C-grid PGF
            # carries a 1/cosφ factor, and unfiltered near-pole grid-scale
            # kicks feed straight into the transport Courant numbers —
            # measured: without this, the half step blows up at the pole
            # row within ~15 small steps even at Cy=0.25. uc lives on
            # center rows (like v), vc on edge rows (like u).
            if filter_impl == "matmul":
                duc = polar_filter_matmul(
                    duc, jnp.asarray(grid.circ_center(duc.dtype)))
                dvc = polar_filter_matmul(
                    dvc, jnp.asarray(grid.circ_edge(dvc.dtype)))
            else:
                duc = polar_filter(duc, jnp.asarray(grid.pft_center))
                dvc = polar_filter(dvc, jnp.asarray(grid.pft_edge))
        uc = uc0 + duc
        vc = vc0 + dvc
        if return_debug:
            dbg.update(uc0=uc0, vc0=vc0, duc=duc, dvc=dvc, pgf_u_c=pgf_u,
                       pgf_v_c=pgf_v, delp_h=delp_h, pt_h=pt_h)
    else:
        # Coriolis-only half rotation (the pre-c_sw formulation; needs
        # (c+u)Δt/Δ < ~0.5 — see FVConfig.div24del2flag notes)
        uc = uc0 + dt5 * f_c * vc_at_uc(vc0)
        vc = vc0 - dt5 * fc_e[:, None] * uc_at_vc(uc)

    # Courant numbers / background fluxes at D-flux positions
    safe_cosp = jnp.where(cosp > 0, cosp, 1.0)[:, None]
    crx = uc * dt / (c.REARTH * safe_cosp * dl)
    crx = wset_row(wset_row(crx, 0, 0.0), -1, 0.0)
    # cry south-edge (km, jm, im): row e = Courant across south edge of
    # row e; the polar edges carry no flux
    cry = wset_row(vc * dt / (c.REARTH * dp_), 0, 0.0)
    yfx = cry * cose[:, None]
    va_c = 0.5 * (cry + edge_north(cry))

    ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0

    # ---- transport delp (mass) and pt with tp2c/tp2d ----
    # (pt advected as mixing-ratio-like with the same mass fluxes, id=1;
    # fused per-level Pallas kernel on single-chip TPU, vmapped jnp else)
    ddp, dpt, mfx, mfy = transport(
        delp, pt, crx, cry, yfx, va_c, ffsl, cosp, acosp, grid.rcap,
        iord, jord, **({} if sharded else dict(band=band1)))
    if dyn_filter and filter_dm:
        # EXPERIMENTAL: polar-filter the mass/pt transport increments too.
        # The wind-tendency filter alone leaves near-pole zonal delp/pt
        # structure undamped; at large small-steps (nsplit=4 at 1.9°x2.5°)
        # the unfiltered mass side of the gravity-wave coupling is a
        # candidate driver of the polar-cap blow-up. Mode 0 (zonal mean) is
        # untouched, so global mass is exactly conserved.
        if filter_impl == "matmul":
            circ_c = jnp.asarray(grid.circ_center(ddp.dtype))
            ddp = polar_filter_matmul(ddp, circ_c)
            dpt = polar_filter_matmul(dpt, circ_c)
        else:
            pftc = jnp.asarray(grid.pft_center)
            ddp = polar_filter(ddp, pftc)
            dpt = polar_filter(dpt, pftc)
    # thickness floor guard rail (see trac2d note; prevents q/pt blow-up
    # through near-zero Lagrangian layers in extreme states)
    delp_new = jnp.maximum(delp + ddp, 0.05 * delp)
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
    if ke_method == "upwind":
        # upstream-biased KE (the Hollingsworth–Kållberg cure used by the
        # FV family: evaluate the KE-gradient term with the same upwind
        # bias as the vorticity flux, so the two vector-invariant terms
        # cancel consistently for a balanced jet). At each center, select
        # the u edge (south row j vs north row j+1) from which the
        # meridional flow arrives, and the v edge (west i vs east i+1)
        # from which the zonal flow arrives.
        u_n = wset_row(_rolly(u, -1), -1, 0.0)
        u_sel = jnp.where(va >= 0.0, u, u_n)
        v_e = jnp.roll(v, -1, axis=-1)
        v_sel = jnp.where(ua >= 0.0, v, v_e)
        ke = wset_interior(0.5 * (ua ** 2 + va ** 2),
                           0.5 * (u_sel ** 2 + v_sel ** 2))
    elif ke_method == "avg_sq":
        # average-of-squares KE at centers: 0.25(u_j^2+u_{j+1}^2) +
        # 0.25(v_i^2+v_{i+1}^2). The square-of-averages form feeds the
        # Hollingsworth–Kållberg instability of vector-invariant schemes
        # (observed: tropical blow-up as the HS jet spins up); averaging the
        # squares keeps KE consistent with the staggered circulation terms.
        u_n = wset_row(_rolly(u, -1), -1, 0.0)
        ke_u = wset_interior(jnp.zeros_like(u), 0.5 * (u ** 2 + u_n ** 2))
        ke_v = 0.5 * (v ** 2 + jnp.roll(v, -1, axis=-1) ** 2)
        ke_v = wset_row(wset_row(ke_v, 0, 0.0), -1, 0.0)
        ke = 0.5 * (ke_u + ke_v)
    else:
        ke = 0.5 * (ua ** 2 + va ** 2)
    # PGF from the POST-transport state (backward evaluation). Measured:
    # this backward damping is load-bearing — a time-centered (trapezoidal)
    # PGF destabilizes ~10x sooner (CPU HS test: dies at step 28 vs 321 at
    # (c+u)Δt/Δy ≈ 0.9). Do not "fix" this to centered without an implicit
    # gravity-wave treatment.
    energy = ke + phi_m + c.CPAIR * pt_new * pkz   # K + Φ + cp·θv·π
    # the cpθv·δπ term is applied as δ(cpθvπ) − cpπδθv (product rule), i.e.
    # gradient of the Montgomery-like potential minus the compensation term
    pi_ = pkz
    theta = pt_new

    # u update at south edges (rows 1..jm-1): flux of ζ northward across
    # y-edges (ytp) with edge mass flux v̄·dt at u points, and x-flux of ζ
    # at west edges (xtp) with uc·dt — fused per level
    v_c4 = _corner_from_center(0.5 * (v + jnp.roll(v, -1, axis=-1)))
    v_edge = 0.5 * (v_c4 + jnp.roll(v_c4, -1, axis=-1))
    fx_z, fy_z = vort_flux(zeta_a, crx, cry, uc * dt, v_edge * dt, ffsl,
                           cosp, iord, jord,
                           **({} if sharded else dict(band=band1)))

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

    du = fy_z - dt * (dx_en - c.CPAIR * pi_u * dx_th)
    du = wset_row(du, 0, 0.0)
    if return_debug:
        dbg.update(fy_z=fy_z, du_pgf=-dt * (dx_en - c.CPAIR * pi_u * dx_th))

    # δy at v point (i-1/2, j): corners (j+1/2)-(j-1/2) = rows j+1 and j
    def dy_of(ac):
        return wset_interior(jnp.zeros_like(v),
                             (_rolly(ac, -1) - ac) / (c.REARTH * dp_))

    dy_en = dy_of(en_c)
    dy_th = dy_of(th_c)
    pi_v = wset_interior(jnp.zeros_like(v),
                         0.5 * (_rolly(pi_c, -1) + pi_c))

    dv = -fx_z - dt * (dy_en - c.CPAIR * pi_v * dy_th)
    dv = wset_row(wset_row(dv, 0, 0.0), -1, 0.0)
    if return_debug:
        dbg.update(fx_z=fx_z, dv_pgf=-dt * (dy_en - c.CPAIR * pi_v * dy_th),
                   crx=crx, cry=cry, ke=ke, zeta_a=zeta_a)

    # ---- divergence damping (div24del2flag family) ----
    # The reference's damping tables (cdx/cdy del2, cdx4/cdy4/cdtau4 div4,
    # /root/reference/fv/dynamics_vars.F90:205-208, 940-952) are built in
    # upstream cd_core, which is not shipped; this reconstructs the same
    # operator family: del2 damping of the corner divergence with an
    # optional per-level top-sponge taper (the CAM 1+tanh(ln(ptop/p))
    # convention), and del4 (biharmonic) divergence damping
    # du += dt·[ν₂ δx(D) − ν₄ δx(∇²D)] (likewise for dv), with
    # ν₂ = c₂(k)·Δy²/dt and ν₄ = c₄·Δy⁴/dt nondimensionalized on the
    # meridional spacing.
    cose_sf = jnp.where(cose[:, None] > 0, cose[:, None], 1.0)
    div = divergence_corner(u, v, grid)
    damp = jnp.zeros_like(div)
    if div_taper is not None:
        # per-level taper: (km,) -> (km,1,1); div2_coef_nd is the interior
        # floor, the taper supplies the model-top sponge
        c2 = jnp.maximum(div2_coef_nd, jnp.asarray(div_taper, div.dtype))
        c2 = c2[:, None, None]
    else:
        c2 = div2_coef_nd
    if div2_on:
        nu = c2 * (c.REARTH * dp_) ** 2 / dt
        damp = damp + nu * div
    if div4_coef_nd > 0.0:
        # ∇² of the corner divergence (corner rows 1..jm-1 are interior)
        rdx2 = 1.0 / (c.REARTH * cose_sf * dl) ** 2
        rdy2 = 1.0 / (c.REARTH * dp_) ** 2
        lap_div = (jnp.roll(div, -1, axis=-1) - 2.0 * div +
                   jnp.roll(div, 1, axis=-1)) * rdx2
        lap_div = lap_div + wset_interior(
            jnp.zeros_like(div),
            (_rolly(div, -1) - 2.0 * div + _rolly(div, 1)) * rdy2)
        lap_div = wset_interior(jnp.zeros_like(div), lap_div)
        # biharmonic coefficient follows the LOCAL grid scale
        # L(j) = a·min(Δφ, cosφ_e·Δλ): explicit ∇⁴ at a uniform Δy⁴
        # strength is unconditionally unstable near the poles where
        # Δx ≪ Δy (the 1/cos⁴ amplification outruns the polar filter —
        # measured NaN within 3 steps at 31 rows)
        l4 = (c.REARTH * jnp.minimum(dp_, cose_sf * dl)) ** 4
        nu4 = (div4_coef_nd / dt) * l4
        damp = damp - nu4 * lap_div
    ddiv_x = (jnp.roll(damp, -1, axis=-1) - damp) / \
        (c.REARTH * cose_sf * dl)
    du = du + dt * ddiv_x
    ddiv_y = wset_interior(jnp.zeros_like(v),
                           (_rolly(damp, -1) - damp) / (c.REARTH * dp_))
    dv = dv + dt * ddiv_y

    if del2_velocity > 0.0:
        # del2 velocity damping (the div24del2flag=42 / del2coef path,
        # dyn_comp.F90 namelist): explicit Laplacian diffusion of the winds
        cs = jnp.where(cose[:, None] > 0, cose[:, None], 1.0)
        rdx2 = 1.0 / (c.REARTH * cs * dl) ** 2
        rdy2 = 1.0 / (c.REARTH * dp_) ** 2

        def lap(a):
            d2x = (_rollx(a, -1) - 2.0 * a + _rollx(a, 1)) * rdx2
            d2y = wset_interior(
                jnp.zeros_like(a),
                (_rolly(a, -1) - 2.0 * a + _rolly(a, 1)) * rdy2)
            return d2x + d2y

        du = du + dt * del2_velocity * lap(u)
        dv = dv + dt * del2_velocity * lap(v)

    # ---- polar filter on wind tendencies ----
    if dyn_filter:
        if filter_impl == "matmul":
            # circulant-matmul form: exact same spectral damping, runs on the
            # MXU and avoids sharded-FFT layout restrictions (grid.py)
            du = polar_filter_matmul(
                du, jnp.asarray(grid.circ_edge(du.dtype)))
            dv = polar_filter_matmul(
                dv, jnp.asarray(grid.circ_center(dv.dtype)))
        else:
            du = polar_filter(du, jnp.asarray(grid.pft_edge))
            dv = polar_filter(dv, jnp.asarray(grid.pft_center))

    u_new = u + du
    v_new = v + dv

    new_state = state.replace(u=u_new, v=v_new, pt=pt_new, delp=delp_new)
    diags = dict(cx=crx, cy=cry, mfx=mfx, mfy=mfy, pe=pe, pk=pk, pkz=pkz,
                 peln=peln, wz=wz)
    if return_debug:
        dbg.update(du=du, dv=dv)
        diags["debug"] = dbg
    return new_state, diags


def vc_at_uc(vc):
    """Average vc (south edges) to uc points (west edges, center rows)."""
    vc_c = 0.5 * (vc + edge_north(vc))             # to centers
    return 0.5 * (vc_c + jnp.roll(vc_c, 1, axis=-1))


def uc_at_vc(uc):
    """Average uc (west edges, center rows) to vc points (south edges)."""
    return wset_row(0.5 * (uc + _rolly(uc, 1)), 0, 0.0)
