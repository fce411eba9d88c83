"""FV dycore component: dyn_run orchestration, trac2d, te_map.

Equivalent of /root/reference/fv/dyn_comp.F90's dyn_run (742-2823) with the
upstream te_map/trac2d contracts (SURVEY §2.2). Structure (SURVEY §3.1):

    for iv in 1..nv (vertical-remap subcycle):
      for n in 1..n2 (tracer subcycle):
        save dp0; zero cx/cy/mfx/mfy
        for it in 1..nsplit: cd_core small step (accumulating Courants/fluxes)
        trac2d: large-Δt tracer transport with accumulated fluxes
      te_map: conservative vertical remap back to the hybrid coordinate

The MPI transposes bracketing each phase in the reference (dyn_comp.F90:
1563-1815, 2494-2682) have no equivalent: one resident sharding serves all
phases (SURVEY §7.1.1). Subcycle factorization follows dyn_comp.F90:1497-1524.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops import tp_core as tp
from ...ops.fill import fillz
from ...ops.pallas_kernels import tracer_div3d
from ...ops.tp_core import _rolly, edge_north, wset_row
from ...ops.remap import ppm_remap, ppm_remap_multi
from ...utils import constants as c
from ...utils.config import FVConfig
from .cd_core import DynState, cd_step, pressure_vars
from .grid import FVGrid
from .vertical import HybridCoord

# trace-time scan-unroll toggles (perf experiments; tools/prof_unroll_ab.py
# interleaves compiled variants on-chip to beat tunnel throughput drift)
_UNROLL = {"small": False, "cycles": True, "recover": True}


def trac2d(q, dp0, cx, cy, mfx, mfy, grid: FVGrid, iord: int, jord: int,
           fill: bool = True, use_pallas: bool = True, mesh=None):
    """Large-timestep tracer transport with accumulated Courant numbers and
    mass fluxes (upstream trac2d contract, dyn_comp.F90:2385-2388).

    q: (nq, km, jm, im); dp0: (km, jm, im) pre-step thickness; cx/mfx at west
    edges (km, jm, im); cy/mfy south-edge indexed (km, jm, im), row 0 unused.
    Tracer mass q*dp0 is updated in flux form; the new thickness is diagnosed
    from the same mass fluxes so tracer mixing ratios remain consistent with
    the continuity equation (free-stream preserving by construction).
    """
    cosp = jnp.asarray(grid.cosp)
    acosp = jnp.asarray(grid.acosp)
    jm = dp0.shape[-2]
    ffsl = jnp.max(jnp.abs(cx), axis=-1) > 1.0
    va = 0.5 * (cy + edge_north(cy))

    # thickness implied by the accumulated mass fluxes
    ddp = mfx - jnp.roll(mfx, -1, axis=-1) + \
        (mfy - edge_north(mfy)) * acosp[:, None]
    ddp = wset_row(
        ddp, 0,
        -jnp.sum(mfy[..., 1, :], axis=-1, keepdims=True)[..., None, :] *
        grid.rcap)
    ddp = wset_row(
        ddp, -1,
        jnp.sum(mfy[..., jm - 1, :], axis=-1, keepdims=True)[..., None, :] *
        grid.rcap)
    # guard rail (qneg3/umax-family sentinel, SURVEY §5.3): in violently
    # deformed columns the flux-implied thickness can collapse toward zero,
    # amplifying mixing ratios unboundedly (observed: q -> 98 kg/kg before
    # a blow-up). Floor it; the subsequent te_map restores the coordinate.
    dp_new = jnp.maximum(dp0 + ddp, 0.05 * dp0)

    from ...parallel.shard_stencil import (sharded_tracer_div3d,
                                           use_sharded_pallas)
    if (use_pallas and use_sharded_pallas(mesh)
            and jm % mesh.shape['y'] == 0 and jm // mesh.shape['y'] >= 8):
        dqm = sharded_tracer_div3d(mesh, q, cx, cy, mfx, mfy, va, ffsl,
                                   cosp, acosp, grid.rcap, iord, jord)
    else:
        dqm = tracer_div3d(q, cx, cy, mfx, mfy, va, ffsl, cosp, acosp,
                           grid.rcap, iord, jord, prefer_pallas=use_pallas)
    q_new = (q * dp0[None] + dqm) / dp_new[None]
    if fill:
        # vertical borrowing repair of splitting undershoots (fill_module
        # role, dyn_comp.F90 `fill` flag)
        qk = jnp.moveaxis(q_new, 1, -1)          # (nq, jm, im, km)
        dpk = jnp.moveaxis(dp_new, 0, -1)
        qk, _ = fillz(qk, dpk[None])
        q_new = jnp.moveaxis(qk, -1, 1)
    return q_new, dp_new


def te_map(state: DynState, coord: HybridCoord, grid: FVGrid, ptop: float,
           kord: int = 4, consv: bool = False, use_pallas: bool = True):
    """Vertical remap from Lagrangian surfaces to the hybrid coordinate
    (upstream te_map contract, dyn_comp.F90:79, 2699-2740).

    Remaps pt (mass-weighted), tracers, and u/v (on edge-averaged pressure
    thickness). Total air mass per column is preserved exactly (ps from the
    Lagrangian pe). consv=True conserves column total energy in the
    reference formulation (upstream te_map, called at dyn_comp.F90:2699-2740):
    the layer total energy te = KE + M (Montgomery streamfunction,
    M = Phi_below + cp*pt*pk_below — the exact layer mean of cp*Tv + Phi
    for layer-constant pt) is remapped as a conserved quantity and pt is
    recovered from it bottom-up on the new coordinate.
    """
    km, jm, im = state.delp.shape
    nq = state.q.shape[0]
    pe, pk, pkz, peln = pressure_vars(state.delp, ptop)
    ps = pe[-1]                                   # (jm, im)
    pe_tgt = jnp.moveaxis(coord.pint(ps), -1, 0)  # (km+1, jm, im)

    from .cd_core import d2a_winds

    def layer_te(pt_, u_, v_, pk_):
        """Layer total energy KE + M. Within a layer of constant (scaled
        virtual potential) temperature, hydrostatic balance gives
        dPhi = -cp*pt*d(p^kappa), so cp*Tv + Phi == Phi_edge_below +
        cp*pt*pk_edge_below exactly — the Montgomery streamfunction form.
        The surface geopotential is taken as 0: it adds the same constant
        per unit mass before and after the remap (column mass is exactly
        preserved) and cancels in the recovery."""
        ua, va = d2a_winds(u_, v_)
        ke = 0.5 * (ua ** 2 + va ** 2)
        contrib = c.CPAIR * pt_ * (pk_[1:] - pk_[:-1])   # Phi_k - Phi_k+1
        # Phi at edge k = sum_{k'>=k} contrib  (edge km = surface = 0)
        phi_edge = jnp.cumsum(contrib[::-1], axis=0)[::-1]
        phi_below = phi_edge - contrib                   # edge k+1
        return ke + phi_below + c.CPAIR * pt_ * pk_[1:]

    ncol = jm * im

    # winds: remap on pressure profiles averaged to their staggered positions
    def south_shift(a):                   # a[:, j-1], row 0 -> row 0
        return wset_row(_rolly(a, 1), 0, a)

    # center-interface fields to remap: pt, tracers, and (consv) the layer
    # total energy as an additional conserved scalar
    cen_fields = [state.pt] + [state.q[m] for m in range(nq)]
    if consv:
        cen_fields.append(layer_te(state.pt, state.u, state.v, pk))

    from ...ops.remap_pallas import te_map_remap_pallas, use_pallas_remap
    if use_pallas and use_pallas_remap(ncol):
        # fused per-column-block kernel in the natural (k, ncol) layout —
        # no transposes, one program for pt + tracers + u + v
        r2 = lambda a, nk: a.reshape((nk, ncol))
        cen, u2, v2 = te_map_remap_pallas(
            r2(pe, km + 1), r2(pe_tgt, km + 1),
            r2(0.5 * (pe + south_shift(pe)), km + 1),
            r2(0.5 * (pe_tgt + south_shift(pe_tgt)), km + 1),
            r2(0.5 * (pe + jnp.roll(pe, 1, axis=-1)), km + 1),
            r2(0.5 * (pe_tgt + jnp.roll(pe_tgt, 1, axis=-1)), km + 1),
            [r2(f, km) for f in cen_fields],
            r2(state.u, km), r2(state.v, km), kord)
        cen = [f.reshape((km, jm, im)) for f in cen]
        u_new = u2.reshape((km, jm, im))
        v_new = v2.reshape((km, jm, im))
    else:
        def flat(a, nk):
            return a.reshape((nk, ncol)).T            # (ncol, nk)

        def unflat(a, nk):
            return a.T.reshape((nk, jm, im))

        pe_s = flat(pe, km + 1)
        pe_t = flat(pe_tgt, km + 1)

        # pt + all tracers share the center interfaces: one multi-field
        # remap (search masks computed once — SURVEY §2.3 P6)
        remapped = ppm_remap_multi(
            pe_s, jnp.stack([flat(f, km) for f in cen_fields]), pe_t, kord)
        cen = [unflat(remapped[m], km) for m in range(len(cen_fields))]

        pe_su = flat(0.5 * (pe + south_shift(pe)), km + 1)
        pe_tu = flat(0.5 * (pe_tgt + south_shift(pe_tgt)), km + 1)
        u_new = unflat(ppm_remap(pe_su, flat(state.u, km), pe_tu, kord), km)
        pe_sv = flat(0.5 * (pe + jnp.roll(pe, 1, axis=-1)), km + 1)
        pe_tv = flat(0.5 * (pe_tgt + jnp.roll(pe_tgt, 1, axis=-1)), km + 1)
        v_new = unflat(ppm_remap(pe_sv, flat(state.v, km), pe_tv, kord), km)

    pt_new = cen[0]
    q_new = jnp.stack(cen[1:1 + nq], axis=0)
    delp_new = pe_tgt[1:] - pe_tgt[:-1]

    if consv:
        # recover pt from the remapped total energy bottom-up (the upstream
        # te_map's recovery loop): on the new coordinate,
        #   te_k = ke_k + Phi_{k+1} + cp*pt_k*pk_{k+1}
        # with Phi built hydrostatically from the surface; PPM conserves
        # the column integral of te exactly, so total energy is conserved
        # to roundoff.
        te_new = cen[1 + nq]
        pk_t = pe_tgt ** c.CAPPA
        ua, va = d2a_winds(u_new, v_new)
        ke_new = 0.5 * (ua ** 2 + va ** 2)

        def recover(phi_below, xs):
            te_k, ke_k, pk_bot, pk_top = xs
            pt_k = (te_k - ke_k - phi_below) / (c.CPAIR * pk_bot)
            phi_above = phi_below + c.CPAIR * pt_k * (pk_bot - pk_top)
            return phi_above, pt_k

        _, pt_rev = jax.lax.scan(
            recover, jnp.zeros((jm, im), state.pt.dtype),
            (te_new[::-1], ke_new[::-1], pk_t[1:][::-1], pk_t[:-1][::-1]),
            unroll=_UNROLL["recover"])
        pt_new = pt_rev[::-1]

    return state.replace(u=u_new, v=v_new, pt=pt_new, delp=delp_new, q=q_new)


def compute_vdot_gradp(state: DynState, grid: FVGrid, ptop: float):
    """Horizontal pressure-advection term v·∇p of the omega diagnostic
    (compute_vdot_gradp, dyn_comp.F90:2071-2098): the Lagrangian midpoint
    pressure change at a fixed grid point is the local tendency ∂p/∂t of
    the material layer, so ω = Dp/Dt = ∂p/∂t + v·∇p needs this advective
    term added. Centered spherical-metric differences on A-grid winds;
    pole rows carry no unique horizontal direction and are zeroed (the
    reference's cap treatment)."""
    from .cd_core import d2a_winds
    pe = pressure_vars(state.delp, ptop)[0]
    pmid = 0.5 * (pe[1:] + pe[:-1])
    ua, va = d2a_winds(state.u, state.v)
    cosp = jnp.asarray(grid.cosp)
    safe_cosp = jnp.where(cosp > 0, cosp, 1.0)[None, :, None]
    dpdx = (jnp.roll(pmid, -1, axis=-1) - jnp.roll(pmid, 1, axis=-1)) / \
        (2.0 * c.REARTH * safe_cosp * grid.dl)
    dpdy = (_rolly(pmid, -1) - _rolly(pmid, 1)) / \
        (2.0 * c.REARTH * grid.dp)
    vgp = ua * dpdx + va * dpdy
    vgp = wset_row(vgp, 0, 0.0)
    return wset_row(vgp, -1, 0.0)


def axial_angular_momentum(state: DynState, grid: FVGrid,
                           per_level: bool = False):
    """Axial (relative) angular momentum integral
    (the par_vecsum/shr_reprosum payload of the AM fixer,
    dyn_comp.F90:1952-2069): M = sum u·cosφ·dm over the sphere, with dm
    proportional to delp·cell-area. Deterministic on TPU (fixed reduction
    order — SURVEY §2.3 P11), so no reprosum machinery is needed.
    `per_level` returns the (km,) level-wise integrals (the reference's
    dons(k), :1984-1990)."""
    cose = jnp.asarray(grid.cose)[None, :, None]
    # u is edge-staggered: weight rows by the edge-centered area measure
    w = cose * grid.dl * grid.dp
    integrand = state.u * cose * state.delp * w
    if per_level:
        return jnp.sum(integrand, axis=(-2, -1))
    return jnp.sum(integrand)


def am_taper(coord: HybridCoord, tpr_h: float, tpr_w: float, km: int,
             high_order_top: bool):
    """AM-fixer pressure taper (dyn_comp.F90:1268-1272, 1960-1982):
    taper(k) = 1/(1 + (ptapk/avgpk(k))^xdlt2) with ptap = tpr_h − tpr_w/2,
    ptapk = ptap^κ, xdlt2 = 2/(κ·ln((ptap+tpr_w/2)/(ptap−tpr_w/2))); the
    reference's avgpk (global cose-weighted mean p^κ) is evaluated on the
    static hybrid reference pressures. Levels 1..km/8 are zeroed unless
    high_order_top (:1979-1982)."""
    ptap = tpr_h - 0.5 * tpr_w
    ptapk = ptap ** c.CAPPA
    xdlt2 = 2.0 / (jnp.log((ptap + 0.5 * tpr_w) /
                           (ptap - 0.5 * tpr_w)) * c.CAPPA)
    pref = coord.ak + coord.bk * coord.ps0
    avgpk = (0.5 * (pref[1:] + pref[:-1])) ** c.CAPPA
    taper = 1.0 / (1.0 + (ptapk / avgpk) ** xdlt2)
    if not high_order_top:
        kmtp = km // 8
        taper = jnp.where(jnp.arange(km) < kmtp, 0.0, taper)
    return taper


def am_fixer(state: DynState, grid: FVGrid, am0, taper=None,
             lbl: bool = False):
    """Restore the pre-step axial AM by a cosφ-shaped wind increment
    (dyn_comp.F90:1994-2051). `am0` is the pre-step AM: global scalar, or
    (km,) per-level when `lbl` (the am_fix_lbl level-by-level fixer).
    `taper` is the (km,) pressure taper (am_taper; the reference forces
    tapering on for the global fixer, :1268-1272). Returns
    (new_state, du_fix) with du_fix the applied (km,) increment
    coefficients (the du_fix_s diagnostic, :2043-2046)."""
    cose = jnp.asarray(grid.cose)[None, :, None]
    w = cose * grid.dl * grid.dp
    km = state.km
    tpr = jnp.ones((km,), state.u.dtype) if taper is None else taper
    don_k = axial_angular_momentum(state, grid, per_level=True) - am0
    dod_k = jnp.sum(cose * cose * state.delp * w, axis=(-2, -1))
    if lbl:
        du_k = -(don_k / dod_k) * tpr                    # (:1994-2002)
    else:
        # global fixer: taper weights the level integrals, then one global
        # ratio shaped by taper(k)·cosφ (:2023-2046)
        am1 = jnp.sum(don_k * tpr)
        me0 = jnp.maximum(jnp.sum(dod_k * tpr), 1e-30)
        du_k = -(am1 / me0) * tpr
    du = du_k[:, None, None] * cose
    u_new = (state.u + du) * (cose > 0)
    return state.replace(u=u_new), du_k


def mountain_torque(state: DynState, phis, grid: FVGrid, ptop: float):
    """Discrete axial mountain (pressure) torque, in the AM units of
    axial_angular_momentum per second.

    Leibniz on the column-integrated zonal PGF gives
    ∫−∂Φ/∂x dp = −∂x∫Φ dp + Φs·∂x ps; the first term telescopes zonally,
    so the only physical net torque is Σ Φs·δx(ps) — the resolved form
    drag. This is the AM source the continuous equations permit between
    physics updates; am_correction closes the discrete budget against it
    (reference flag: fv_am_correction, /root/reference/fv/dyn_comp.F90:197,
    362; the in-step terms live in upstream cd_core, not shipped — see
    VALIDATION.md for the deviation statement)."""
    pe, _, _, _ = pressure_vars(state.delp, ptop)
    ps = pe[-1]                                    # (jm, im)
    cosp = jnp.asarray(grid.cosp)[:, None]
    dpsdx = (jnp.roll(ps, -1, axis=-1) - jnp.roll(ps, 1, axis=-1)) * 0.5 / \
        (c.REARTH * jnp.where(cosp > 0, cosp, 1.0) * grid.dl)
    # force per unit mass ∝ phis·δx(ps)/delp on the bottom layer; in AM
    # units: Σ F·cosφ·delp·(cosφ dl dp) with the delp cancelling
    w_c = cosp * grid.dl * grid.dp
    return jnp.sum(phis * dpsdx * cosp * w_c * (cosp > 0))


def benergy(state: DynState, grid: FVGrid, ptop: float):
    """Global total-energy integral before dynamics (upstream benergy
    contract, dyn_comp.F90:1327-1329): area-weighted sum of
    cp·Tv + K over mass."""
    pe, pk, pkz, peln = pressure_vars(state.delp, ptop)
    tv = state.pt * pkz
    from .cd_core import d2a_winds
    ua, va = d2a_winds(state.u, state.v)
    ke = 0.5 * (ua ** 2 + va ** 2)
    w = jnp.asarray(grid.cosp).at[0].set(grid.acap / grid.im) \
        .at[-1].set(grid.acap / grid.im)[None, :, None]
    return jnp.sum(w * state.delp * (c.CPAIR * tv + ke))


def dyn_run(state: DynState, grid: FVGrid, coord: HybridCoord, phis,
            cfg: FVConfig, ndt: float, filter_impl: str = "fft",
            c_sw_pgf: bool | None = None, mesh=None,
            return_diags: bool = False):
    """One large dynamics timestep (dyn_run, dyn_comp.F90:742-2823).

    Subcycle factorization per dyn_comp.F90:1497-1524:
        n2 = (nspltrac + nv - 1)//nv ; nsplit = (ns + n2*nv - 1)//(n2*nv)
        dt = ndt/(nsplit*n2*nv)

    `c_sw_pgf=None` takes the config's setting; the flag and the auto
    split count move together (cfg.resolved_splits halves ns0 when the
    full C half step is on), so overriding one without the other is only
    for experiments.
    """
    if cfg.filtcw < 0:
        # the C-wind polar filter is load-bearing here (see FVConfig.filtcw)
        raise NotImplementedError(
            "FVConfig.filtcw < 0 (disable the C-grid wind filter) is not "
            "supported: the filter is load-bearing for this solver's c_sw "
            "half step (cd_core.py:289-306)")
    # high_altitude (WACCM-X, /root/reference/fv/dyn_comp.F90:2371-2489):
    # composition-dependent κ rides through trac2d as an extra tracer
    # (high_alt1 block, :2371-2383), then pt is corrected first-order for
    # the κ change implied by the ADVECTED major species vs the advected κ
    # itself (high_alt2 block, :2461-2486) — see tracer_cycle below. The
    # κ(composition) closure is ops/thermo.calc_kappav
    # (cam_thermo_calc_kappav role); FVConfig.major_species locates the
    # advected major species in q.
    if c_sw_pgf is None:
        c_sw_pgf = cfg.c_sw_pgf
    if cfg.use_pallas == "auto":
        from ...ops.pallas_kernels import use_pallas as _up
        use_pallas = _up()
    else:
        use_pallas = bool(cfg.use_pallas)
    ns, nspltrac, nv = cfg.resolved_splits(ndt, grid.im, grid.jm)
    n2 = (nspltrac + nv - 1) // nv
    nsplit = (ns + n2 * nv - 1) // (n2 * nv)
    dt = ndt / (nsplit * n2 * nv)
    ptop = coord.ptop

    # div24del2flag mapping (fv_div24del2flag, dyn_comp.F90:190-192):
    # 2 = del2 div, 4 = del4 div, 24 = both, 42 = del4 div + del2 velocity;
    # repo extension 22 = del2 div + del2 velocity (see FVConfig).
    flag = cfg.div24del2flag
    if flag not in (2, 4, 22, 24, 42):
        raise ValueError(f"div24del2flag must be one of 2/4/24/42 "
                         f"(or repo extension 22), got {flag}")
    div2_on = flag in (2, 22, 24)
    div4_nd = cfg.div4_coef_nd if flag in (4, 24, 42) else 0.0
    del2_vel = cfg.del2coef if flag in (22, 42) else 0.0
    if div2_on and cfg.div_damp_top_taper:
        # reference sponge profile tau/128 with tau = max(1, 8(1+tanh
        # ln(ptop/p))), evaluated at the hybrid reference mid-pressures
        pref = coord.ak + coord.bk * coord.ps0
        pmid_ref = 0.5 * (pref[1:] + pref[:-1])
        tau = jnp.maximum(1.0, 8.0 * (1.0 + jnp.tanh(
            jnp.log(ptop / pmid_ref))))
        div_taper = tau / 128.0
    else:
        div_taper = None

    # AM-fixer taper + am_diag accumulators (du_fix_s / du3s roles,
    # dyn_comp.F90:2043-2057; consumed by the fv_diag_am_calc equivalent).
    # duf is a scalar dummy when am_diag is off so the scan carry keeps a
    # uniform structure at zero cost.
    if cfg.am_fixer and (cfg.am_fix_taper or not cfg.am_fix_lbl):
        fix_taper = am_taper(coord, cfg.am_fix_tpr_h, cfg.am_fix_tpr_w,
                             state.km, cfg.high_order_top)
    else:
        fix_taper = None
    duf_init = jnp.zeros((state.km,), state.u.dtype) if cfg.am_diag \
        else jnp.zeros((), state.u.dtype)
    u_in = state.u

    def _floor_count(delp_new, delp_old):
        # thickness-floor activation telemetry (VALIDATION.md deviation
        # list): the 0.05·dp floors in the C/D transport steps and trac2d
        # clamp delp_new AT exactly 0.05·delp_old, so counting near-equality
        # post hoc covers the XLA and fused-Pallas paths identically without
        # extra kernel outputs. Healthy trajectories must count 0
        # (tests/test_floor_telemetry.py asserts it).
        return jnp.sum(delp_new <= 0.05 * delp_old * (1.0 + 1e-10)
                       ).astype(jnp.int32)

    def tracer_cycle(carry, _):
        st, duf0, nfl0 = carry
        dp0 = st.delp
        zx = jnp.zeros_like(st.delp)
        acc0 = dict(cx=zx, cy=zx, mfx=zx, mfy=zx)

        def small_step(carry, _):
            st_i, acc, duf, nfl = carry
            delp_before = st_i.delp
            am0 = (axial_angular_momentum(st_i, grid, per_level=True)
                   if cfg.am_fixer or cfg.am_correction else None)
            # am_correction (fv_am_correction, dyn_comp.F90:197/362): the
            # reference threads don/dod SW-equation correction terms through
            # upstream cd_core (not shipped); the TPU-native equivalent
            # closes the discrete in-step AM budget against the resolved
            # mountain torque — the only AM source the continuous equations
            # permit between physics updates (see mountain_torque)
            tq = (mountain_torque(st_i, phis, grid, ptop)
                  if cfg.am_correction else None)
            st_i, d = cd_step(st_i, grid, ptop, phis, dt,
                              iord=cfg.iord, jord=cfg.jord,
                              dyn_filter=cfg.fft_flt >= 0,
                              filter_impl=filter_impl,
                              c_sw_pgf=c_sw_pgf,
                              filter_dm=cfg.filter_dm,
                              filter_csw_dm=cfg.filter_csw_dm,
                              ke_method=cfg.ke_method,
                              div2_coef_nd=cfg.div2_coef_nd,
                              div2_on=div2_on, div4_coef_nd=div4_nd,
                              div_taper=div_taper,
                              del2_velocity=del2_vel,
                              use_pallas=use_pallas, mesh=mesh)
            if cfg.am_correction:
                # in-step budget closure: AM_after = AM_before + dt·torque
                # exactly; the torque enters through the surface layer. When
                # the fixer is also on, one torque-adjusted projection
                # serves both roles (a subsequent plain fixer would wrongly
                # undo the physical mountain torque).
                am_tgt = am0.at[-1].add(dt * tq)
                st_i, du_k = am_fixer(
                    st_i, grid, am_tgt,
                    taper=fix_taper if cfg.am_fixer else None,
                    lbl=cfg.am_fixer and cfg.am_fix_lbl)
                duf = duf + du_k if cfg.am_diag else duf
            elif cfg.am_fixer:
                # AM restoration per small step (dyn_comp.F90:1952-2069),
                # tapered (the reference forces tapering for the global
                # fixer) and per-level when am_fix_lbl
                st_i, du_k = am_fixer(st_i, grid, am0, taper=fix_taper,
                                      lbl=cfg.am_fix_lbl)
                duf = duf + du_k if cfg.am_diag else duf
            acc = dict(cx=acc["cx"] + d["cx"], cy=acc["cy"] + d["cy"],
                       mfx=acc["mfx"] + d["mfx"], mfy=acc["mfy"] + d["mfy"])
            nfl = nfl + _floor_count(st_i.delp, delp_before)
            return (st_i, acc, duf, nfl), None

        (st, acc, duf, nfl), _ = jax.lax.scan(
            small_step, (st, acc0, duf0, nfl0), None, length=nsplit,
            unroll=_UNROLL["small"])
        if cfg.high_altitude:
            # high_alt1 (dyn_comp.F90:2371-2383): κ(composition at cycle
            # entry) rides trac2d as an extra tracer slot alongside the
            # major species (the reference overwrites its sacrificial last
            # tracer with cap3vc; here the slot is appended)
            from ...ops.thermo import calc_kappav
            kap0 = calc_kappav(st.q, cfg.major_species)
            q_tr = jnp.concatenate([st.q, kap0[None]], axis=0)
        else:
            q_tr = st.q
        q_new, dp_tr = trac2d(q_tr, dp0, acc["cx"], acc["cy"], acc["mfx"],
                              acc["mfy"], grid, cfg.iord, cfg.jord,
                              use_pallas=use_pallas, mesh=mesh)
        nfl = nfl + _floor_count(dp_tr, dp0)
        if cfg.high_altitude:
            # high_alt2 (dyn_comp.F90:2461-2486): recompute κ from the
            # ADVECTED major species and correct pt first-order for the
            # difference vs the advected κ field:
            #   pt *= 1 − ln(p_mid)·(κ_new − κ_adv)
            # with ln(p_mid) = ½(ln pe_k + ln pe_k+1) on the post-step
            # Lagrangian edges (the reference's pexy→pe transpose point).
            q_new, kap_adv = q_new[:-1], q_new[-1]
            kap_new = calc_kappav(q_new, cfg.major_species)
            pe_ha = pressure_vars(st.delp, ptop)[0]
            lnpm = 0.5 * (jnp.log(pe_ha[1:]) + jnp.log(pe_ha[:-1]))
            st = st.replace(pt=st.pt * (1.0 - lnpm * (kap_new - kap_adv)))
        return (st.replace(q=q_new), duf, nfl), None

    def remap_cycle(carry, _):
        st, duf0, nfl0 = carry
        # omega diagnostic (the reference's omga accumulation +
        # compute_vdot_gradp role, dyn_comp.F90:2071-2098): between remaps
        # the hybrid layers are material surfaces, so the Lagrangian
        # mid-pressure change over the cycle IS ω = Dp/Dt at midpoints.
        pe0 = pressure_vars(st.delp, ptop)[0]
        pmid0 = 0.5 * (pe0[1:] + pe0[:-1])
        (st, duf, nfl), _ = jax.lax.scan(tracer_cycle, (st, duf0, nfl0),
                                         None, length=n2,
                                         unroll=_UNROLL["cycles"])
        pe1 = pressure_vars(st.delp, ptop)[0]
        pmid1 = 0.5 * (pe1[1:] + pe1[:-1])
        # ω = ∂p/∂t (material-layer midpoint change at fixed grid point)
        # + v·∇p (compute_vdot_gradp, dyn_comp.F90:2071-2098)
        omega = (pmid1 - pmid0) * (nv / ndt) + \
            compute_vdot_gradp(st, grid, ptop)
        st = te_map(st, coord, grid, ptop, kord=cfg.kord, consv=cfg.conserve,
                    use_pallas=use_pallas)
        return (st, duf, nfl), omega

    (state, duf_s, n_floor), omegas = jax.lax.scan(
        remap_cycle, (state, duf_init, jnp.zeros((), jnp.int32)), None,
        length=nv, unroll=_UNROLL["cycles"])
    if return_diags:
        diags = {"omega": omegas[-1], "floor_activations": n_floor}
        if cfg.am_diag:
            # am_diag payload (dp_coupling.F90:281-310 / fv_diag_am_calc):
            # total dynamics wind increment, the fixer's per-level
            # coefficients, and the AM integrals of each
            du3s = state.u - u_in
            cose = jnp.asarray(grid.cose)[None, :, None]
            w = cose * grid.dl * grid.dp
            diags["AM_DU3S"] = jnp.sum(du3s * cose * state.delp * w)
            diags["AM_DUFIX"] = jnp.sum(
                duf_s[:, None, None] * cose * cose * state.delp * w)
            diags["AM_TOTAL"] = axial_angular_momentum(state, grid)
            diags["du3s"] = du3s
            diags["du_fix_s"] = duf_s
        return state, diags
    return state
