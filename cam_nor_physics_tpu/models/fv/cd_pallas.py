"""Fused Pallas TPU path for cd_step: 4 kernels per small step.

The XLA lowering of cd_step runs ~95 fusions + 13 custom calls per call
(measured at 144x96x26); through the axon runtime each kernel carries large
fixed overhead, so the small step is launch-bound, not compute-bound.
This module fuses every per-level chain — INCLUDING the k-coupled
hydrostatic thermodynamics — into four per-level Pallas programs:

    K1  c_sw half step: D->A->C winds, C-grid Courants, tp2c/tp2d transport,
        thickness/pt floors, then the DOWNWARD pressure integration
        (pe/pk/ln pe carried in VMEM scratch across the sequential TPU
        grid)                             -> pt_h, uc0, vc0, pkz_h, dgz_h
    K2  grid REVERSED (k=km-1..0): UPWARD geopotential integration (wz
        carry, seeded with phis), C-grid PGF kick + polar filter
        (in-kernel DFT matmul) + D Courants          -> uc, crx, cry
    K3  D-grid tp2c/tp2d transport + floors + downward pressure pass
                                  -> delp', pt', mfx, mfy, pkz', dgz'
    K4  grid REVERSED: upward wz carry -> phi_m in-kernel, vector-invariant
        wind update: vorticity fluxes (ytp/xtp), KE, PGF, div2/del2
        damping, polar filter                            -> u', v'

The k-coupled integrations exploit the TPU's SEQUENTIAL grid execution:
a (rows, im) VMEM scratch persists across grid steps, so the downward
cumulative pressure and the upward geopotential build level-by-level
inside the same program that consumes them — no XLA cumsum/pow/log glue
(which lowered to reduce-window fusions + dozens of extra launches per
small step) and no (km+1)-slab HBM round trips between kernels.

The polar filter runs inside K2/K4 as a two-sided real-DFT matmul on the MXU
(HIGHEST precision): filtered = ((A@Fc) * resp) @ Gc + ((A@Fs) * resp) @ Gs,
identical to the rfft form to ~1e-13 relative in f64 (verified) and to f32
roundoff on-chip. The DFT factor matrices ride on FVGrid as pytree leaves so
the executable stays free of array constants (see grid.py).

Numerics: same formulas as cd_core.cd_step; differences vs the XLA path are
the DFT-vs-FFT, MXU-vs-VPU roundoff, and the carry-vs-cumsum association of
the pressure sum (sequential carry == cumsum([ptop; delp]) exactly; the XLA
path's ptop + cumsum(delp) differs by ~1e-6 relative f32 / ~1e-15 f64).
Dispatched by cd_step when the fused path supports the requested flags.

Reference: cd_core contract at /root/reference/fv/dyn_comp.F90:1926-1941.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ...ops import tp_core as tp
from ...ops.pallas_kernels import (_band_ffsl, _tpu_params, band_plan,
                                   use_pallas)
from ...ops.tp_core import _rollx, _rolly, edge_north, wset_interior, wset_row
from ...utils import constants as c
from .grid import FVGrid


_LOWER_OK_CACHE: dict = {}


def fused_lowering_ok(state, grid, ptop, phis, dt, iord, jord, div2_coef_nd,
                      dyn_filter, ke_method, del2_velocity, div2_on,
                      div4_coef_nd, div_taper) -> bool:
    """Fail-safe gate: try-lower the fused step ONCE per (shape, flags,
    backend) and fall back to the XLA path instead of crashing the run if
    Mosaic rejects a kernel (the round-2 failure mode: every CPU test runs
    interpret=True, which skips Mosaic lowering entirely, so a TPU-only
    lowering break otherwise surfaces first inside the production step).

    Cheap after the first call (dict hit); the first call costs one
    jit-lower (no compile) on abstract inputs."""
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "?"
    if backend != "tpu":
        return True          # interpret/CPU paths never hit Mosaic lowering
    km, jm, im = state.delp.shape
    key = (backend, km, jm, im, str(state.delp.dtype), iord, jord,
           bool(dyn_filter), ke_method, float(del2_velocity), bool(div2_on),
           float(div4_coef_nd), div_taper is not None)
    hit = _LOWER_OK_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        sds = lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a))

        def run(st, gr, ph, tp_):
            return cd_step_fused(st, gr, float(ptop), ph, dt, iord, jord,
                                 div2_coef_nd, dyn_filter, ke_method,
                                 del2_velocity, div2_on=div2_on,
                                 div4_coef_nd=div4_coef_nd, div_taper=tp_)

        # grid/state leaves may be tracers of an enclosing jit — abstract
        # everything to ShapeDtypeStructs so this nested lower is
        # standalone (no captured tracers). ptop is a static aux scalar
        # (HybridCoord.ptop) and stays concrete: the in-kernel pressure
        # carry needs it at trace time.
        jax.jit(run).lower(
            *jax.tree.map(sds, (state, grid, phis, div_taper)))
        ok = True
    except Exception as e:  # noqa: BLE001 — any lowering failure => XLA path
        import warnings
        warnings.warn(
            f"fused cd_step failed TPU lowering ({type(e).__name__}: {e}); "
            "falling back to the XLA path", stacklevel=2)
        ok = False
    _LOWER_OK_CACHE[key] = ok
    return ok


def use_fused_cd(grid, dyn_filter: bool, c_sw_pgf: bool, ke_method: str,
                 filter_impl: str, return_debug: bool) -> bool:
    if return_debug or not c_sw_pgf:
        return False
    if filter_impl not in ("fft", "dft"):
        return False          # matmul-circulant impl stays on the XLA path
    if ke_method not in ("centered", "avg_sq", "upwind"):
        return False
    if getattr(grid, "dft_fc", None) is None:
        return False          # grid built before the DFT tables existed
    if not use_pallas():
        return False
    # whole-slab or j-banded (band_plan); [] = banding infeasible (im too
    # wide for a useful band under the VMEM cap) -> XLA path
    return band_plan(grid.jm, grid.im) != []


# ---------------------------------------------------------------------------
# in-kernel helpers (all on (jm, im) slabs; row tables are (jm,) values)
# ---------------------------------------------------------------------------

def _dft_filter(a, fc, fs, gc, gs, resp):
    """Polar filter as two-sided real-DFT matmuls (MXU, HIGHEST precision)."""
    hi = jax.lax.Precision.HIGHEST
    sr = jnp.dot(a, fc, precision=hi) * resp
    si = jnp.dot(a, fs, precision=hi) * resp
    return jnp.dot(sr, gc, precision=hi) + jnp.dot(si, gs, precision=hi)


def _d2a(u, v):
    ua = wset_interior(jnp.zeros_like(u), 0.5 * (u + _rolly(u, -1)))
    va = 0.5 * (v + _rollx(v, -1))
    va = wset_row(wset_row(va, 0, 0.0), -1, 0.0)
    return ua, va


def _corner_from_center(a):
    a_w = _rollx(a, 1)
    cor = 0.25 * ((a + a_w) + _rolly(a + a_w, 1))
    return wset_row(cor, 0, 0.0)


def _vc_at_uc(vc):
    vc_c = 0.5 * (vc + edge_north(vc))
    return 0.5 * (vc_c + _rollx(vc_c, 1))


def _uc_at_vc(uc):
    return wset_row(0.5 * (uc + _rolly(uc, 1)), 0, 0.0)


def _tp_pair(va, delp, pt, crx, cry, yfx, cosp, acosp, rcap, iord, jord, jm,
             ffsl, band=None):
    ddp, mfx_k, mfy_k = tp.tp2c(va, delp, crx, cry, iord, jord, crx, yfx,
                                cosp, acosp, rcap, ffsl, band=band)
    fx_pt, fy_pt = tp.tp2d(va, pt, crx, cry, iord, jord, mfx_k, mfy_k,
                           cosp, ffsl, 1, band=band)
    dpt = fx_pt - tp._rollx(fx_pt, -1) + \
        (fy_pt - tp.edge_north(fy_pt)) * acosp[:, None]
    dpt = tp.wset_row(dpt, 0, -jnp.sum(fy_pt[1, :]) * rcap)
    dpt = tp.wset_row(dpt, -1, jnp.sum(fy_pt[jm - 1, :]) * rcap)
    return ddp, dpt, mfx_k, mfy_k


# ---------------------------------------------------------------------------
# K1: c_sw half step
# ---------------------------------------------------------------------------

def _down_thermo(delp_new, pt_new, pe_s, pk_s, pl_s, ptop):
    """Downward hydrostatic pressure pass, one level per sequential grid
    step. Scratch carries (pe, pe^kappa, ln pe) at the layer TOP edge;
    returns (pkz, dgz) for this layer. Association matches
    cumsum([ptop; delp]) exactly (see module docstring)."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        pe_s[...] = jnp.full(pe_s.shape, ptop, pe_s.dtype)
        pk_s[...] = jnp.full(pk_s.shape, ptop ** c.CAPPA, pk_s.dtype)
        pl_s[...] = jnp.full(pl_s.shape, math.log(ptop), pl_s.dtype)

    pe_top, pk_top, pl_top = pe_s[...], pk_s[...], pl_s[...]
    pe_bot = pe_top + delp_new
    pk_bot = pe_bot ** c.CAPPA
    pl_bot = jnp.log(pe_bot)
    pkz = (pk_bot - pk_top) / (c.CAPPA * (pl_bot - pl_top))
    dgz = c.CPAIR * pt_new * (pk_bot - pk_top)
    pe_s[...] = pe_bot
    pk_s[...] = pk_bot
    pl_s[...] = pl_bot
    return pkz, dgz


def _up_geopotential(dgz, phis, wz_s):
    """Upward geopotential pass under a REVERSED grid (k=km-1..0): wz
    carry seeded with the surface geopotential; returns the layer-mean
    phi_m = 0.5*(wz_top + wz_bot) — identical association to the XLA
    glue's flip-cumsum."""
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        wz_s[...] = phis

    wz_bot = wz_s[...]
    wz_top = wz_bot + dgz
    wz_s[...] = wz_top
    return 0.5 * (wz_top + wz_bot)


def _k1_kernel(u_ref, v_ref, pt_ref, delp_ref, cosp_ref, acosp_ref, cose_ref,
               pth_ref, uc0_ref, vc0_ref, pkzh_ref, dgzh_ref,
               pe_s, pk_s, pl_s,
               *, dt5, dl, dp_, rcap, ptop, jm, band=None):
    u, v = u_ref[0], v_ref[0]
    pt, delp = pt_ref[0], delp_ref[0]
    cosp, acosp, cose = cosp_ref[0], acosp_ref[0], cose_ref[0]

    ua, va = _d2a(u, v)
    uc0 = 0.5 * (ua + _rollx(ua, 1))
    vc0 = wset_row(0.5 * (va + _rolly(va, 1)), 0, 0.0)

    safe_cosp = jnp.where(cosp > 0, cosp, 1.0)[:, None]
    crx_c = uc0 * dt5 / (c.REARTH * safe_cosp * dl)
    crx_c = wset_row(wset_row(crx_c, 0, 0.0), -1, 0.0)
    cry_c = wset_row(vc0 * dt5 / (c.REARTH * dp_), 0, 0.0)
    yfx_c = cry_c * cose[:, None]
    va_c2 = 0.5 * (cry_c + edge_north(cry_c))
    ffsl_c = jnp.max(jnp.abs(crx_c), axis=-1) > 1.0

    ddp_c, dpt_c, _, _ = _tp_pair(va_c2, delp, pt, crx_c, cry_c, yfx_c,
                                  cosp, acosp, rcap, 1, 1, jm, ffsl_c,
                                  band=band)

    delp_h = jnp.maximum(delp + ddp_c, 0.05 * delp)
    pt_h = (pt * delp + dpt_c) / delp_h
    pt_h = jnp.maximum(pt_h, 0.1 * pt)

    pkz_h, dgz_h = _down_thermo(delp_h, pt_h, pe_s, pk_s, pl_s, ptop)

    pth_ref[0] = pt_h
    uc0_ref[0] = uc0
    vc0_ref[0] = vc0
    pkzh_ref[0] = pkz_h
    dgzh_ref[0] = dgz_h


# ---------------------------------------------------------------------------
# K2: C-grid PGF kick + filter + D Courants
# ---------------------------------------------------------------------------

def _k2_kernel(pth_ref, pkzh_ref, dgzh_ref, uc0_ref, vc0_ref, phis_ref,
               cosp_ref, f0_ref, fc_ref, cose_ref,
               fc_m_ref, fs_m_ref, gc_m_ref, gs_m_ref, rspc_ref, rspe_ref,
               uc_ref, crx_ref, cry_ref,
               wz_s,
               *, dt, dt5, dl, dp_, dyn_filter, jm):
    pt_h, pkz_h = pth_ref[0], pkzh_ref[0]
    uc0, vc0 = uc0_ref[0], vc0_ref[0]
    phi_h = _up_geopotential(dgzh_ref[0], phis_ref[...], wz_s)
    en_h = phi_h + c.CPAIR * pt_h * pkz_h
    cosp, f0, fc_e, cose = (cosp_ref[0], f0_ref[0], fc_ref[0], cose_ref[0])
    safe_cosp = jnp.where(cosp > 0, cosp, 1.0)[:, None]

    dx_en = (en_h - _rollx(en_h, 1)) / (c.REARTH * safe_cosp * dl)
    dx_th = (pt_h - _rollx(pt_h, 1)) / (c.REARTH * safe_cosp * dl)
    pi_u = 0.5 * (pkz_h + _rollx(pkz_h, 1))
    pgf_u = -(dx_en - c.CPAIR * pi_u * dx_th)
    pgf_u = wset_row(wset_row(pgf_u, 0, 0.0), -1, 0.0)

    dy_en = wset_row((en_h - _rolly(en_h, 1)) / (c.REARTH * dp_), 0, 0.0)
    dy_th = wset_row((pt_h - _rolly(pt_h, 1)) / (c.REARTH * dp_), 0, 0.0)
    pi_v = wset_row(0.5 * (pkz_h + _rolly(pkz_h, 1)), 0, pkz_h)
    pgf_v = wset_row(-(dy_en - c.CPAIR * pi_v * dy_th), 0, 0.0)

    duc = dt5 * (f0[:, None] * _vc_at_uc(vc0) + pgf_u)
    dvc = dt5 * (-fc_e[:, None] * _uc_at_vc(uc0) + pgf_v)
    if dyn_filter:
        fc_m, fs_m = fc_m_ref[...], fs_m_ref[...]
        gc_m, gs_m = gc_m_ref[...], gs_m_ref[...]
        duc = _dft_filter(duc, fc_m, fs_m, gc_m, gs_m, rspc_ref[...])
        dvc = _dft_filter(dvc, fc_m, fs_m, gc_m, gs_m, rspe_ref[...])
    uc = uc0 + duc
    vc = vc0 + dvc

    crx = uc * dt / (c.REARTH * safe_cosp * dl)
    crx = wset_row(wset_row(crx, 0, 0.0), -1, 0.0)
    cry = wset_row(vc * dt / (c.REARTH * dp_), 0, 0.0)

    uc_ref[0] = uc
    crx_ref[0] = crx
    cry_ref[0] = cry


# ---------------------------------------------------------------------------
# K3: D-grid transport
# ---------------------------------------------------------------------------

def _k3_kernel(delp_ref, pt_ref, crx_ref, cry_ref, cosp_ref, acosp_ref,
               cose_ref,
               delpn_ref, ptn_ref, mfx_ref, mfy_ref, pkz_ref, dgz_ref,
               pe_s, pk_s, pl_s,
               *, iord, jord, rcap, ptop, jm, band=None):
    delp, pt = delp_ref[0], pt_ref[0]
    crx, cry = crx_ref[0], cry_ref[0]
    cosp, acosp, cose = cosp_ref[0], acosp_ref[0], cose_ref[0]

    yfx = cry * cose[:, None]
    va_c = 0.5 * (cry + edge_north(cry))
    ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0

    ddp, dpt, mfx_k, mfy_k = _tp_pair(va_c, delp, pt, crx, cry, yfx, cosp,
                                      acosp, rcap, iord, jord, jm, ffsl,
                                      band=band)
    delp_new = jnp.maximum(delp + ddp, 0.05 * delp)
    pt_new = (pt * delp + dpt) / delp_new

    pkz, dgz = _down_thermo(delp_new, pt_new, pe_s, pk_s, pl_s, ptop)

    delpn_ref[0] = delp_new
    ptn_ref[0] = pt_new
    mfx_ref[0] = mfx_k
    mfy_ref[0] = mfy_k
    pkz_ref[0] = pkz
    dgz_ref[0] = dgz


# ---------------------------------------------------------------------------
# K4: vector-invariant wind update
# ---------------------------------------------------------------------------

def _k4_kernel(u_ref, v_ref, ptn_ref, pkz_ref, dgz_ref, phis_ref, crx_ref,
               cry_ref,
               uc_ref, cosp_ref, cose_ref, cosen_ref, f0_ref, nu2_ref,
               fc_m_ref, fs_m_ref, gc_m_ref, gs_m_ref, rspc_ref, rspe_ref,
               un_ref, vn_ref,
               wz_s,
               *, dt, dl, dp_, iord, jord, ke_method, div2_on, nu4,
               del2_velocity, dyn_filter, acap, jm, im, band=None):
    u, v = u_ref[0], v_ref[0]
    pt_new, pkz = ptn_ref[0], pkz_ref[0]
    phi_m = _up_geopotential(dgz_ref[0], phis_ref[...], wz_s)
    crx, cry, uc = crx_ref[0], cry_ref[0], uc_ref[0]
    cosp, cose, f0 = cosp_ref[0], cose_ref[0], f0_ref[0]
    cose_n = cosen_ref[0]

    ua, va = _d2a(u, v)

    # absolute vorticity at centers with polar-cap means
    u_n = wset_row(_rolly(u, -1), -1, 0.0)
    v_e = _rollx(v, -1)
    circ = (u * cose[:, None] - u_n * cose_n[:, None]) * dl * c.REARTH + \
        (v_e - v) * dp_ * c.REARTH
    area = c.REARTH ** 2 * cosp[:, None] * dl * dp_
    zeta = circ / jnp.where(area == 0.0, 1.0, area)
    cap_area = c.REARTH ** 2 * acap * dp_ * dl / im
    # no scalar/negative indexing of values (Mosaic lowers those to
    # dynamic_slice, which is unsupported): row reads use positive literals
    ucose = u * cose[:, None]
    circ_s = -jnp.sum(ucose[1, :] * dl * c.REARTH) / (im * cap_area)
    circ_n = jnp.sum(ucose[jm - 1, :] * dl * c.REARTH) / (im * cap_area)
    zeta = wset_row(zeta, 0, circ_s)
    zeta = wset_row(zeta, -1, circ_n)
    zeta_a = zeta + f0[:, None]

    if ke_method == "upwind":
        u_nn = wset_row(_rolly(u, -1), -1, 0.0)
        u_sel = jnp.where(va >= 0.0, u, u_nn)
        v_sel = jnp.where(ua >= 0.0, v, v_e)
        ke = wset_interior(0.5 * (ua ** 2 + va ** 2),
                           0.5 * (u_sel ** 2 + v_sel ** 2))
    elif ke_method == "avg_sq":
        u_nn = wset_row(_rolly(u, -1), -1, 0.0)
        ke_u = wset_interior(jnp.zeros_like(u), 0.5 * (u ** 2 + u_nn ** 2))
        ke_v = 0.5 * (v ** 2 + v_e ** 2)
        ke_v = wset_row(wset_row(ke_v, 0, 0.0), -1, 0.0)
        ke = 0.5 * (ke_u + ke_v)
    else:
        ke = 0.5 * (ua ** 2 + va ** 2)

    energy = ke + phi_m + c.CPAIR * pt_new * pkz

    ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0
    v_c4 = _corner_from_center(0.5 * (v + v_e))
    v_edge = 0.5 * (v_c4 + _rollx(v_c4, -1))
    fy_z = tp.ytp(zeta_a, cry, v_edge * dt, jord, 0)
    fx_z = tp.xtp(zeta_a, crx, uc * dt, cosp, ffsl, iord, 1, band=band)

    cose_s = jnp.where(cose[:, None] > 0, cose[:, None], 1.0)
    en_c = _corner_from_center(energy)
    th_c = _corner_from_center(pt_new)
    pi_c = _corner_from_center(pkz)
    dx_en = (_rollx(en_c, -1) - en_c) / (c.REARTH * cose_s * dl)
    dx_th = (_rollx(th_c, -1) - th_c) / (c.REARTH * cose_s * dl)
    pi_u = 0.5 * (pi_c + _rollx(pi_c, -1))
    du = fy_z - dt * (dx_en - c.CPAIR * pi_u * dx_th)
    du = wset_row(du, 0, 0.0)

    def dy_of(ac):
        return wset_interior(jnp.zeros_like(v),
                             (_rolly(ac, -1) - ac) / (c.REARTH * dp_))

    dy_en = dy_of(en_c)
    dy_th = dy_of(th_c)
    pi_v = wset_interior(jnp.zeros_like(v), 0.5 * (_rolly(pi_c, -1) + pi_c))
    dv = -fx_z - dt * (dy_en - c.CPAIR * pi_v * dy_th)
    dv = wset_row(wset_row(dv, 0, 0.0), -1, 0.0)

    # divergence damping (divergence at SW corners from the OLD winds):
    # del2 with a per-level coefficient row (nu2_ref, the model-top sponge
    # taper) and/or del4 (biharmonic) — same operator family as the
    # reference's cdx/cdy + cdx4/cdy4 tables (dynamics_vars.F90:205-208)
    u_w = _rollx(u, 1)
    vterm = v * cosp[:, None]
    div = (u - u_w) / (c.REARTH * cose_s * dl) + \
        (vterm - _rolly(vterm, 1)) / (c.REARTH * cose_s * dp_)
    div = wset_interior(jnp.zeros_like(u), div)
    damp = jnp.zeros_like(div)
    if div2_on:
        damp = damp + nu2_ref[0, 0][:, None] * div
    if nu4 > 0.0:
        rdx2d = 1.0 / (c.REARTH * cose_s * dl) ** 2
        rdy2d = 1.0 / (c.REARTH * dp_) ** 2
        lap_div = (_rollx(div, -1) - 2.0 * div + _rollx(div, 1)) * rdx2d
        lap_div = lap_div + wset_interior(
            jnp.zeros_like(div),
            (_rolly(div, -1) - 2.0 * div + _rolly(div, 1)) * rdy2d)
        lap_div = wset_interior(jnp.zeros_like(div), lap_div)
        # local-grid-scale coefficient L(j)⁴ (see cd_core.cd_step: uniform
        # Δy⁴ strength is polar-unstable); nu4 here is div4_coef_nd/dt
        l4 = (c.REARTH * jnp.minimum(dp_, cose_s * dl)) ** 4
        damp = damp - (nu4 * l4) * lap_div
    ddiv_x = (_rollx(damp, -1) - damp) / (c.REARTH * cose_s * dl)
    du = du + dt * ddiv_x
    ddiv_y = wset_interior(jnp.zeros_like(v),
                           (_rolly(damp, -1) - damp) / (c.REARTH * dp_))
    dv = dv + dt * ddiv_y

    if del2_velocity > 0.0:
        rdx2 = 1.0 / (c.REARTH * cose_s * dl) ** 2
        rdy2 = 1.0 / (c.REARTH * dp_) ** 2

        def lap(a):
            d2x = (_rollx(a, -1) - 2.0 * a + _rollx(a, 1)) * rdx2
            d2y = wset_interior(
                jnp.zeros_like(a),
                (_rolly(a, -1) - 2.0 * a + _rolly(a, 1)) * rdy2)
            return d2x + d2y

        du = du + dt * del2_velocity * lap(u)
        dv = dv + dt * del2_velocity * lap(v)

    if dyn_filter:
        fc_m, fs_m = fc_m_ref[...], fs_m_ref[...]
        gc_m, gs_m = gc_m_ref[...], gs_m_ref[...]
        du = _dft_filter(du, fc_m, fs_m, gc_m, gs_m, rspe_ref[...])
        dv = _dft_filter(dv, fc_m, fs_m, gc_m, gs_m, rspc_ref[...])

    un_ref[0] = u + du
    vn_ref[0] = v + dv


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _specs(km, jm, im, nf, dtype, reverse=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    # reverse=True runs the sequential TPU grid bottom-up (k=km-1..0) for
    # the upward geopotential carry (K2/K4)
    idx = (lambda k: (km - 1 - k, 0, 0)) if reverse else \
        (lambda k: (k, 0, 0))
    slab = pl.BlockSpec((1, jm, im), idx, memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, jm), lambda k: (0, 0), memory_space=pltpu.VMEM)
    # per-level rows ride as (km, 1, jm) so the block's last two dims (1, jm)
    # EQUAL the array dims — a (1, jm) block over (km, jm) violates Mosaic's
    # "divisible by 8 / equal to array dim" rule on the sublane axis (the
    # round-2 BENCH_r02 rc=1 regression)
    lvec = pl.BlockSpec((1, 1, jm), idx, memory_space=pltpu.VMEM)
    # k-constant (jm, im) plane (surface geopotential)
    plane = pl.BlockSpec((jm, im), lambda k: (0, 0), memory_space=pltpu.VMEM)
    m_f = pl.BlockSpec((im, nf), lambda k: (0, 0), memory_space=pltpu.VMEM)
    m_g = pl.BlockSpec((nf, im), lambda k: (0, 0), memory_space=pltpu.VMEM)
    m_r = pl.BlockSpec((jm, nf), lambda k: (0, 0), memory_space=pltpu.VMEM)
    return slab, vec, lvec, plane, m_f, m_g, m_r


def cd_step_fused(state, grid: FVGrid, ptop: float, phis, dt: float,
                  iord: int, jord: int, div2_coef_nd: float,
                  dyn_filter: bool, ke_method: str, del2_velocity: float,
                  interpret: bool = False, div2_on: bool = True,
                  div4_coef_nd: float = 0.0, div_taper=None):
    """Fused-Pallas cd_step (c_sw_pgf=True, filter_dm/csw_dm=False path).
    Same returns as cd_core.cd_step."""
    from jax.experimental import pallas as pl

    from ...ops.pallas_kernels import _run_banded

    u, v, pt, delp = state.u, state.v, state.pt, state.delp
    km, jm, im = delp.shape
    dtype = delp.dtype
    nf = im // 2 + 1
    dl, dp_ = grid.dl, grid.dp
    dt5 = 0.5 * dt
    # per-level del2 coefficient rows (model-top sponge taper; uniform when
    # div_taper is None) and the static del4 coefficient
    if div_taper is not None:
        c2_k = jnp.maximum(div2_coef_nd, jnp.asarray(div_taper, dtype))
    else:
        c2_k = jnp.full((km,), div2_coef_nd, dtype)
    nu2_rows = jnp.ones((km, 1, jm), dtype) * \
        (c2_k * (c.REARTH * dp_) ** 2 / dt)[:, None, None]
    nu4 = div4_coef_nd / dt      # kernel multiplies by the local L(j)⁴

    plan = band_plan(jm, im)

    def banded(make_kern, ins, kinds, n_out, nb_ffsl=None, reverse=False,
               n_scratch=0):
        """Run one fused kernel whole-slab or j-banded. `make_kern(jml,
        band)` builds the kernel for a jml-row slab with the per-slab FFSL
        restriction; `kinds` tags each input: 's' (km, jm, im) slab,
        'v' (1, jm) row vector, 'l' (km, 1, jm) per-level row vector,
        'p' (jm, im) k-constant plane, 'r' (jm, nf) filter response rows,
        'F'/'G' full DFT factor matrices. `reverse` runs the grid
        bottom-up; `n_scratch` (jml, im) VMEM scratch planes carry the
        sequential-k thermodynamic integrations."""
        from jax.experimental.pallas import tpu as pltpu

        def one(slo, shi, bnd):
            jml = shi - slo
            slab_l, vec_l, lvec_l, plane_l, m_f_l, m_g_l, m_r_l = _specs(
                km, jml, im, nf, dtype, reverse=reverse)
            spec_of = {'s': slab_l, 'v': vec_l, 'l': lvec_l, 'p': plane_l,
                       'r': m_r_l, 'F': m_f_l, 'G': m_g_l}
            sliced = []
            for a, k in zip(ins, kinds):
                if k in ('s', 'v'):
                    sliced.append(a[:, slo:shi])
                elif k == 'l':          # (km, 1, jm): j is the LAST axis
                    sliced.append(a[:, :, slo:shi])
                elif k in ('p', 'r'):
                    sliced.append(a[slo:shi])
                else:
                    sliced.append(a)
            out_sh = tuple(jax.ShapeDtypeStruct((km, jml, im), dtype)
                           for _ in range(n_out))
            return pl.pallas_call(
                make_kern(jml, bnd), grid=(km,),
                out_shape=out_sh,
                in_specs=[spec_of[k] for k in kinds],
                out_specs=tuple(slab_l for _ in range(n_out)),
                scratch_shapes=[pltpu.VMEM((jml, im), dtype)
                                for _ in range(n_scratch)],
                interpret=interpret,
                compiler_params=_tpu_params(),
            )(*sliced)

        if plan is None:
            return one(0, jm, nb_ffsl)
        return _run_banded(
            plan, lambda lo, hi, slo, shi: one(
                slo, shi, _band_ffsl(slo, shi, jm, nb_ffsl)))

    rows = lambda a: jnp.asarray(a, dtype)[None]
    cosp_r = rows(grid.cosp)
    acosp_r = rows(grid.acosp)
    cose_r = rows(grid.cose)
    f0_r = rows(grid.f0)
    fc_r = rows(grid.fc)
    cosen_r = jnp.concatenate([jnp.asarray(grid.cose, dtype)[1:],
                               jnp.asarray(grid.cose, dtype)[-1:]])[None]
    fc_m = jnp.asarray(grid.dft_fc, dtype)
    fs_m = jnp.asarray(grid.dft_fs, dtype)
    gc_m = jnp.asarray(grid.dft_gc, dtype)
    gs_m = jnp.asarray(grid.dft_gs, dtype)
    rspc = jnp.asarray(grid.pft_center, dtype)
    rspe = jnp.asarray(grid.pft_edge, dtype)

    phis_p = jnp.asarray(phis, dtype)

    # ---- K1 (down pass: c_sw half step + pressure integration) ----
    band5 = tp.ffsl_band(jm, dl, dt5)
    band1 = tp.ffsl_band(jm, dl, dt)
    pt_h, uc0, vc0, pkz_h, dgz_h = banded(
        lambda jml, bnd: partial(_k1_kernel, dt5=dt5, dl=dl, dp_=dp_,
                                 rcap=float(grid.rcap), ptop=float(ptop),
                                 jm=jml, band=bnd),
        (u, v, pt, delp, cosp_r, acosp_r, cose_r),
        "ssssvvv", 5, nb_ffsl=band5, n_scratch=3)

    # ---- K2 (up pass: geopotential carry + C-grid PGF + D Courants) ----
    uc, crx, cry = banded(
        lambda jml, bnd: partial(_k2_kernel, dt=dt, dt5=dt5, dl=dl, dp_=dp_,
                                 dyn_filter=dyn_filter, jm=jml),
        (pt_h, pkz_h, dgz_h, uc0, vc0, phis_p, cosp_r, f0_r, fc_r, cose_r,
         fc_m, fs_m, gc_m, gs_m, rspc, rspe),
        "ssssspvvvvFFGGrr", 3, reverse=True, n_scratch=1)

    # ---- K3 (down pass: D-grid transport + pressure integration) ----
    delp_new, pt_new, mfx, mfy, pkz, dgz = banded(
        lambda jml, bnd: partial(_k3_kernel, iord=iord, jord=jord,
                                 rcap=float(grid.rcap), ptop=float(ptop),
                                 jm=jml, band=bnd),
        (delp, pt, crx, cry, cosp_r, acosp_r, cose_r),
        "ssssvvv", 6, nb_ffsl=band1, n_scratch=3)

    # ---- K4 (up pass: phi_m carry + vector-invariant wind update) ----
    u_new, v_new = banded(
        lambda jml, bnd: partial(_k4_kernel, dt=dt, dl=dl, dp_=dp_,
                                 iord=iord, jord=jord, ke_method=ke_method,
                                 div2_on=bool(div2_on), nu4=float(nu4),
                                 del2_velocity=float(del2_velocity),
                                 dyn_filter=dyn_filter,
                                 acap=float(grid.acap), jm=jml, im=im,
                                 band=bnd),
        (u, v, pt_new, pkz, dgz, phis_p, crx, cry, uc, cosp_r, cose_r,
         cosen_r, f0_r, nu2_rows, fc_m, fs_m, gc_m, gs_m, rspc, rspe),
        "ssssspsssvvvvlFFGGrr", 2, nb_ffsl=band1, reverse=True, n_scratch=1)

    new_state = state.replace(u=u_new, v=v_new, pt=pt_new, delp=delp_new)
    # edge-pressure diagnostics for parity tests / debug consumers: derived
    # in XLA from delp_new (identical values to the in-kernel carry to
    # association roundoff); DCE'd when the caller only uses the fluxes
    kshape = (1,) + delp.shape[1:]
    pe = jnp.concatenate([jnp.full(kshape, ptop, dtype),
                          ptop + jnp.cumsum(delp_new, axis=0)], axis=0)
    peln = jnp.log(pe)
    pk = pe ** c.CAPPA
    dgz_d = c.CPAIR * pt_new * (pk[1:] - pk[:-1])
    wz = jnp.concatenate([phis[None] + jnp.flip(
        jnp.cumsum(jnp.flip(dgz_d, axis=0), axis=0), axis=0),
        phis[None] + jnp.zeros(kshape, dtype)], axis=0)
    diags = dict(cx=crx, cy=cry, mfx=mfx, mfy=mfy, pe=pe, pk=pk, pkz=pkz,
                 peln=peln, wz=wz)
    return new_state, diags
