"""Zhang-McFarlane deep convection core (NorESM "tht" variant) — TPU-native.

Re-implementation of /root/reference/physics/zm_conv.F90 (5572 lines of F90)
as batched, jit-safe JAX. Key design translations (SURVEY §7.1.2, §7.4.4):

- The reference gathers triggered columns (`ideep`, zm_conv.F90:905-940) and
  runs scalar level loops per gathered point. Here every column is computed and
  non-triggered columns are masked out at the end — branch-free, TPU-friendly;
  the gather was an MPI-era scalar-CPU optimization.
- Level recursions (plume ascent hu/su/qu, downdraft descent, precip/freezing
  adjustment, flux integrals) become `lax.scan` over the level axis with
  (ncol,)-shaped carries.
- The Brent entropy/enthalpy inversions (`ientropy`/`ienthalpy`,
  zm_conv.F90:5304-5414) are the vectorized solvers in ops/thermo.
- Data-dependent level indices (mx, lcl, lel, jt, j0, jd, jlcl) are integer
  arrays; Fortran `k >= jt(i)`-style loop bounds become broadcast masks.

Level convention: k=0 is the model top, k=pver-1 the surface layer (matching
the reference's 1..pver top-down ordering, shifted to 0-based). `msg` is the
number of excluded top levels (= reference msg = limcnv-1).

Units follow the reference internals: pressure in hPa (mb), heights in m
including surface elevation, mass fluxes normalized by cloud-base mass flux
until scaled by `mb` (mb/s).
"""

from __future__ import annotations

import contextlib
import contextvars
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ...ops.saturation import qsat as qsat_blend
from ...ops.saturation import qsat_hpa
from ...ops.thermo import enthalpy, entropy, ienthalpy, ientropy
from ...utils import constants as c
from ...utils.config import ZMConfig

# module-level constant aliases matching zm_convi (zm_conv.F90:155-168)
CP = c.CPAIR
RGAS = c.RAIR
GRAV = c.GRAVIT
RGRAV = 1.0 / c.GRAVIT
RL = c.LATVAP
EPS1 = c.EPSILO
TFREEZ = c.TMELT
CPVIR = c.CPVIR
DCOL = (c.CPLIQ - c.CPWV) / c.LATVAP   # zm_conv.F90:106-108


def _safe_div(a, b, eps=1.0e-300):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b >= 0, eps, -eps), b)


# Trace-time layout-canonicalization hook. Mosaic's TPU layout inference
# CRASHES (layout.h:320 join check) whenever a rank-1 value produced by a
# minor-axis REDUCTION meets a rank-1 value of ordinary layout inside a
# loop region (fori carry or body elementwise). A Pallas executor can
# install a hook that round-trips such values through a VMEM scratch row,
# forcing the canonical layout (the deleted r2 mega-kernel did; the tail
# kernel does not need it); the XLA path leaves it None (identity). Applied at every reduction that yields a per-column
# scalar on the zm_convr path. Carried in a contextvar (NOT a module
# global) so concurrent/re-entrant traces of the XLA path while a Pallas
# kernel traces cannot observe each other's state.
_CANON_VAR = contextvars.ContextVar("zm_canon_hook", default=None)


def _canon(v):
    hook = _CANON_VAR.get()
    return hook(v) if hook is not None else v


# ---------------------------------------------------------------------------
# Layout abstraction. The zm_convr path runs in one of two array layouts:
#   _lm() False : (ncol, pver) — column-major, the package-surface layout
#   _lm() True  : (pver, ncol) — level-major, used INSIDE the Pallas TPU
#                 mega-kernel, where columns must live in the minor (lane)
#                 dimension for full vector-register utilization (pver=26
#                 in the minor dim pads to 128 lanes = 20% occupancy).
# Every level-axis-dependent construct goes through the helpers below, so
# both layouts trace from the same code; reduction/scan element order along
# levels is identical, making the two layouts bitwise comparable.
# The flag lives in a contextvar, set via `layout_ctx`, so traces on other
# threads/contexts always see their own layout.
# ---------------------------------------------------------------------------
_LM_VAR = contextvars.ContextVar("zm_level_major", default=False)


def _lm() -> bool:
    return _LM_VAR.get()


@contextlib.contextmanager
def layout_ctx(level_major: bool, canon=None):
    """Scope the array layout (and optional canonicalization hook) for
    zm_convr tracing. Used by the Pallas mega-kernel (level_major=True)
    and by layout-equivalence tests."""
    t1 = _LM_VAR.set(level_major)
    t2 = _CANON_VAR.set(canon)
    try:
        yield
    finally:
        _CANON_VAR.reset(t2)
        _LM_VAR.reset(t1)


def _lax_():
    return 0 if _lm() else 1


def _shape_cp(a):
    """(ncol, nk) of a 2-D state array in either layout."""
    return (a.shape[1], a.shape[0]) if _lm() else (a.shape[0], a.shape[1])


def _c(v):
    """Column scalar (ncol,) -> broadcastable against state arrays."""
    return v[None, :] if _lm() else v[:, None]


def _karr2(nk):
    """Level iota broadcastable against state arrays."""
    k = jnp.arange(nk)
    return k[:, None] if _lm() else k[None, :]


def _lsum(a):
    return _canon(jnp.sum(a, axis=_lax_()))


def _lmax(a):
    return _canon(jnp.max(a, axis=_lax_()))


def _lmin(a):
    return _canon(jnp.min(a, axis=_lax_()))


def _lany(a):
    return _canon(jnp.any(a, axis=_lax_()))


def _lsl(a, sl):
    """Slice along the level axis."""
    return a[sl] if _lm() else a[:, sl]


def _lcat(parts):
    return jnp.concatenate(parts, axis=_lax_())


def _below(a):
    """a(k+1) with the bottom level replicated."""
    return _lcat([_lsl(a, slice(1, None)), _lsl(a, slice(-1, None))])


def _above(a):
    """a(k-1) with the top level replicated."""
    return _lcat([_lsl(a, slice(None, 1)), _lsl(a, slice(None, -1))])


def _zfull(ncol, nk, dtype):
    return jnp.zeros((nk, ncol) if _lm() else (ncol, nk), dtype)


def _bfull(v, nk):
    """Broadcast a column scalar (ncol,) to a full state array."""
    ncol = v.shape[0]
    return jnp.broadcast_to(_c(v), (nk, ncol) if _lm() else (ncol, nk))


def _take_col(arr, idx):
    """arr[(i, idx[i])] for state arr, idx (ncol,) int.

    One-hot masked sum over the (small) level axis: equal cost to a gather
    in XLA at nk ~ 26 and lowers inside Pallas/Mosaic kernels (which have no
    take_along_axis)."""
    nk = arr.shape[_lax_()]
    karr = _karr2(nk)
    return _lsum(jnp.where(karr == _c(idx), arr, jnp.zeros_like(arr)))


def _first_true_from_bottom(mask, default):
    """Largest k with mask true per column, else `default` (int array/scalar).

    iota-reduction form (no argmax/flip — Mosaic-safe, same cost in XLA)."""
    nk = mask.shape[_lax_()]
    karr = _karr2(nk)
    idx = _lmax(jnp.where(mask, karr, -1))
    found = idx >= 0
    return jnp.where(found, idx, default), found


def _first_true_from_top(mask, default):
    nk = mask.shape[_lax_()]
    karr = _karr2(nk)
    idx = _lmin(jnp.where(mask, karr, nk))
    found = idx < nk
    return jnp.where(found, idx, default), found


def _cumsum_lvl(x, reverse: bool = False):
    """Prefix (suffix if `reverse`) sum along the level axis as a triangular
    matmul: out[k] = sum_{k'<=k} x[k'] (resp. k'>=k). Mosaic has no cumsum;
    at nk ~ 26 the (nk, nk) contraction is negligible, and keeping ONE
    implementation for both the XLA and Pallas paths keeps them bitwise
    comparable."""
    nk = x.shape[_lax_()]
    i = jnp.arange(nk)
    tri = (i[:, None] >= i[None, :]) if reverse else (i[:, None] <= i[None, :])
    # HIGHEST precision: the default MXU f32 matmul runs bf16 passes, which
    # corrupts the ascent suffix-sums enough to flip trigger/level decisions
    if _lm():
        # out[k, i] = sum_k' tri[k, k'] x[k', i]
        return jnp.dot(tri.astype(x.dtype).T, x,
                       precision=jax.lax.Precision.HIGHEST)
    return jnp.dot(x, tri.astype(x.dtype),
                   precision=jax.lax.Precision.HIGHEST)


class _XlaScan:
    """Default level-axis scan executor: jax.lax.scan over transposed xs.

    Steps have signature step(carry, x_row: dict, k) -> (carry, ys_tuple)
    with x_row entries (ncol,) slices at level k; `reverse=True` walks
    bottom-up (k = nk-1 .. 0) with ys stacked at their original level. The
    level-major Pallas executor (deleted in r3; see git history) ran the
    identical steps
    as an in-kernel fori_loop over VMEM scratch."""

    def scan(self, step, carry, xs: dict, reverse: bool = False):
        nk = next(iter(xs.values())).shape[_lax_()]
        ks = jnp.arange(nk)
        # scan consumes (nk, ncol) rows: already level-major under _lm()
        xs_T = xs if _lm() else {k: v.T for k, v in xs.items()}
        # unroll: pver is 26-32 and each step is a short elementwise
        # chain on (ncol,) rows — unrolling collapses ~pver while-loop
        # trips into a handful of fused kernels (launch-bound runtime)
        carry, ys = jax.lax.scan(lambda cy, xk: step(cy, xk[0], xk[1]),
                                 carry, (xs_T, ks), reverse=reverse,
                                 unroll=True)
        return carry, tuple(y if _lm() else y.T for y in ys)


LAX_SCAN = _XlaScan()


def _log_mean_interface(x, thresh=1.0e-6):
    """xhat(k) = log-mean of (x(k-1), x(k)) on upper interfaces, k>=1.

    Matches the shat/qhat construction (zm_conv.F90:1007-1027): when the
    relative difference exceeds 1e-6 use x0*x1*ln(x0/x1)/(x0-x1), else the
    arithmetic mean. xhat(0) = x(0).
    """
    x0 = _lsl(x, slice(None, -1))   # level k-1 (above)
    x1 = _lsl(x, slice(1, None))    # level k
    diff = jnp.abs(_safe_div(x0 - x1, jnp.maximum(jnp.maximum(x0, x1), 1e-300)))
    use_log = (diff > thresh) & (x0 > 0) & (x1 > 0) & (jnp.abs(x0 - x1) > 0)
    logmean = _safe_div(jnp.log(jnp.where(use_log, _safe_div(x0, x1), 1.0)),
                        x0 - x1) * x0 * x1
    xhat = jnp.where(use_log, logmean, 0.5 * (x0 + x1))
    return _lcat([_lsl(x, slice(None, 1)), xhat])


def _col(b):
    """1-D bool -> broadcastable bool column. Mosaic cannot reshape i1
    vectors (minor-dim insertion is 32-bit only), so ride through f32."""
    return _c(b.astype(jnp.float32)) > 0.5


def cldfrc_fice(t):
    """Ice/snow fraction ramps (upstream cloud_fraction::cldfrc_fice contract,
    used at zm_conv.F90:1810). fice ramps 0->1 over [Tmelt-40, Tmelt-10];
    fsnow over [Tmelt-5, Tmelt]."""
    tmax_fice, tmin_fice = TFREEZ - 10.0, TFREEZ - 40.0
    tmax_fsnow, tmin_fsnow = TFREEZ, TFREEZ - 5.0
    fice = jnp.clip((tmax_fice - t) / (tmax_fice - tmin_fice), 0.0, 1.0)
    fsnow = jnp.clip((tmax_fsnow - t) / (tmax_fsnow - tmin_fsnow), 0.0, 1.0)
    return fice, fsnow


# =============================================================================
# buoyan_dilute + parcel_dilute  (zm_conv.F90:4425-5277)
# =============================================================================

@struct.dataclass
class BuoyanOut:
    tp: jnp.ndarray        # parcel temperature (ncol, pver)
    qstp: jnp.ndarray      # parcel sat mixing ratio (q below lcl)
    tl: jnp.ndarray        # parcel T at LCL (ncol,)
    cape: jnp.ndarray      # (ncol,)
    cin: jnp.ndarray       # (ncol,)
    lcl: jnp.ndarray       # int level indices (ncol,)
    lel: jnp.ndarray
    mx: jnp.ndarray        # launch level
    buoy: jnp.ndarray      # parcel buoyancy tpv - tv + tiedke_add (ncol, pver)
    pl: jnp.ndarray        # parcel LCL pressure (ncol,) hPa


def _parcel_dilute(cfg: ZMConfig, msg: int, klaunch, p, z, t, q,
                   tpert, tl0, ql0, pl0, dmpdz, scan_impl=LAX_SCAN):
    """Entraining-plume parcel ascent (parcel_dilute, zm_conv.F90:4824-5277),
    tht_tweaks path (enthalpy mixing; entropy-based precip/freeze adjustment).

    Returns (tp, qstp, tpv, tl, pl, lcl).
    """
    ncol, pver = _shape_cp(t)
    dtype = t.dtype
    lwmax = 1.0e-3
    tscool = 0.0
    nit_lheat = 2

    # launch-level values (tht path: tmix = t, qsmix = qsat)
    t_launch = _take_col(t, klaunch)
    q_launch = _take_col(q, klaunch)
    p_launch = _take_col(p, klaunch)
    z_launch = _take_col(z, klaunch)
    if cfg.parcel_pbl:
        qtp0 = ql0
        sp0 = enthalpy(tl0, pl0, qtp0, jnp.zeros_like(tl0))
    else:
        qtp0 = q_launch
        sp0 = enthalpy(t_launch, p_launch, qtp0, z_launch)
    mp0 = jnp.ones((ncol,), dtype)

    _, qs_launch = qsat_hpa(t_launch, p_launch)

    # ---- entrainment ascent (bottom-up over levels pver-1 .. msg) ----
    below = _below            # level-below values x(k+1)
    karr_ = _karr2(pver)
    above_all = karr_ < _c(klaunch)
    at_launch_all = karr_ == _c(klaunch)

    if cfg.parcel_impl == "batched":
        # The entrainment budget (sp, qtp, mp) is independent of the
        # inversion results: each is a masked suffix-sum of per-level
        # environment increments. Computing them whole-array reduces the
        # ascent to ONE batched (ncol, pver) enthalpy inversion instead of
        # pver sequential (ncol,) ones; the secant guess becomes the
        # environment temperature (converged answers are guess-independent
        # to the solver's 1e-3 K tolerance).
        dp_l = p - below(p)
        qtenv = 0.5 * (q + below(q))
        tenv = 0.5 * (t + below(t))
        penv = 0.5 * (p + below(p))
        zenv = 0.5 * (z + below(z))
        senv = enthalpy(tenv, penv, qtenv, zenv)
        dzdp_l = -(RGAS * tenv) / (penv * GRAV)      # m/mb
        dmpdp = dmpdz * dzdp_l

        def ssum(x):
            # suffix sum along levels: s(k) = sum_{k' >= k} x(k') — the
            # bottom-up accumulation order of the reference scan
            return _cumsum_lvl(x, reverse=True)

        inc = jnp.where(above_all, dmpdp * dp_l, 0.0)
        sp_s = -ssum(inc * senv)
        qtp_s = -ssum(inc * qtenv)
        mp_s = -ssum(inc)
        denom = _c(mp0) + mp_s
        smix_a = (_c(sp0) + sp_s) / denom
        qtmix_a = (_c(qtp0) + qtp_s) / denom
        t_inv, qs_inv, _ = ienthalpy(smix_a, p, qtmix_a, z, t,
                                     solver=cfg.inversion_solver)
        t_inv = jnp.where(jnp.isnan(t_inv), t, t_inv)

        smix = jnp.where(at_launch_all, _c(sp0),
                         jnp.where(above_all, smix_a, senv))
        qtmix = jnp.where(at_launch_all, _c(qtp0),
                          jnp.where(above_all, qtmix_a, q))
        tmix = jnp.where(at_launch_all, _c(t_launch),
                         jnp.where(above_all, t_inv, t))
        qsmix = jnp.where(at_launch_all, _c(qs_launch),
                          jnp.where(above_all, qs_inv, q))
        return _parcel_finish(cfg, msg, klaunch, p, z, t, q, tpert, tl0, pl0,
                              t_launch, qs_launch, qtp0, smix, qtmix, tmix,
                              qsmix, dzdp_l, scan_impl=scan_impl)

    xs = dict(p=p, z=z, t=t, q=q, p_b=below(p), z_b=below(z), t_b=below(t),
              q_b=below(q), dmpdz=dmpdz)

    # Ascent scan computes the mixture profile only; LCL detection and
    # interpolation run as a separate vectorized pass afterwards.
    def ascent_step2(cy, x, k):
        at_launch = k == klaunch
        above = k < klaunch

        dp = x["p"] - x["p_b"]
        qtenv = 0.5 * (x["q"] + x["q_b"])
        tenv = 0.5 * (x["t"] + x["t_b"])
        penv = 0.5 * (x["p"] + x["p_b"])
        zenv = 0.5 * (x["z"] + x["z_b"])
        senv = enthalpy(tenv, penv, qtenv, zenv)
        dpdz = -(penv * GRAV) / (RGAS * tenv)   # mb/m (p in mb), zm_conv.F90:5065
        dzdp = 1.0 / dpdz
        dmpdp = x["dmpdz"] * dzdp

        sp = jnp.where(above, cy["sp"] - dmpdp * dp * senv, cy["sp"])
        qtp = jnp.where(above, cy["qtp"] - dmpdp * dp * qtenv, cy["qtp"])
        mp = jnp.where(above, cy["mp"] - dmpdp * dp, cy["mp"])

        smix_a = (sp0 + sp) / (mp0 + mp)
        qtmix_a = (qtp0 + qtp) / (mp0 + mp)
        t_inv, qs_inv, _ = ienthalpy(smix_a, x["p"], qtmix_a, x["z"],
                                     cy["tmix_b"], solver=cfg.inversion_solver)
        t_inv = jnp.where(jnp.isnan(t_inv), cy["tmix_b"], t_inv)

        smix = jnp.where(at_launch, sp0, jnp.where(above, smix_a, senv))
        qtmix = jnp.where(at_launch, qtp0, jnp.where(above, qtmix_a, x["q"]))
        tmix = jnp.where(at_launch, t_launch, jnp.where(above, t_inv, x["t"]))
        qsmix = jnp.where(at_launch, qs_launch,
                          jnp.where(above, qs_inv, x["q"]))

        new_cy = dict(sp=sp, qtp=qtp, mp=mp, tmix_b=tmix, qsmix_b=qsmix,
                      qtmix_b=qtmix)
        return new_cy, (smix, qtmix, tmix, qsmix, dzdp)

    carryA = dict(sp=jnp.zeros((ncol,), dtype), qtp=jnp.zeros((ncol,), dtype),
                  mp=jnp.zeros((ncol,), dtype),
                  tmix_b=t_launch, qsmix_b=qs_launch, qtmix_b=qtp0)
    _, (smix, qtmix, tmix, qsmix, dzdp_l) = scan_impl.scan(
        ascent_step2, carryA, xs, reverse=True)

    return _parcel_finish(cfg, msg, klaunch, p, z, t, q, tpert, tl0, pl0,
                          t_launch, qs_launch, qtp0, smix, qtmix, tmix,
                          qsmix, dzdp_l, scan_impl=scan_impl)


def _parcel_finish(cfg: ZMConfig, msg: int, klaunch, p, z, t, q, tpert,
                   tl0, pl0, t_launch, qs_launch, qtp0, smix, qtmix, tmix,
                   qsmix, dzdp_l, scan_impl=LAX_SCAN):
    """LCL detection + precipitation/freezing adjustment on the ascent
    profiles (zm_conv.F90:5100-5270); shared tail of both parcel ascents."""
    ncol, pver = _shape_cp(t)
    dtype = t.dtype
    lwmax = 1.0e-3
    tscool = 0.0
    nit_lheat = 2

    # ---- LCL detection + interpolation (zm_conv.F90:5100-5135) ----
    p_launch = _take_col(p, klaunch)
    karr = _karr2(pver)
    above_m = karr < _c(klaunch)
    qsmix_b = _lcat([_lsl(qsmix, slice(1, None)), _c(qs_launch)])
    qtmix_b = _lcat([_lsl(qtmix, slice(1, None)), _c(qtp0)])
    crossing = above_m & (qsmix <= qtmix) & (qsmix_b > qtmix_b)
    # reference loop runs k decreasing, so the last write is the smallest k
    lcl_idx, found = _first_true_from_top(crossing, klaunch)
    lcl = jnp.where(found, lcl_idx, klaunch)

    def interp_at(arr):
        return _take_col(arr, lcl)

    p_b_full = _below(p)
    z_b_full = _below(z)
    smix_bf = _below(smix)
    dp_lcl = interp_at(p) - interp_at(p_b_full)
    qxsk = interp_at(qtmix) - interp_at(qsmix)
    qxskp1 = interp_at(qtmix_b) - interp_at(qsmix_b)
    dqxsdp = _safe_div(qxsk - qxskp1, dp_lcl)
    pl = jnp.where(found, interp_at(p_b_full) - _safe_div(qxskp1, dqxsdp),
                   p_launch if not cfg.parcel_pbl else pl0)
    zl = jnp.where(found,
                   interp_at(z_b_full) - _safe_div(qxskp1, dqxsdp) * interp_at(dzdp_l),
                   jnp.zeros((ncol,), dtype))
    dsdp = _safe_div(interp_at(smix) - interp_at(smix_bf), dp_lcl)
    dqtdp = _safe_div(interp_at(qtmix) - interp_at(qtmix_b), dp_lcl)
    slcl = interp_at(smix_bf) + dsdp * (pl - interp_at(p_b_full))
    qtlcl = interp_at(qtmix_b) + dqtdp * (pl - interp_at(p_b_full))
    tl_inv, _, _ = ienthalpy(slcl, pl, qtlcl, zl, interp_at(tmix),
                             solver=cfg.inversion_solver)
    tl = jnp.where(found & ~jnp.isnan(tl_inv), tl_inv,
                   tl0 if cfg.parcel_pbl else t_launch)

    # ---- precipitation / freezing adjustment (zm_conv.F90:5160-5270) ----
    # bottom-up; tht path recomputes entropy of the mixture first.
    smix_ent = entropy(tmix, p, qtmix)

    if cfg.parcel_impl == "batched":
        # Fixed-point sweeps instead of the level-recursive scan: given the
        # current (tmix, qsmix) profiles, the carry terms (ds_xsh2o,
        # ds_freeze, level-below xsh2o/qsmix) follow EXACTLY from a
        # lightweight arithmetic-only scan; the expensive entropy inversion
        # then runs once, batched over (ncol, pver). The level-to-level
        # coupling is a weak latent-heat correction, so a few sweeps reach
        # the same fixed point as the reference's sequential recursion
        # (validated against the scan implementation in test_zm_conv).
        at_launch_m = karr == _c(klaunch)
        tmix_c, qsmix_c = tmix, qsmix
        xsh2o = jnp.zeros_like(tmix)
        for _ in range(cfg.precip_sweeps):
            xsh2o = jnp.maximum(0.0, qtmix - qsmix_c - lwmax)
            xsC = dict(above=above_m.astype(dtype),
                       at_launch=at_launch_m.astype(dtype),
                       xsh2o=xsh2o, tmix=tmix_c, qsmix=qsmix_c, qtmix=qtmix)

            def carry_step(cy, x, k):
                above = x["above"] > 0.5
                at_launch = x["at_launch"] > 0.5
                ds_xsh2o = cy["ds_xsh2o_b"] - c.CPLIQ * \
                    jnp.log(x["tmix"] / TFREEZ) * \
                    jnp.maximum(0.0, x["xsh2o"] - cy["xsh2o_b"])
                cold = x["tmix"] <= TFREEZ + tscool
                first_frz = cold & (cy["ds_freeze_b"] == 0.0)
                cont_frz = cold & (cy["ds_freeze_b"] != 0.0)
                ds_freeze = jnp.where(
                    first_frz,
                    (c.LATICE / x["tmix"]) *
                    jnp.maximum(0.0, x["qtmix"] - x["qsmix"] - x["xsh2o"]),
                    jnp.where(cont_frz,
                              cy["ds_freeze_b"] + (c.LATICE / x["tmix"]) *
                              jnp.maximum(0.0, cy["qsmix_b"] - x["qsmix"]),
                              0.0))
                new_cy = dict(
                    xsh2o_b=jnp.where(above, x["xsh2o"], 0.0),
                    ds_xsh2o_b=jnp.where(above, ds_xsh2o, 0.0),
                    ds_freeze_b=jnp.where(above, ds_freeze, 0.0),
                    qsmix_b=jnp.where(above | at_launch,
                                      x["qsmix"], cy["qsmix_b"]))
                return new_cy, (ds_xsh2o, ds_freeze)

            carry0 = dict(xsh2o_b=jnp.zeros((ncol,), dtype),
                          ds_xsh2o_b=jnp.zeros((ncol,), dtype),
                          ds_freeze_b=jnp.zeros((ncol,), dtype),
                          qsmix_b=qs_launch)
            _, (dsx, dsf) = scan_impl.scan(carry_step, carry0, xsC,
                                           reverse=True)
            new_s = smix_ent + dsx + dsf
            new_q = qtmix - xsh2o
            t_i, qs_i, _ = ientropy(new_s, p, new_q, tmix_c,
                                    solver=cfg.inversion_solver)
            tmix_c = jnp.where(above_m & ~jnp.isnan(t_i), t_i, tmix_c)
            qsmix_c = jnp.where(above_m, qs_i, qsmix_c)

        tp = jnp.where(above_m, tmix_c, tmix)
        new_q = qtmix - jnp.maximum(0.0, qtmix - qsmix_c - lwmax)
        qstp = jnp.where(above_m,
                         jnp.where(new_q > qsmix_c, qsmix_c, new_q), q)
        denom_q = jnp.where(above_m, new_q, qstp)
        tpv = (tp + _c(tpert)) * (1.0 + qstp / EPS1) / (1.0 + denom_q)

        below_m = karr > _c(klaunch)
        tp = jnp.where(below_m, t, tp)
        qstp = jnp.where(below_m, q, qstp)
        return tp, qstp, tpv, tl, pl, lcl

    xsP = dict(p=p, q=q, smix=smix_ent, qtmix=qtmix, tmix0=tmix,
               qsmix0=qsmix)
    carryP = dict(
        xsh2o_b=jnp.zeros((ncol,), dtype),
        ds_xsh2o_b=jnp.zeros((ncol,), dtype),
        ds_freeze_b=jnp.zeros((ncol,), dtype),
        qsmix_b=qs_launch,
    )

    tpert_eff = tpert

    def precip_step(cy, x, k):
        at_launch = k == klaunch
        above = k < klaunch

        tmix_k = x["tmix0"]
        qsmix_k = x["qsmix0"]
        xsh2o = jnp.zeros_like(tmix_k)
        ds_xsh2o = jnp.zeros_like(tmix_k)
        ds_freeze = jnp.zeros_like(tmix_k)
        new_q = x["qtmix"]
        for _ in range(nit_lheat):
            xsh2o = jnp.maximum(0.0, x["qtmix"] - qsmix_k - lwmax)
            ds_xsh2o = cy["ds_xsh2o_b"] - c.CPLIQ * jnp.log(tmix_k / TFREEZ) * \
                jnp.maximum(0.0, xsh2o - cy["xsh2o_b"])
            cold = tmix_k <= TFREEZ + tscool
            first_frz = cold & (cy["ds_freeze_b"] == 0.0)
            cont_frz = cold & (cy["ds_freeze_b"] != 0.0)
            ds_freeze = jnp.where(
                first_frz,
                (c.LATICE / tmix_k) * jnp.maximum(0.0, x["qtmix"] - qsmix_k - xsh2o),
                jnp.where(cont_frz,
                          cy["ds_freeze_b"] + (c.LATICE / tmix_k) *
                          jnp.maximum(0.0, cy["qsmix_b"] - qsmix_k),
                          0.0))
            new_s = x["smix"] + ds_xsh2o + ds_freeze
            new_q = x["qtmix"] - xsh2o
            t_i, qs_i, _ = ientropy(new_s, x["p"], new_q, tmix_k,
                                    solver=cfg.inversion_solver)
            tmix_k = jnp.where(above & ~jnp.isnan(t_i), t_i, tmix_k)
            qsmix_k = jnp.where(above, qs_i, qsmix_k)

        tp_k = jnp.where(above, tmix_k, x["tmix0"])
        qstp_k = jnp.where(above,
                           jnp.where(new_q > qsmix_k, qsmix_k, new_q),
                           x["q"])
        denom_q = jnp.where(above, new_q, qstp_k)
        tpv_k = (tp_k + tpert_eff) * (1.0 + qstp_k / EPS1) / (1.0 + denom_q)

        new_cy = dict(
            xsh2o_b=jnp.where(above, xsh2o, cy["xsh2o_b"] * 0.0),
            ds_xsh2o_b=jnp.where(above, ds_xsh2o, cy["ds_xsh2o_b"] * 0.0),
            ds_freeze_b=jnp.where(above, ds_freeze, cy["ds_freeze_b"] * 0.0),
            qsmix_b=jnp.where(above | at_launch, qsmix_k, cy["qsmix_b"]),
        )
        return new_cy, (tp_k, qstp_k, tpv_k)

    _, (tp, qstp, tpv) = scan_impl.scan(precip_step, carryP, xsP,
                                        reverse=True)

    # outside the plume (k > klaunch) keep environment values
    below_m = karr > _c(klaunch)
    tp = jnp.where(below_m, t, tp)
    qstp = jnp.where(below_m, q, qstp)

    return tp, qstp, tpv, tl, pl, lcl


def buoyan_dilute(cfg: ZMConfig, msg: int, q, t, p, z, pf, zi_, zs,
                  pblt, tpert, landfrac, dmpdz,
                  scan_impl=LAX_SCAN) -> BuoyanOut:
    """Dilute CAPE/CIN (buoyan_dilute, zm_conv.F90:4425-4819).

    Inputs: p/pf in hPa, z/zi_ heights incl. surface elevation zs (m),
    pblt = 0-based PBL-top level index (float), dmpdz (ncol, pver) entrainment
    rate (/m, negative). Returns parcel profile + CAPE/CIN + level indices.
    """
    ncol, pver = _shape_cp(t)
    dtype = t.dtype
    karr = _karr2(pver)

    pblt_i = jnp.rint(pblt).astype(jnp.int32)
    lon = jnp.minimum(pver - 1, pblt_i + 2)   # zm_conv.F90:4578

    # moist static energy (tht total-MSE form, zm_conv.F90:4668-4672)
    hmn = ((CP + q * c.CPLIQ) * t / (1.0 + q)
           + (1.0 + q / EPS1) / (1.0 + q) * GRAV * z
           + (RL - (c.CPLIQ - c.CPWV) * (t - TFREEZ)) * q)

    if cfg.parcel_pbl:
        # PBL-mixed parcel (zm_conv.F90:4639-4702); zi_ is AGL (surface = 0)
        pbl_dz = _take_col(z, pblt_i) - zs
        parcel_dz = jnp.maximum(_lsl(zi_, pver - 1),
                                cfg.parcel_hscale * pbl_dz)
        dp_lev = _lsl(pf, slice(1, None)) - _lsl(pf, slice(None, -1))
        zi_top = _lsl(zi_, slice(None, -1))   # upper-interface height AGL
        zi_bot = _lsl(zi_, slice(1, None))
        in_mix = zi_bot <= _c(parcel_dz)
        frac = jnp.where(karr == pver - 1, 1.0,
                         jnp.clip(_safe_div(_c(parcel_dz) - zi_bot,
                                            zi_top - zi_bot), None, 1.0))
        w = jnp.where(in_mix, dp_lev * frac, 0.0)
        wsum = _lsum(w)
        hpar = _lsum(hmn * w) / jnp.maximum(wsum, 1e-30)
        qpar = _lsum(q * w) / jnp.maximum(wsum, 1e-30)
        mx, _ = _first_true_from_top(in_mix, jnp.full((ncol,), pver - 1, jnp.int32))
        parcel_ztop = parcel_dz + zs
        tl0 = (hpar - RL * qpar - GRAV * parcel_ztop) / CP
        ql0 = qpar
        pl0 = _take_col(p, mx)
    else:
        # launch at max MSE between PBL top and lon (zm_conv.F90:4705-4718).
        # Fortran scans bottom-up with strict >, so ties pick the lowest
        # level: emulate with a value-max reduction followed by the largest
        # k attaining it (argmax/flip-free — Mosaic-safe).
        mask = (karr >= _c(pblt_i)) & (karr <= _c(lon))
        hmn_m = jnp.where(mask, hmn, -jnp.inf)
        vmax = _lmax(hmn_m)
        mx = _lmax(jnp.where(hmn_m == _c(vmax), karr, -1)).astype(jnp.int32)
        mx = jnp.where(_lany(mask), mx, lon)
        tl0 = _take_col(t, mx)
        ql0 = _take_col(q, mx)
        pl0 = _take_col(p, mx)

    tp, qstp, tpv, tl, pl, lcl = _parcel_dilute(
        cfg, msg, mx, p, z, t, q, tpert, tl0, ql0, pl0, dmpdz,
        scan_impl=scan_impl)

    plge600 = pl >= cfg.plclmin   # zm_conv.F90:4755

    # env virtual temperature (tht form) and buoyancy (zm_conv.F90:4763-4780)
    tv = t * (1.0 + q / EPS1) / (1.0 + q)
    in_plume = (karr <= _c(mx)) & _col(plge600)
    buoy = jnp.where(in_plume, tpv - tv + cfg.tiedke_add, 0.0)
    tp = jnp.where(in_plume, tp, t)
    qstp = jnp.where(in_plume, qstp, q)

    # neutral-buoyancy crossings, top-down, up to num_cin (zm_conv.F90:4786-4797)
    buoy_b = _below(buoy)
    kmask = (karr >= msg + 1) & (karr < _c(lcl)) & _col(plge600)
    crossing = kmask & (buoy_b > 0.0) & (buoy <= 0.0)
    # crossing ordinal via the triangular-matmul cumsum (counts <= pver are
    # exact in f32); compared with half-open windows below
    order = _cumsum_lvl(crossing.astype(dtype))

    dlnp = jnp.log(_lsl(pf, slice(1, None)) /
                   _lsl(pf, slice(None, -1)))   # ln(pf(k+1)/pf(k)) > 0
    cape = jnp.zeros((ncol,), dtype)
    cin = jnp.zeros((ncol,), dtype)
    lel = jnp.full((ncol,), pver - 1, jnp.int32)
    best = jnp.full((ncol,), -jnp.inf, dtype)
    dflt = jnp.full((ncol,), pver - 1, jnp.int32)
    for n in range(1, cfg.num_cin + 1):
        if n < cfg.num_cin:
            sel = crossing & (jnp.abs(order - n) < 0.5)
            lel_n, found_n = _first_true_from_top(sel, dflt)
        else:
            # the reference's knt = min(num_cin, knt+1) bookkeeping
            # (zm_conv.F90:4779): once knt saturates, every later (lower)
            # crossing overwrites slot num_cin — so the last slot holds the
            # LAST crossing, not the n-th
            sel = crossing & (order > n - 0.5)
            lel_n, found_n = _first_true_from_bottom(sel, dflt)
        seg = (karr <= _c(mx)) & (karr > _c(lel_n)) & _col(plge600)
        cape_n = _lsum(jnp.where(seg, RGAS * buoy * dlnp, 0.0))
        cin_n = _lsum(jnp.where(seg, -RGAS * jnp.minimum(buoy, 0.0) * dlnp,
                                0.0))
        better = found_n & (cape_n > jnp.maximum(best, 0.0))
        cape = jnp.where(better, cape_n, cape)
        cin = jnp.where(better, cin_n, cin)
        lel = jnp.where(better, lel_n, lel)
        best = jnp.where(better, cape_n, best)

    cape = jnp.maximum(cape, 0.0)
    return BuoyanOut(tp=tp, qstp=qstp, tl=tl, cape=cape, cin=cin,
                     lcl=lcl.astype(jnp.int32), lel=lel,
                     mx=mx.astype(jnp.int32), buoy=buoy, pl=pl)


# =============================================================================
# in-plume two-moment updraft microphysics (zm_mphy contract; called from
# inside cldprp's iteration loop — zm_conv.F90:3782-3793)
# =============================================================================

@struct.dataclass
class ZMMphyOut:
    """Per-level updraft microphysics state (loc_conv role). All plume
    arrays in cldprp's internal normalized units."""

    qliq: jnp.ndarray     # in-plume cloud liquid at interfaces (kg/kg)
    qice: jnp.ndarray     # in-plume cloud ice
    qnl: jnp.ndarray      # in-plume droplet number (1/kg)
    qni: jnp.ndarray      # in-plume crystal number
    qcde: jnp.ndarray     # detrainable liquid (q1q2: dl = du*qcde(k+1))
    qide: jnp.ndarray     # detrainable ice
    qncde: jnp.ndarray    # detrainable droplet number
    qnide: jnp.ndarray    # detrainable crystal number
    rprd: jnp.ndarray     # rain production (cu units: flux*(kg/kg)/m)
    sprd: jnp.ndarray     # snow production (cu units)
    frz: jnp.ndarray      # liquid->ice freezing rate (cu units)
    wu: jnp.ndarray       # updraft vertical velocity (m/s)
    # per-process rates (conv%autolm... family, zm_conv_micro_outfld,
    # /root/reference/physics/zm_conv_intr.F90:1292-1390), cu units for
    # _m (mass) and number-flux/m for _n entries; zeros for processes the
    # stand-in scheme does not model (bergeron, snow accretion, rain
    # freezing)
    rates: dict


def zm_mphy(cfg: ZMConfig, su, qu, mu, du, eu, cmel, cmei, dz, zf_top, p,
            t, q, jt, jb, active, landfrac, aero=None,
            scan_impl=None) -> ZMMphyOut:
    """In-plume two-moment updraft microphysics (the zm_mphy call inside
    cldprp, /root/reference/physics/zm_conv.F90:3782-3793; upstream Song &
    Zhang 2011 scheme — the module itself is not in the reference tree, so
    the process chain is this repo's standing two-moment formulation,
    restructured to run INSIDE the plume ascent).

    One bottom-up scan over the plume carrying the four condensate fluxes
    (mu*ql, mu*qi, mu*nl, mu*ni) plus the updraft kinetic energy w^2. Per
    level, the reference ql-budget differencing (zm_conv.F90:3848-3857)
    extended to two phases and two numbers:

        G_x = mu(k+1)*x(k+1) - dz*du*x(k+1) + dz*src_x(k)

    then the process chain on the diluted in-plume mixing ratios with the
    plume residence time dz/wu: Bigg immersion + Cooper contact/deposition
    + homogeneous freezing (-> frz, heating the hu budget), KK2000
    autoconversion + accretion (-> rprd), threshold ice-to-snow (-> sprd).
    Mass closure is exact by construction: summed over the plume,
    dz*(cmel+cmei) == dz*(rprd+sprd) + detrained fluxes (q1q2's
    du*(qcde+qide)(k+1) series), which is what cldprp's microp totpcp
    (zm_conv.F90:3814-3820) measures.

    wu: d(w^2)/dz = 2a*B - 2*eps*w^2 with a=1/3, B = g*(Tu-T)/T and the
    fractional entrainment eps = eu/mu — the zm_conv_t%wu role; used only
    for the residence time (floored at 0.5 m/s).
    """
    from .zm_microphysics import (AIMM, BIMM, COOPER_A, COOPER_B, KK_A,
                                  KK_ACC, M_ACT, M_ICE0, NACT_LND, NACT_OCN,
                                  NI_MAX, QI0_SNOW, RHO_LIQ, T_BERG_PEAK,
                                  T_BERG_WIDTH, T_HOM, TAU_BERG, TAU_SNOW,
                                  activated_number)

    ncol, pver = _shape_cp(t)
    dtype = t.dtype
    karr = _karr2(pver)
    eps = jnp.asarray(1.0e-12, dtype)

    # plume temperature from the updraft s (tug, zm_conv.F90:3712-3718)
    tug = su - (GRAV / CP) * zf_top / (1.0 + CPVIR * qu)
    rho = p * 100.0 / (c.RAIR * t)                   # p in mb
    if aero is not None:
        nact = activated_number(aero)
        if _lm():
            nact = nact.T
    else:
        nact = _bfull(NACT_LND * landfrac + NACT_OCN * (1.0 - landfrac),
                      pver)

    in_plume = (karr >= _c(jt)) & (karr < _c(jb)) & _col(active)

    xs = dict(tug=tug, t=t, dz=dz, mu=mu, du=du, eu=eu, cmel=cmel,
              cmei=cmei, rho=rho, nact=nact,
              inp=in_plume.astype(dtype))
    z4 = jnp.zeros((ncol,), dtype)
    carry0 = dict(f_ql=z4, f_qi=z4, f_nl=z4, f_ni=z4, w2=z4, mu_b=z4)

    def step(cy, x, k):
        live = (x["inp"] > 0.5)
        mu_k = x["mu"]
        pos = mu_k > 0.0
        mu_s = jnp.maximum(mu_k, eps)

        # updraft w^2 (buoyancy - entrainment drag)
        buoy = GRAV * (x["tug"] - x["t"]) / jnp.maximum(x["t"], 1.0)
        lam = x["eu"] / mu_s
        w2 = jnp.maximum(cy["w2"] + 2.0 * x["dz"] *
                         ((1.0 / 3.0) * buoy - lam * cy["w2"]), 0.0)
        wu = jnp.sqrt(w2)
        tau = x["dz"] / jnp.maximum(wu, 0.5)

        # budget step (reference differencing) for all four species:
        # flux in from below, minus detrainment of the below value, plus
        # the level source (all in flux units)
        def g(x_b, src):
            return cy["mu_b"] * x_b - x["dz"] * x["du"] * x_b + \
                x["dz"] * src

        ql_b = _safe_div(cy["f_ql"], jnp.maximum(cy["mu_b"], eps))
        qi_b = _safe_div(cy["f_qi"], jnp.maximum(cy["mu_b"], eps))
        nl_b = _safe_div(cy["f_nl"], jnp.maximum(cy["mu_b"], eps))
        ni_b = _safe_div(cy["f_ni"], jnp.maximum(cy["mu_b"], eps))
        ql_b = jnp.where(cy["mu_b"] > 0, ql_b, 0.0)
        qi_b = jnp.where(cy["mu_b"] > 0, qi_b, 0.0)
        nl_b = jnp.where(cy["mu_b"] > 0, nl_b, 0.0)
        ni_b = jnp.where(cy["mu_b"] > 0, ni_b, 0.0)

        Gl = g(ql_b, jnp.maximum(x["cmel"], 0.0))
        Gi = g(qi_b, jnp.maximum(x["cmei"], 0.0))
        # activation: new liquid at the activation radius; deposition ice
        # at the fresh-crystal size
        Gnl = g(nl_b, jnp.maximum(x["cmel"], 0.0) / M_ACT)
        Gni = g(ni_b, jnp.maximum(x["cmei"], 0.0) / M_ICE0)

        ql_u = jnp.where(pos, jnp.maximum(Gl, 0.0) / mu_s, 0.0)
        qi_u = jnp.where(pos, jnp.maximum(Gi, 0.0) / mu_s, 0.0)
        nl_u = jnp.where(pos, jnp.minimum(jnp.maximum(Gnl, 0.0) / mu_s,
                                          x["nact"]), 0.0)
        ni_u = jnp.where(pos, jnp.maximum(Gni, 0.0) / mu_s, 0.0)

        # activation-number source in mixing-ratio units (for the ACTIV_N
        # diagnostic; the budget itself added it through Gnl)
        dn_act = jnp.where(pos, x["dz"] * jnp.maximum(x["cmel"], 0.0) /
                           M_ACT / mu_s, 0.0)

        # ---- freezing: Bigg immersion + Cooper + homogeneous ----
        dT = jnp.clip(TFREEZ - x["tug"], 0.0, 40.0)
        frz_imm = BIMM * jnp.expm1(AIMM * dT) * x["rho"] * ql_u * ql_u / \
            jnp.maximum(nl_u * RHO_LIQ * M_ACT, eps) * M_ACT
        frz_imm = jnp.where(x["tug"] < TFREEZ, frz_imm, 0.0)
        dq_imm = jnp.minimum(ql_u, frz_imm * tau)
        dq_frz = dq_imm
        n_cooper = jnp.minimum(COOPER_A * jnp.exp(COOPER_B * dT) / x["rho"],
                               NI_MAX)
        n_cooper = jnp.where(x["tug"] < TFREEZ, n_cooper, 0.0)
        dn_nuc = jnp.maximum(n_cooper - ni_u, 0.0)
        dq_nuc = jnp.minimum(jnp.maximum(ql_u - dq_frz, 0.0),
                             dn_nuc * M_ICE0)
        dn_nuc = dq_nuc / M_ICE0
        dq_ct = dq_nuc
        dq_frz = dq_frz + dq_nuc
        # Wegener-Bergeron-Findeisen: where ice already exists in mixed
        # phase, vapor deposition grows it at the liquid's expense — a
        # liquid->ice transfer releasing latice exactly like freezing
        # (BERGN_M role). Relaxation form with a Gaussian efficiency
        # peaking near -15 C (the maximum e_w - e_i gap)
        eff_berg = jnp.exp(-((x["tug"] - T_BERG_PEAK) / T_BERG_WIDTH) ** 2)
        eff_berg = jnp.where((x["tug"] < TFREEZ) & (qi_u > 1.0e-10),
                             eff_berg, 0.0)
        dq_berg = jnp.minimum(jnp.maximum(ql_u - dq_frz, 0.0),
                              eff_berg * ql_u / TAU_BERG * tau)
        dq_frz = dq_frz + dq_berg
        dq_hom = jnp.where(x["tug"] <= T_HOM,
                           jnp.maximum(ql_u - dq_frz, 0.0), 0.0)
        dq_frz = jnp.where(x["tug"] <= T_HOM, ql_u, dq_frz)
        frac_frz = dq_frz / jnp.maximum(ql_u, eps)
        dn_l = jnp.minimum(nl_u * frac_frz, nl_u)
        dn_i = dn_l + jnp.maximum(dn_nuc - dn_l, 0.0)
        # droplet-number loss split for the FHTIM_N/FHTCT_N diagnostics
        dn_imm_n = dn_l * dq_imm / jnp.maximum(dq_frz, eps)
        dn_ct_n = dn_nuc
        ql_u = ql_u - dq_frz
        qi_u = qi_u + dq_frz
        nl_u = nl_u - dn_l
        ni_u = ni_u + dn_i

        # ---- autoconversion + accretion (KK2000) ----
        nc_cm3 = jnp.maximum(nl_u * x["rho"] * 1.0e-6, 1.0)
        auto = KK_A * jnp.maximum(ql_u, 0.0) ** 2.47 * nc_cm3 ** (-1.79)
        dq_auto = jnp.minimum(ql_u, auto * tau)
        dq_rain = dq_auto
        frac_rain = dq_rain / jnp.maximum(ql_u, eps)
        dn_auto_n = nl_u * frac_rain
        nl_u = nl_u * (1.0 - frac_rain)
        ql_u = ql_u - dq_rain
        accr = KK_ACC * (jnp.maximum(ql_u, 0.0) *
                         jnp.maximum(dq_rain, 0.0)) ** 1.15
        dq_accr = jnp.minimum(ql_u, accr * tau)
        frac_accr = dq_accr / jnp.maximum(ql_u, eps)
        dn_accr_n = nl_u * frac_accr
        nl_u = nl_u * (1.0 - frac_accr)
        ql_u = ql_u - dq_accr
        dq_rain = dq_rain + dq_accr

        # ---- ice -> snow ----
        conv = jnp.maximum(qi_u - QI0_SNOW, 0.0) / TAU_SNOW
        dq_snow = jnp.minimum(qi_u, conv * tau)
        frac_snow = dq_snow / jnp.maximum(qi_u, eps)
        ni_u = ni_u * (1.0 - frac_snow)
        qi_u = qi_u - dq_snow

        zero = jnp.zeros_like(ql_u)
        sel = lambda v: jnp.where(live & pos, v, zero)
        new_cy = dict(
            f_ql=sel(ql_u * mu_k), f_qi=sel(qi_u * mu_k),
            f_nl=sel(nl_u * mu_k), f_ni=sel(ni_u * mu_k),
            w2=jnp.where(live, w2, zero), mu_b=mu_k)
        rate = lambda dq: jnp.where(live & pos,
                                    dq * mu_k / jnp.maximum(x["dz"], eps),
                                    zero)
        # frz carries the FULL latent-ice release of this level: droplet
        # freezing (dq_frz) plus direct vapor->ice deposition (the cmei
        # share of new condensate) — the hu/q1q2 budgets heat by
        # latice*frz, and ice formed by either path leaves the column as
        # snow or detrained ice with no further latent-ice debit
        cmei_pos = jnp.where(live & pos, jnp.maximum(x["cmei"], 0.0), zero)
        outs = (sel(ql_u), sel(qi_u), sel(nl_u), sel(ni_u),
                rate(dq_rain), rate(dq_snow),
                rate(dq_frz) + cmei_pos,
                jnp.where(live, wu, zero),
                # per-process diagnostics (conv% rates family)
                rate(dq_auto), rate(dq_accr),
                rate(dq_imm), rate(dq_ct), rate(dq_hom), rate(dq_berg),
                rate(dn_act), rate(dn_auto_n), rate(dn_accr_n),
                rate(dn_imm_n), rate(dn_ct_n))
        return new_cy, outs

    if scan_impl is None:
        scan_impl = LAX_SCAN
    _, (qliq, qice, qnl, qni, rprd, sprd, frz, wu,
        auto_m, accr_m, imm_m, ct_m, hom_m, berg_m,
        act_n, auto_n, accr_n, imm_n, ct_n) = scan_impl.scan(
        step, carry0, xs, reverse=True)

    rates = dict(AUTOL_M=auto_m, ACCRL_M=accr_m, FHTIM_M=imm_m,
                 FHTCT_M=ct_m, HMPI_M=hom_m, BERGN_M=berg_m,
                 ACTIV_N=act_n, AUTOL_N=auto_n, ACCRL_N=accr_n,
                 FHTIM_N=imm_n, FHTCT_N=ct_n)
    return ZMMphyOut(qliq=qliq, qice=qice, qnl=qnl, qni=qni,
                     qcde=qliq, qide=qice, qncde=qnl, qnide=qni,
                     rprd=rprd, sprd=sprd, frz=frz, wu=wu, rates=rates)


# =============================================================================
# cldprp  (zm_conv.F90:3024-4026)
# =============================================================================

@struct.dataclass
class CldprpOut:
    mu: jnp.ndarray
    eu: jnp.ndarray
    du: jnp.ndarray
    md: jnp.ndarray
    ed: jnp.ndarray
    sd: jnp.ndarray
    qd: jnp.ndarray
    mc: jnp.ndarray
    qu: jnp.ndarray
    su: jnp.ndarray
    qst: jnp.ndarray
    hmn: jnp.ndarray
    hsat: jnp.ndarray
    ql: jnp.ndarray
    qcde: jnp.ndarray
    cu: jnp.ndarray
    evp: jnp.ndarray
    cmeg: jnp.ndarray
    rprd: jnp.ndarray
    pflx: jnp.ndarray      # (ncol, pver+1)
    jt: jnp.ndarray
    jlcl: jnp.ndarray
    j0: jnp.ndarray
    jd: jnp.ndarray
    # --- microp extension (zmconv_microp; zeros when off) ---
    qide: jnp.ndarray     # detrainable ice (q1q2: di = du*qide(k+1))
    qncde: jnp.ndarray    # detrainable droplet number
    qnide: jnp.ndarray    # detrainable crystal number
    sprd: jnp.ndarray     # snow production (cu units until zm_convr scales)
    frz: jnp.ndarray      # freezing rate (cu units)
    qliq: jnp.ndarray     # in-plume liquid (conv%qliq diagnostics)
    qice: jnp.ndarray     # in-plume ice
    qnl: jnp.ndarray
    qni: jnp.ndarray
    wu: jnp.ndarray       # updraft vertical velocity (m/s)
    dcape: jnp.ndarray    # (ncol,) freezing-CAPE increment (loc_conv%dcape)
    mrates: dict          # per-process rates (conv% family; {} when off)


def cldprp(cfg: ZMConfig, msg: int, q, t, p, z, s, zf, shat, qhat, jb, lel,
           landfrac, scan_impl=LAX_SCAN, eu_only: bool = False,
           aero: dict | None = None) -> CldprpOut:
    """Updraft/downdraft plume properties (cldprp, zm_conv.F90:3024-4026),
    zmconv_microp=off path. All mass fluxes normalized by cloud-base flux;
    eu/du/ed returned in 1/m (converted to 1/mb by the caller, matching
    zm_convr:1252-1262).

    `eu_only=True` returns just the finalized entrainment profile eu —
    the only first-call output the reference's second_call diagnosis
    consumes (zm_conv.F90:1046-1078) — skipping the ascent/rain/downdraft
    sections entirely.
    """
    ncol, pver = _shape_cp(t)
    dtype = t.dtype
    karr = _karr2(pver)
    small = 1.0e-20

    c0mask = cfg.c0_ocn * (1.0 - landfrac) + cfg.c0_lnd * landfrac
    tiedke_msk = cfg.tiedke_add * (1.0 - landfrac) + cfg.tiedke_lnd * landfrac

    dz = _lsl(zf, slice(None, -1)) - _lsl(zf, slice(1, None))

    est, qst = qsat_hpa(t, p)
    qst = jnp.where(p - est <= 0.0, 1.0, qst)

    # tht moist-thermo effective constants (zm_conv.F90:3290-3300)
    mrd = (1.0 + c.ZVIR * q) * RGAS
    mcp = (1.0 + CPVIR * q) * CP
    mrl = (1.0 - DCOL * (t - TFREEZ)) * RL
    gamma = qst * (1.0 + qst / EPS1) * EPS1 * mrl / (mrd * t * t) * mrl / mcp
    hmn = mcp * t + GRAV * z + mrl * q
    hsat = mcp * t + GRAV * z + mrl * qst

    # interface log-means (zm_conv.F90:3355-3380)
    qsthat = _log_mean_interface(qst)
    gamhat = _log_mean_interface(gamma)
    hsthat = mcp * shat + mrl * qsthat
    if msg + 1 > 0:
        topm = karr <= msg
        qsthat = jnp.where(topm, qst, qsthat)
        gamhat = jnp.where(topm, gamma, gamhat)
        hsthat = jnp.where(topm, hsat, hsthat)

    # initial jt and j0 (zm_conv.F90:3385-3416); F's max(lel, limcnv+1) with
    # limcnv_f = msg+1 maps to max(lel0, msg+1) in 0-based indices
    jt0 = jnp.minimum(jnp.maximum(lel, msg + 1), pver - 1)
    jd = jnp.full((ncol,), pver - 1, jnp.int32)

    in_jtjb = (karr >= _c(jt0)) & (karr <= _c(jb)) & (karr >= msg)
    hsat_m = jnp.where(in_jtjb, hsat, jnp.inf)
    # Fortran keeps the LAST k attaining the min (<=): value-min reduction,
    # then largest k attaining it (argmin/flip-free — Mosaic-safe)
    vmin = _lmin(hsat_m)
    j0 = _lmax(jnp.where(hsat_m == _c(vmin), karr, -1)).astype(jnp.int32)
    j0 = jnp.clip(j0, jt0 + 2, jb - 2)
    j0 = jnp.minimum(j0, pver - 1)

    hmn_mx = _take_col(hmn, jb)

    # Taylor-series integrals (zm_conv.F90:3430-3442), bottom-up scan
    xsT = dict(hmn=hmn, dz=dz)
    z4 = jnp.zeros((ncol,), dtype)
    carryT = dict(k1=z4, i2=z4, i3=z4, i4=z4)

    def taylor_step(cy, x, k):
        inw = (k < jb) & (k >= jt0)
        k1 = jnp.where(inw, cy["k1"] + (hmn_mx - x["hmn"]) * x["dz"], 0.0)
        ihat = 0.5 * (cy["k1"] + k1)
        i2 = jnp.where(inw, cy["i2"] + ihat * x["dz"], 0.0)
        idag = 0.5 * (cy["i2"] + i2)
        i3 = jnp.where(inw, cy["i3"] + idag * x["dz"], 0.0)
        iprm = 0.5 * (cy["i3"] + i3)
        i4 = jnp.where(inw, cy["i4"] + iprm * x["dz"], 0.0)
        return dict(k1=k1, i2=i2, i3=i3, i4=i4), (k1, i2, i3, i4)

    _, (k1a, i2a, i3a, i4a) = scan_impl.scan(taylor_step, carryT, xsT,
                                             reverse=True)

    # hmin over [j0, jb] and expdif (zm_conv.F90:3448-3456)
    in_j0jb = (karr >= _c(j0)) & (karr <= _c(jb)) & (karr >= msg)
    hmin2 = _lmin(jnp.where(in_j0jb, hmn, jnp.inf))
    expdif = hmn_mx - hmin2

    # eps(z) Taylor series (zm_conv.F90:3463-3487)
    z_b = _above(z)                                           # z(k-1)
    hsat_b = _above(hsat)
    zf_top = _lsl(zf, slice(None, -1))
    expnum = _c(hmn_mx) - (hsat_b * (zf_top - z) +
                           hsat * (z_b - zf_top)) / \
        jnp.where(z_b - z == 0, 1e-30, z_b - z)
    in_win = (karr >= _c(jt0)) & (karr < _c(jb))
    expnum = jnp.where(in_win, expnum, 0.0)
    cond_f = (_c(expdif) > 100.0) & (expnum > 0.0) & \
        (k1a > expnum * dz) & in_win
    ftemp = jnp.where(cond_f, _safe_div(expnum, k1a), 0.0)
    f = ftemp + _safe_div(i2a, k1a) * ftemp ** 2 + \
        _safe_div(2.0 * i2a ** 2 - k1a * i3a, k1a ** 2) * ftemp ** 3 + \
        _safe_div(-5.0 * k1a * i2a * i3a + 5.0 * i2a ** 3 + k1a ** 2 * i4a,
                  k1a ** 3) * ftemp ** 4
    f = jnp.where(cond_f, jnp.clip(f, 0.0, cfg.entrmn), 0.0)

    # j0 bump (zm_conv.F90:3488-3492)
    f_j0 = _take_col(f, j0)
    f_j0p1 = _take_col(f, jnp.minimum(j0 + 1, pver - 1))
    bump = (j0 < jb) & (f_j0 < 1.0e-6) & (f_j0p1 > f_j0)
    j0 = jnp.where(bump, j0 + 1, j0)

    # running max of f for jt <= k <= j0 (zm_conv.F90:3493-3498), top-down scan
    def cummax_step(prev, x, k):
        inw = (k >= jt0) & (k <= j0)
        newf = jnp.where(inw, jnp.maximum(x["f"], prev), x["f"])
        return newf, (newf,)

    _, (f,) = scan_impl.scan(cummax_step, jnp.zeros((ncol,), dtype),
                             dict(f=f), reverse=False)

    eps0 = _take_col(f, j0)
    in_j0jb2 = (karr >= _c(j0)) & (karr <= _c(jb))
    in_jtj0 = (karr < _c(j0)) & (karr >= _c(jt0))
    eps = jnp.where(in_j0jb2, _c(eps0), jnp.where(in_jtj0, f, 0.0))

    active = eps0 > 0.0

    # updraft mass flux profile (zm_conv.F90:3547-3569). With microp the
    # profile window opens at lel instead of the initial jt (F tmplel,
    # :3545-3560) — the plume extends to its thermodynamic top and the
    # ascent below decides the final jt.
    microp = bool(cfg.microp)
    zf_jb = _take_col(zf, jb)
    zuef = _lsl(zf, slice(None, -1)) - _c(zf_jb)
    eps_b = _below(eps)
    safe_zuef = jnp.where(zuef == 0.0, 1e-30, zuef)
    inv_eps0 = _c(_safe_div(jnp.ones_like(eps0), eps0))
    rmue = inv_eps0 * (jnp.exp(eps_b * zuef) - 1.0) / safe_zuef
    mu_f = inv_eps0 * (jnp.exp(eps * zuef) - 1.0) / safe_zuef

    tmplel_prof = lel.astype(jnp.int32) if microp else jt0
    in_upd = (karr >= _c(tmplel_prof)) & (karr < _c(jb)) & _col(active)
    mu0 = jnp.where(in_upd, mu_f, 0.0)
    at_jb = karr == _c(jb)
    mu0 = jnp.where(at_jb & _col(active), 1.0, mu0)
    mu_below = _below(mu0)
    eu0 = jnp.where(in_upd, (rmue - mu_below) / dz, 0.0)
    eu0 = jnp.where(at_jb & _col(active),
                    _safe_div(jnp.ones_like(dz), dz), eu0)
    du0 = jnp.where(in_upd, (rmue - mu0) / dz, 0.0)

    # loop-invariant pieces of the ascent
    hu0 = jnp.where((karr >= _c(jt0)) & (karr <= _c(jb)),
                    _c(hmn_mx) + CP * _c(tiedke_msk), hmn)
    hu_jb = hmn_mx + CP * tiedke_msk
    q_mx = _take_col(q, jb)
    p_b3 = _above(p)   # p(k-1)
    zf_top = _lsl(zf, slice(None, -1))
    # default for levels the ascent never writes: the reference's
    # tiedke-perturbed initialization su = s(mx) + tiedke/(1+cpvir·q)
    # inside [jt0, jb] (zm_conv.F90:3417-3421; survives at k = jt where
    # only hu is reset to hmn) and the environment s elsewhere. Values in
    # the band are multiplied by mu = 0 downstream — this matters only for
    # field-level reference parity (tests/test_zm_oracle_parity.py).
    su_dflt = jnp.where((karr >= _c(jt0)) & (karr <= _c(jb)),
                        _c(_take_col(s, jb)) +
                        _c(tiedke_msk) / (1.0 + CPVIR * q), s)

    # ---- plume iteration (zm_conv.F90:3526-3874): one pass without
    # microphysics; TWO with (iter 1 computes the plume and its freezing
    # rate, iter 2 re-ascends with the freezing heat in the hu budget —
    # the in-plume feedback loop) ----
    frz = jnp.zeros_like(t)
    jto = None
    # dcape reference profile: initialized to the ENVIRONMENT interface
    # virtual temperature everywhere (zm_conv.F90:3304-3307) and
    # overwritten inside iteration-1's plume window below — levels that
    # only iteration-2's window reaches must difference against the
    # environment, not zero (review finding r5)
    tvuo = (shat - GRAV / mcp * zf_top) * (1.0 + c.ZVIR * qhat)
    dcape = jnp.zeros((ncol,), dtype)
    mp = None

    for itr in range(2 if microp else 1):
        totfrz = _lsum(frz * dz)

        # hu ascent with mu<0.02 cutoff (zm_conv.F90:3571-3599), bottom-up
        xsH = dict(mu=mu0, eu=eu0, du=du0, dz=dz, hmn=hmn, hsat=hsat,
                   hu0=hu0, frz=frz)
        carryH = dict(mu_b=jnp.zeros((ncol,), dtype), hu_b=hu_jb)

        def hu_step(cy, x, k):
            inw = (k <= jb - 1) & (k >= lel) & active
            weak = x["mu"] < 0.02
            mu_k = jnp.where(inw & weak, 0.0, x["mu"])
            eu_k = jnp.where(inw & weak, 0.0, x["eu"])
            du_k = jnp.where(inw & weak, cy["mu_b"] / x["dz"], x["du"])
            if microp:
                # freezing heat enters the plume MSE budget; detrainment
                # carries hu itself (zm_conv.F90:3588-3591)
                hu_full = (cy["mu_b"] * cy["hu_b"] + x["dz"] *
                           (eu_k * x["hmn"] + c.LATICE * x["frz"])) / \
                    jnp.maximum(mu_k + x["dz"] * du_k, 1e-30)
            else:
                hu_full = _safe_div(cy["mu_b"], mu_k) * cy["hu_b"] + \
                    _safe_div(x["dz"], mu_k) * \
                    (eu_k * x["hmn"] - du_k * x["hsat"])
            hu_k = jnp.where(
                inw, jnp.where(weak, x["hmn"], hu_full), x["hu0"])
            at_base = k == jb
            mu_out = jnp.where(at_base, x["mu"], mu_k)
            hu_out = jnp.where(at_base, x["hu0"], hu_k)
            new_cy = dict(mu_b=mu_out,
                          hu_b=jnp.where(inw | at_base, hu_out, cy["hu_b"]))
            return new_cy, (mu_out, jnp.where(at_base, x["eu"], eu_k),
                            jnp.where(at_base, x["du"], du_k), hu_out)

        _, (mu, eu, du, hu) = scan_impl.scan(hu_step, carryH, xsH,
                                             reverse=True)

        # jt detection (zm_conv.F90:3606-3629): first k from bottom in
        # [lel-1, jb-2] matching either condition; with microp a plume
        # whose column has freezing heat (totfrz > 0) is NOT killed by the
        # hu-overshoot condition (:3622)
        hu_b2 = _below(hu)
        hsthat_b = _below(hsthat)
        hu_at_jb = _take_col(hu, jb)
        in_det = (karr <= _c(jb) - 2) & (karr >= _c(lel) - 1)
        cond1 = (hu <= hsthat) & (hu_b2 > hsthat_b) & (mu >= 0.02)
        cond2 = ((hu > _c(hu_at_jb)) & _col(totfrz <= 0.0)) | (mu < 0.02)
        anyc = in_det & (cond1 | cond2)
        jt_cand = jnp.where(cond1,
                            jnp.where(hu - hsthat < -2000.0, karr + 1, karr),
                            karr + 1)
        det_k, det_found = _first_true_from_bottom(
            anyc, jnp.zeros((ncol,), jnp.int32))
        jt = jnp.where(det_found,
                       _take_col(jt_cand, det_k.astype(jnp.int32)),
                       jt0).astype(jnp.int32)

        # zero the region above jt (zm_conv.F90:3633-3648)
        above_jt = (karr >= _c(lel)) & (karr <= _c(jt)) & _col(active)
        mu_below2 = _below(mu)
        at_jt = (karr == _c(jt)) & _col(active)
        mu = jnp.where(above_jt, 0.0, mu)
        eu = jnp.where(above_jt | at_jt, 0.0, eu)
        hu = jnp.where(above_jt, hmn, hu)
        du = jnp.where(above_jt, 0.0, du)
        du = jnp.where(at_jt, mu_below2 / dz, du)

        if eu_only and not microp:
            # first-call slim path: under second_call, the reference
            # consumes ONLY eu from the first cldprp (the entrainment-rate
            # diagnosis, zm_conv.F90:1046-1078; every other first-call
            # output is overwritten by the post-retrigger second call). eu
            # is final after the jt zeroing above, so the su/qu ascent,
            # rain production, and downdraft sections (~60% of the
            # routine) are skipped. Arithmetic for eu is identical to the
            # full path. (With microp, eu depends on the freezing
            # iteration, so the full loop runs and eu returns below.)
            return eu

        # tu initialisation (zm_conv.F90:3652-3657) with env qu
        qu_init = q
        tu = (hu - GRAV * zf_top - (1.0 + DCOL * TFREEZ) * RL * qu_init) / \
            (CP * (1.0 + (CPVIR - DCOL * (RL / CP)) * qu_init))

        # su/qu ascent + jlcl detection (zm_conv.F90:3659-3706), bottom-up
        xsS = dict(mu=mu, eu=eu, du=du, dz=dz, s=s, q=q, qst=qst, hu=hu,
                   zf=zf_top, p=p, pm1=p_b3, tu0=tu, su0=su_dflt)
        carryS = dict(su_b=jnp.zeros((ncol,), dtype),
                      qu_b=jnp.zeros((ncol,), dtype),
                      mu_b=jnp.zeros((ncol,), dtype),
                      done=jnp.zeros((ncol,), dtype),  # 0/1 (bool carries
                      jlcl=lel.astype(jnp.int32))      # not Mosaic-friendly)

        def suqu_step(cy, x, k):
            at_base = (k == jb) & active
            tu_base = (x["hu"] - GRAV * x["zf"] -
                       (1.0 + DCOL * TFREEZ) * RL * q_mx) / \
                (CP * (1.0 + (CPVIR - DCOL * (RL / CP)) * q_mx))
            su_base = (x["hu"] - (1.0 - DCOL * (tu_base - TFREEZ)) * RL *
                       q_mx) / ((1.0 + CPVIR * q_mx) * CP)

            not_done = cy["done"] < 0.5
            inw = not_done & (k > jt) & (k < jb) & active
            su_k = _safe_div(cy["mu_b"], x["mu"]) * cy["su_b"] + \
                _safe_div(x["dz"], x["mu"]) * (x["eu"] - x["du"]) * x["s"]
            qu_k = _safe_div(cy["mu_b"], x["mu"]) * cy["qu_b"] + \
                _safe_div(x["dz"], x["mu"]) * (x["eu"] * x["q"] -
                                               x["du"] * x["qst"])
            tu_k = su_k - GRAV / ((1.0 + 0.85 * qu_k) * CP) * x["zf"]
            _, qstu = qsat_hpa(tu_k, 0.5 * (x["p"] + x["pm1"]))
            sat = inw & (qu_k >= qstu)

            su_out = jnp.where(at_base, su_base,
                               jnp.where(inw, su_k, x["su0"]))
            qu_out = jnp.where(at_base, q_mx, jnp.where(inw, qu_k, x["q"]))
            tu_out = jnp.where(at_base, tu_base,
                               jnp.where(inw, tu_k, x["tu0"]))
            done = jnp.where(sat, 1.0, cy["done"])
            jlcl = jnp.where(sat & not_done, k, cy["jlcl"]).astype(jnp.int32)
            new_cy = dict(
                su_b=jnp.where(at_base | inw, su_out, cy["su_b"]),
                qu_b=jnp.where(at_base | inw, qu_out, cy["qu_b"]),
                mu_b=x["mu"], done=done, jlcl=jlcl)
            return new_cy, (su_out, qu_out, tu_out)

        cyS, (su, qu, tu) = scan_impl.scan(suqu_step, carryS, xsS,
                                           reverse=True)
        jlcl = cyS["jlcl"]

        # saturated portion jt < k <= jlcl (zm_conv.F90:3708-3722)
        in_sat = (karr > _c(jt)) & (karr <= _c(jlcl)) & _col(active)
        qu_sat = qsthat + gamhat * (hu - hsthat) / \
            ((1.0 - DCOL * (tu - TFREEZ)) * RL * (1.0 + gamhat))
        su_sat = shat + (hu - hsthat) / ((1.0 + CPVIR * qu_sat) * CP *
                                         (1.0 + gamhat))
        tu_sat = su_sat - GRAV / ((1.0 + CPVIR * qu_sat) * CP) * zf_top
        qu = jnp.where(in_sat, qu_sat, qu)
        su = jnp.where(in_sat, su_sat, su)
        tu = jnp.where(in_sat, tu_sat, tu)

        # condensation in updraft (zm_conv.F90:3730-3759); microp bounds
        # the loop at jlcl+1 (tmplel, :3725-3729) and subtracts the
        # freezing term from the vapor condensation
        mu_b3 = _below(mu)
        su_b3 = _below(su)
        if microp:
            in_cu = (karr >= _c(jt)) & (karr <= _c(jlcl)) & _col(active)
            cu = ((mu * su - mu_b3 * su_b3) / dz - eu * s + du * su) / \
                (RL / CP) * ((1.0 + CPVIR * qu) /
                             (1.0 - DCOL * (tu - TFREEZ))) - \
                c.LATICE * frz / RL
        else:
            in_cu = (karr >= _c(jt)) & (karr < _c(jb)) & _col(active)
            cu = ((mu * su - mu_b3 * su_b3) / dz - (eu - du) * s) / \
                (RL / CP) * ((1.0 + CPVIR * qu) /
                             (1.0 - DCOL * (tu - TFREEZ)))
        cu = jnp.where(in_cu & (karr != _c(jt)), jnp.maximum(cu, 0.0), 0.0)

        if microp:
            # ice fraction of new condensate from the in-plume T of the
            # level below (tug, zm_conv.F90:3710-3737)
            tug = su - (GRAV / CP) * zf_top / (1.0 + CPVIR * qu)
            tug_b = _below(tug)
            fice = jnp.where(tug_b > TFREEZ, 0.0,
                             jnp.where(tug_b < 233.15, 1.0,
                                       (TFREEZ - tug_b) / 40.0))
            fice = jnp.where(karr == pver - 1, 0.0, fice)
            cmel = cu * (1.0 - fice)
            cmei = cu * fice

            mp = zm_mphy(cfg, su, qu, mu, du, eu, cmel, cmei, dz, zf_top,
                         p, t, q, jt, jb, active, landfrac, aero=aero,
                         scan_impl=scan_impl)
            frz = mp.frz
            ql = mp.qliq + mp.qice
            if itr == 0:
                jto = jt
                # virtual T of the no-freezing plume (dcape reference,
                # zm_conv.F90:3822-3824)
                in_dc = (karr > _c(jt)) & (karr <= _c(jlcl)) & _col(active)
                tvuo = jnp.where(in_dc, (su - GRAV / CP * zf_top) *
                                 (1.0 + 0.608 * qu), tvuo)
            else:
                # new top lower than iter-1's: zero frz/cu in [jto, jt]
                # (zm_conv.F90:3804-3810)
                fix = _col((jt > jto) & active) & (karr <= _c(jt)) & \
                    (karr >= _c(jto))
                frz = jnp.where(fix, 0.0, frz)
                cu = jnp.where(fix, 0.0, cu)
                # freezing-CAPE increment (zm_conv.F90:3822-3836)
                in_dc2 = (karr > _c(jnp.maximum(jt, jto))) & \
                    (karr <= _c(jlcl)) & _col(active)
                tvu = jnp.where(
                    in_dc2,
                    (su - GRAV / (CP * (1.0 + CPVIR * qu)) * zf_top) *
                    (1.0 + 0.608 * qu), 0.0)
                dcape = _lsum(jnp.where(in_dc2,
                                        RGAS * (tvu - tvuo) *
                                        jnp.log(p / p_b3), 0.0))
            # totpcp with the two-phase detrainment (zm_conv.F90:3814-3820)
            det_b = _below(mp.qcde + mp.qide)
            in_tp = (karr >= _c(jt)) & (karr < _c(jb)) & _col(active) & \
                (mu >= 0.0)
            totpcp = _lsum(jnp.where(in_tp, dz * (cu - du * det_b), 0.0))
            # reference convention: rprd is TOTAL precip production and
            # sprd its snow portion; after the downdraft-evaporation
            # subtraction below, rprd can drop under sprd (or negative)
            # exactly as in the reference (:4190)
            rprd = mp.rprd + mp.sprd
            qcde = mp.qcde
        else:
            # liquid water + rain production (zm_conv.F90:3953-3975),
            # bottom-up scan
            xsQ = dict(mu=mu, du=du, cu=cu, dz=dz)
            carryQ = dict(ql_b=jnp.zeros((ncol,), dtype),
                          mu_b=jnp.zeros((ncol,), dtype),
                          totpcp=jnp.zeros((ncol,), dtype))

            def ql_step2(cy, x, k):
                inw = (k >= jt) & (k < jb) & active & (x["mu"] >= 0.0)
                pos = x["mu"] > 0.0
                ql1 = _safe_div(cy["mu_b"] * cy["ql_b"] -
                                x["dz"] * x["du"] * cy["ql_b"]
                                + x["dz"] * x["cu"], x["mu"])
                ql_k = jnp.where(inw & pos, ql1 / (1.0 + x["dz"] * c0mask),
                                 0.0)
                totpcp = cy["totpcp"] + jnp.where(
                    inw, x["dz"] * (x["cu"] - x["du"] * cy["ql_b"]), 0.0)
                rprd_k = jnp.where(inw, c0mask * x["mu"] * ql_k, 0.0)
                new_cy = dict(
                    ql_b=jnp.where(inw, ql_k,
                                   jnp.where(k == jb, 0.0, cy["ql_b"])),
                    mu_b=x["mu"], totpcp=totpcp)
                return new_cy, (ql_k, rprd_k)

            cyQ, (ql, rprd) = scan_impl.scan(ql_step2, carryQ, xsQ,
                                             reverse=True)
            totpcp = cyQ["totpcp"]
            qcde = ql
    # ---- end plume iteration ----
    if eu_only:
        # microp + eu_only (second_call first plume pass): eu is final
        # after the loop; the downdraft/evap/pflx sections below do not
        # feed it (the non-microp slim path returned inside the loop)
        return eu
    totpcp = jnp.maximum(totpcp, 0.0)

    # ---- downdraft (zm_conv.F90:4030-4106) ----
    alfa = cfg.alfadet
    jt = jnp.minimum(jt, jb - 1)
    jd = jnp.clip(jnp.maximum(j0, jt + 1), None, jb)
    zf_jd = _take_col(zf, jd)
    zdef = _c(zf_jd) - zf_top
    in_dd = (karr > _c(jd)) & (karr <= _c(jb)) & _col(active)
    safe_zdef = jnp.where(zdef == 0.0, 1e-30, zdef)
    md = jnp.where(in_dd,
                   _c(-alfa / (2.0 * jnp.where(eps0 == 0, 1e-30, eps0))) *
                   (jnp.exp(2.0 * _c(eps0) * zdef) - 1.0) / safe_zdef, 0.0)
    at_jd = (karr == _c(jd)) & _col(jd < jb) & _col(active)
    md = jnp.where(at_jd, -alfa, md)

    mu_jb = _take_col(mu, jb)
    md_jb = _take_col(md, jb)
    ratmjb = jnp.minimum(jnp.abs(_safe_div(mu_jb, md_jb)), 1.0)
    in_scale = (karr >= _c(jt)) & (karr <= _c(jb)) & \
        _col(active) & _col(jd < jb)
    md = jnp.where(in_scale, md * _c(ratmjb), md)

    # ed and hd (zm_conv.F90:4108-4118): F writes ed(k-1) = (md(k-1)-md(k))/dz
    # for F k >= jt_f, i.e. 0-based ed(j) = (md(j)-md(j+1))/dz(j) for j >= jt-1
    md_b4 = _below(md)   # md(k+1)
    in_ed = (karr >= _c(jt) - 1) & _col(active)
    ed = jnp.where(in_ed, (md - md_b4) / dz, 0.0)

    hd0 = hmn
    xsD = dict(md=md, ed=ed, dz=dz, hmn=hmn, hd0=hd0)
    carryD = dict(hd_p=_lsl(hmn, 0), md_p=jnp.zeros((ncol,), dtype),
                  ed_p=jnp.zeros((ncol,), dtype),
                  hmn_p=_lsl(hmn, 0), dz_p=_lsl(dz, 0))

    def hd_step(cy, x, k):
        # F writes hd(i,k) for F k >= jt_f, i.e. 0-based hd(j) for j >= jt:
        # hd(j) = (md(j-1) hd(j-1) - dz(j-1) ed(j-1) hmn(j-1)) / min(md(j), -small)
        inw = (k >= jt) & active
        mdt = jnp.minimum(x["md"], -small)
        hd_k = jnp.where(inw,
                         (cy["md_p"] * cy["hd_p"] -
                          cy["dz_p"] * cy["ed_p"] * cy["hmn_p"]) / mdt,
                         x["hd0"])
        new_cy = dict(hd_p=hd_k, md_p=x["md"], ed_p=x["ed"],
                      hmn_p=x["hmn"], dz_p=x["dz"])
        return new_cy, (hd_k,)

    _, (hd,) = scan_impl.scan(hd_step, carryD, xsD, reverse=False)

    # qds + td (zm_conv.F90:4122-4137)
    in_qds = (karr >= _c(jd)) & (karr <= _c(jb)) & \
        _col(active) & _col(jd < jb)
    qds0 = qsthat + gamhat * (hd - hsthat) / (RL * (1.0 + gamhat))
    td = (hd - GRAV * zf_top - (1.0 + DCOL * TFREEZ) * RL * qds0) / \
        (CP * (1.0 + (CPVIR - DCOL * (RL / CP)) * qds0))
    qds = jnp.where(in_qds,
                    qsthat + gamhat * (hd - hsthat) /
                    ((1.0 - DCOL * (td - TFREEZ)) * RL * (1.0 + gamhat)), q)

    # sd/qd/evp descent (zm_conv.F90:4139-4171): top-down scan
    sd0 = s
    qd0 = q
    qd_jd = _take_col(qds, jd)
    sd_jd_t = _take_col(td, jd)
    hd_jd = _take_col(hd, jd)
    zf_jdv = zf_jd
    sd_jd = (hd_jd - (1.0 - DCOL * (sd_jd_t - TFREEZ)) * RL * qd_jd) / \
        ((1.0 + CPVIR * qd_jd) * CP)
    # the reference OVERWRITES td(jd) after setting sd(jd)
    # (zm_conv.F90:3947 "BUG FIX 2019 05 24" block): the first descent
    # step's latent-heat factor uses this updated value, not the
    # qds-loop td
    td_jd = sd_jd - GRAV / ((1.0 + CPVIR * qd_jd) * CP) * zf_jdv

    qds_b = _below(qds)
    xsE = dict(md=md, md_b=md_b4, ed=ed, dz=dz, q=q, s=s, td=td, qds=qds,
               qds_b=qds_b)
    carryE = dict(sd_c=sd_jd, totevp=jnp.zeros((ncol,), dtype))

    def evp_step(cy, x, k):
        at_jd_k = k == jd
        sd_k = jnp.where(at_jd_k, sd_jd, cy["sd_c"])
        td_k = jnp.where(at_jd_k, td_jd, x["td"])
        inw = (k >= jd) & (k < jb) & active
        qd_k = jnp.where(k == jd, qd_jd, x["qds"])
        evp_k = -x["ed"] * x["q"] + (x["md"] * qd_k - x["md_b"] * x["qds_b"]) / x["dz"]
        evp_k = jnp.where(inw, jnp.maximum(evp_k, 0.0), 0.0)
        mdt = jnp.minimum(x["md_b"], -small)
        sd_next = ((1.0 - DCOL * (td_k - TFREEZ)) * RL /
                   ((1.0 + CPVIR * qd_k) * CP) * evp_k - x["ed"] * x["s"]) * \
            x["dz"] + x["md"] * sd_k
        sd_next = jnp.where(inw, sd_next / mdt, cy["sd_c"])
        totevp = cy["totevp"] - jnp.where(inw, x["dz"] * x["ed"] * x["q"], 0.0)
        new_cy = dict(sd_c=jnp.where(inw, sd_next, sd_k), totevp=totevp)
        return new_cy, (sd_k, qd_k, evp_k)

    cyE, (sd, qd, evp) = scan_impl.scan(evp_step, carryE, xsE, reverse=False)
    # levels outside [jd, jb): environment values (initialized s, q)
    out_dd = ~((karr >= _c(jd)) & (karr <= _c(jb)))
    sd = jnp.where(out_dd, sd0, sd)
    qd = jnp.where(out_dd, qd0, qd)

    md_jd2 = _take_col(md, jd)
    md_jb2 = _take_col(md, jb)
    qd_jb = _take_col(qd, jb)
    totevp = cyE["totevp"] + md_jd2 * qd_jd - md_jb2 * qd_jb
    totevp = jnp.maximum(totevp, 0.0)

    # evap/precip consistency scaling (zm_conv.F90:4183-4200)
    both = (totevp > 0.0) & (totpcp > 0.0)
    fac = jnp.where(both, jnp.minimum(1.0, totpcp /
                                      jnp.where(totevp + totpcp == 0, 1e-30,
                                                totevp + totpcp)), 0.0)
    in_all = karr >= msg + 1
    md = jnp.where(in_all, md * _c(fac), md)
    ed = jnp.where(in_all, ed * _c(fac), ed)
    evp = jnp.where(in_all, evp * _c(fac), evp)
    cmeg = jnp.where(in_all, cu - evp, 0.0)
    rprd = jnp.where(in_all, rprd - evp, rprd)

    # precipitation flux through interfaces (zm_conv.F90:4203-4208)
    pflx = _lcat([_c(jnp.zeros((ncol,), dtype)), _cumsum_lvl(rprd * dz)])

    mc = mu + md

    if microp:
        qide, qncde, qnide = mp.qide, mp.qncde, mp.qnide
        sprd, frz_o = mp.sprd, frz
        qliq_o, qice_o, qnl_o, qni_o, wu_o = (mp.qliq, mp.qice, mp.qnl,
                                              mp.qni, mp.wu)
        mrates = mp.rates
    else:
        z2 = jnp.zeros_like(t)
        qide = qncde = qnide = sprd = frz_o = z2
        qliq_o = qice_o = qnl_o = qni_o = wu_o = z2
        mrates = {}

    return CldprpOut(mu=mu, eu=eu, du=du, md=md, ed=ed, sd=sd, qd=qd, mc=mc,
                     qu=qu, su=su, qst=qst, hmn=hmn, hsat=hsat, ql=ql,
                     qcde=qcde, cu=cu, evp=evp, cmeg=cmeg, rprd=rprd,
                     pflx=pflx, jt=jt, jlcl=jlcl, j0=j0, jd=jd,
                     qide=qide, qncde=qncde, qnide=qnide,
                     sprd=sprd, frz=frz_o, qliq=qliq_o, qice=qice_o,
                     qnl=qnl_o, qni=qni_o, wu=wu_o, dcape=dcape,
                     mrates=mrates)


# =============================================================================
# closure  (zm_conv.F90:4028-4260)
# =============================================================================

def closure(cfg: ZMConfig, msg: int, q, t, p, z, s, tp, qs, qu, su, mc, du,
            mu, md, qd, sd, qhat, shat, dp, qstp, zf, ql, dsubcld, cape, tl,
            lcl, lel, jt, mx):
    """CAPE-relaxation cloud-base mass flux (closure, zm_conv.F90:4028-4260).

    Returns mb (ncol,) in mb/s per unit normalized mass flux. All mass-flux
    profile inputs are normalized (mb=1); eu/du/ed are in 1/mb here.
    """
    ncol, pver = _shape_cp(t)
    dtype = t.dtype
    karr = _karr2(pver)

    q_mx = _take_col(q, mx)
    p_mx = _take_col(p, mx)
    t_mx = _take_col(t, mx)
    mu_mx = _take_col(mu, mx)
    md_mx = _take_col(md, mx)
    shat_mx = _take_col(shat, mx)
    su_mx = _take_col(su, mx)
    sd_mx = _take_col(sd, mx)
    qhat_mx = _take_col(qhat, mx)
    qu_mx = _take_col(qu, mx)
    qd_mx = _take_col(qd, mx)

    # subcloud-layer tendencies per unit mb (zm_conv.F90:4131-4143)
    dsub = jnp.where(dsubcld <= 0, 1e-30, dsubcld)
    eb = p_mx * q_mx / (EPS1 + q_mx)
    dtbdt = (1.0 / dsub) * (mu_mx * (shat_mx - su_mx) +
                            md_mx * (shat_mx - sd_mx))
    dqbdt = (1.0 / dsub) * (mu_mx * (qhat_mx - qu_mx) +
                            md_mx * (qhat_mx - qd_mx))
    debdt = EPS1 * p_mx / (EPS1 + q_mx) ** 2 * dqbdt
    dtldt = -2840.0 * (3.5 / t_mx * dtbdt - debdt / eb) / \
        (3.5 * jnp.log(t_mx) - jnp.log(eb) - 4.805) ** 2

    # cumulus heating/drying per unit mb (zm_conv.F90:4150-4185)
    mu_b = _below(mu)
    md_b = _below(md)
    mc_b = _below(mc)
    su_b = _below(su)
    sd_b = _below(sd)
    qu_b = _below(qu)
    qd_b = _below(qd)
    shat_b = _below(shat)
    qhat_b = _below(qhat)
    ql_b = _below(ql)

    at_jt = karr == _c(jt)
    dtmdt_jt = (1.0 / dp) * (mu_b * (su_b - shat_b - RL / CP * ql_b) +
                             md_b * (sd_b - shat_b))
    dqmdt_jt = (1.0 / dp) * (mu_b * (qu_b - qhat_b + ql_b) +
                             md_b * (qd_b - qhat_b))

    beta = 0.0
    in_mid = (karr > _c(jt)) & (karr < _c(mx))
    dtmdt_mid = (mc * (shat - s) - mc_b * (shat_b - s)) / dp - \
        RL / CP * du * (beta * ql + (1.0 - beta) * ql_b)
    dqmdt_mid = (mu_b * (qu_b - qhat_b + CP / RL * (su_b - s)) -
                 mu * (qu - qhat + CP / RL * (su - s)) +
                 md_b * (qd_b - qhat_b + CP / RL * (sd_b - s)) -
                 md * (qd - qhat + CP / RL * (sd - s))) / dp + \
        du * (beta * ql + (1.0 - beta) * ql_b)

    dtmdt = jnp.where(at_jt, dtmdt_jt, jnp.where(in_mid, dtmdt_mid, 0.0))
    dqmdt = jnp.where(at_jt, dqmdt_jt, jnp.where(in_mid, dqmdt_mid, 0.0))

    # dboydt integrand (zm_conv.F90:4188-4238)
    in_cape = (karr >= _c(lel)) & (karr <= _c(lcl))
    thetavp1 = tp * (1000.0 / p) ** (RGAS / CP) * \
        (1.0 + 1.608 * qstp - _c(q_mx))
    thetavm = t * (1000.0 / p) ** (RGAS / CP) * (1.0 + 0.608 * q)
    dqsdtp = qstp * (1.0 + qstp / EPS1) * EPS1 * RL / (RGAS * tp ** 2)
    tl_s = _c(jnp.where(tl <= 0, 1e-30, tl))
    dtpdt = tp / (1.0 + RL / CP * (dqsdtp - qstp / tp)) * \
        (_c(dtbdt) / _c(t_mx) +
         RL / CP * (_c(dqbdt) / tl_s - _c(q_mx) / tl_s ** 2 *
                    _c(dtldt)))
    dboydt1 = ((dtpdt / tp + 1.0 / (1.0 + 1.608 * qstp - _c(q_mx)) *
                (1.608 * dqsdtp * dtpdt - _c(dqbdt))) -
               (dtmdt / t + 0.608 / (1.0 + 0.608 * q) * dqmdt)) * \
        GRAV * thetavp1 / thetavm

    in_sub = (karr > _c(lcl)) & (karr < _c(mx))
    thetavp2 = tp * (1000.0 / p) ** (RGAS / CP) * \
        (1.0 + 0.608 * _c(q_mx))
    dboydt2 = (_c(dtbdt) / _c(t_mx) +
               0.608 / (1.0 + 0.608 * _c(q_mx)) * _c(dqbdt) -
               dtmdt / t - 0.608 / (1.0 + 0.608 * q) * dqmdt) * \
        GRAV * thetavp2 / thetavm

    dboydt = jnp.where(in_cape, dboydt1, jnp.where(in_sub, dboydt2, 0.0))

    # integrate dA/dt and close (zm_conv.F90:4243-4257)
    dzf = _lsl(zf, slice(None, -1)) - _lsl(zf, slice(1, None))
    seg = (karr >= _c(lel)) & (karr <= _c(mx) - 1)
    dadt = _lsum(jnp.where(seg, dboydt * dzf, 0.0))
    dltaa = -(cape - cfg.capelmt)
    mb = jnp.where(dadt != 0.0, jnp.maximum(dltaa / (cfg.tau * dadt), 0.0), 0.0)
    return mb


# =============================================================================
# q1q2_pjr  (zm_conv.F90:4262-4421)
# =============================================================================

def q1q2_pjr(msg: int, q, qs, qu, su, du, qhat, shat, dp, mu, md, sd, qd, ql,
             dsubcld, jt, mx, dl_evp_cu, microp_extra=None):
    """Heating/drying tendencies from the mass-flux profiles
    (q1q2_pjr, zm_conv.F90:4262-4421). dl_evp_cu = (evp, cu).
    `microp_extra`, when zmconv_microp: (frz, qide, qncde, qnide) in the
    mb-scaled 1/mb units — adds the freezing heating latice/cp*frz to dsdt
    (:4378) and the ice/number detrainment streams di/dnl/dni =
    du*(qide/qncde/qnide)(k+1) (:4392-4396).
    Returns (dqdt, dsdt, dl, (di, dnl, dni)) on gathered==all columns,
    units /s (dsdt in normalized dry static energy per s); the extras are
    zeros when microp_extra is None."""
    evp, cu = dl_evp_cu
    ncol, pver = _shape_cp(q)
    karr = _karr2(pver)

    mu_b = _below(mu)
    md_b = _below(md)
    su_b = _below(su)
    sd_b = _below(sd)
    qu_b = _below(qu)
    qd_b = _below(qd)
    shat_b = _below(shat)
    qhat_b = _below(qhat)
    ql_b = _below(ql)

    emc = -cu + evp
    in_main = (karr >= _c(jt)) & (karr <= pver - 2)
    dsdt = jnp.where(in_main,
                     -RL / CP * emc +
                     (mu_b * (su_b - shat_b) - mu * (su - shat) +
                      md_b * (sd_b - shat_b) - md * (sd - shat)) / dp, 0.0)
    dqdt = jnp.where(in_main,
                     emc + (mu_b * (qu_b - qhat_b) - mu * (qu - qhat) +
                            md_b * (qd_b - qhat_b) - md * (qd - qhat)) / dp,
                     0.0)
    dl = jnp.where(in_main, du * ql_b, 0.0)
    if microp_extra is not None:
        frz, qide, qncde, qnide = microp_extra
        dsdt = dsdt + jnp.where(in_main, c.LATICE / CP * frz, 0.0)
        di = jnp.where(in_main, du * _below(qide), 0.0)
        dnl = jnp.where(in_main, du * _below(qncde), 0.0)
        dni = jnp.where(in_main, du * _below(qnide), 0.0)
    else:
        di = dnl = dni = jnp.zeros_like(dl)

    # subcloud layer (zm_conv.F90:4396-4415): value at mx, copied downward
    dsub = jnp.where(dsubcld <= 0, 1e-30, dsubcld)
    mu_mx = _take_col(mu, mx)
    md_mx = _take_col(md, mx)
    su_mx = _take_col(su, mx)
    sd_mx = _take_col(sd, mx)
    qu_mx = _take_col(qu, mx)
    qd_mx = _take_col(qd, mx)
    shat_mx = _take_col(shat, mx)
    qhat_mx = _take_col(qhat, mx)
    dsdt_sub = (1.0 / dsub) * (-mu_mx * (su_mx - shat_mx) -
                               md_mx * (sd_mx - shat_mx))
    dqdt_sub = (1.0 / dsub) * (-mu_mx * (qu_mx - qhat_mx) -
                               md_mx * (qd_mx - qhat_mx))
    below = karr >= _c(mx)
    dsdt = jnp.where(below, _c(dsdt_sub), dsdt)
    dqdt = jnp.where(below, _c(dqdt_sub), dqdt)
    return dqdt, dsdt, dl, (di, dnl, dni)


# =============================================================================
# zm_convr — main driver  (zm_conv.F90:231-1709)
# =============================================================================

@struct.dataclass
class ZMConvOut:
    """Outputs of the ZM deep convection core (un-gathered, full columns)."""

    qtnd: jnp.ndarray     # specific humidity tendency (kg/kg/s)
    heat: jnp.ndarray     # heating rate (J/kg/s)
    prec: jnp.ndarray     # precipitation rate (m/s)
    jctop: jnp.ndarray    # top-of-convection level index (int)
    jcbot: jnp.ndarray    # base-of-convection level index (int)
    cape: jnp.ndarray
    cin: jnp.ndarray
    mcon: jnp.ndarray     # net convective mass flux, interfaces (mb/s)
    dlf: jnp.ndarray      # detrained cloud water tendency (kg/kg/s)
    pflx: jnp.ndarray     # precip flux (interfaces, kg/m2/s)
    cme: jnp.ndarray      # condensation - evaporation (kg/kg/s)
    zdu: jnp.ndarray      # detrainment du (1/mb scaled by mb -> /s)
    rprd: jnp.ndarray     # rain production (kg/kg/s)
    mu: jnp.ndarray       # updraft mass flux (mb/s)
    eu: jnp.ndarray
    du: jnp.ndarray
    md: jnp.ndarray
    ed: jnp.ndarray
    dp: jnp.ndarray       # layer thickness (mb)
    dsubcld: jnp.ndarray  # subcloud thickness (mb)
    jt: jnp.ndarray       # int top level
    maxg: jnp.ndarray     # int base (launch) level
    ideep: jnp.ndarray    # bool triggered mask (replaces gather indices)
    eurt: jnp.ndarray     # diagnosed entrainment rate (/m)
    ql: jnp.ndarray       # updraft cloud water
    rliq: jnp.ndarray     # reserved liquid (m/s)
    rice: jnp.ndarray
    # --- microp extension (zeros when cfg.microp is off) ---
    dif: jnp.ndarray      # detrained cloud-ice tendency (kg/kg/s)
    dnlf: jnp.ndarray     # detrained droplet-number tendency (1/kg/s)
    dnif: jnp.ndarray     # detrained crystal-number tendency (1/kg/s)
    sprd: jnp.ndarray     # snow production (kg/kg/s; part of rprd)
    frz: jnp.ndarray      # freezing rate (kg/kg/s; heating already in heat)
    qliq: jnp.ndarray     # in-plume liquid (conv%qliq)
    qice: jnp.ndarray
    qnl: jnp.ndarray
    qni: jnp.ndarray
    wu: jnp.ndarray       # updraft vertical velocity (m/s)
    dcape: jnp.ndarray    # (ncol,) freezing-CAPE increment
    mrates: dict          # per-process rates, mb-scaled kg/kg/s-family
                          # ({} when microp off)


def zm_convr(cfg: ZMConfig, msg: int, t, qh, pap, paph, dpp, zm_, geos, zi_,
             pblh, tpert, landfrac, delt, scan_impl=LAX_SCAN,
             aero: dict | None = None) -> ZMConvOut:
    """Main ZM driver (zm_convr, zm_conv.F90:231-1709), tht path
    (second_call / retrigger / use_cin per config). With cfg.microp the
    in-plume two-moment microphysics runs INSIDE cldprp (freezing heat in
    the plume MSE budget, condensate re-partition, dcape closure boost,
    ice/number detrainment streams — zm_conv.F90:3526-3874, 4378-4396).
    `aero` is the modal activation bundle (zm_aero_t role).

    Inputs are SI (Pa, m, K); `delt` is the reference's half-step (the
    interface passes 0.5*ztodt, zm_conv_intr.F90:666). `msg` is the number
    of excluded top levels (= F limcnv-1).
    """
    ncol, pver = _shape_cp(t)
    dtype = t.dtype
    karr = _karr2(pver)

    # geometry in mb / m incl. surface elevation (zm_conv.F90:822-843)
    zs = geos * RGRAV
    p = pap * 0.01
    pf = paph * 0.01
    z = zm_ + _c(zs)
    zf = zi_ + _c(zs)
    dp = 0.01 * dpp

    # PBL top level index (zm_conv.F90:845-849): smallest k whose midpoint is
    # within half a layer of the PBL height
    near = jnp.abs(z - _c(zs) - _c(pblh)) < \
        (_lsl(zf, slice(None, -1)) - _lsl(zf, slice(1, None))) * 0.5
    near = near & (karr >= msg) & (karr <= pver - 2)
    pblt, _ = _first_true_from_top(near, jnp.full((ncol,), pver - 1, jnp.int32))
    pblt = pblt.astype(dtype)

    q = qh
    # scaled dry static energy s = T + g z /((1+zvir q) cp)  (tht, :855-858)
    s = t + (GRAV / ((1.0 + c.ZVIR * q) * CP)) * z

    dmpdz0 = _bfull(jnp.full((ncol,), -cfg.tentrm, dtype), pver)

    b1 = buoyan_dilute(cfg, msg, q, t, p, z, pf, zi_, zs, pblt, tpert,
                       landfrac, dmpdz0, scan_impl=scan_impl)

    def trigger(cape, cin):
        trig = cape > cfg.capelmt
        if cfg.use_cin:
            trig = trig & (cin < cape * cfg.cin_threshd)
        return trig

    ideep1 = trigger(b1.cape, b1.cin)

    # interface log-mean shat/qhat (zm_conv.F90:1007-1027)
    shat = _log_mean_interface(s)
    qhat = _log_mean_interface(q)

    # under second_call only eu of this first plume call survives
    # (zm_conv.F90:1046-1078) — take the slim path that skips the
    # ascent/rain/downdraft sections
    c1 = cldprp(cfg, msg, q, t, p, z, s, zf, shat, qhat, b1.mx, b1.lel,
                landfrac, scan_impl=scan_impl, eu_only=cfg.second_call,
                aero=aero)

    ideep = ideep1
    eurt = jnp.zeros((ncol, pver), dtype)

    if cfg.second_call:
        # diagnose entrainment from eu (zm_conv.F90:1046-1078): mean of eu>0
        has_eu = (c1 > 0.0) & _col(ideep1)
        cnt = _lsum(has_eu)
        dmsm = -_lsum(jnp.where(has_eu, c1, 0.0)) / \
            jnp.where(cnt == 0, 1, cnt)
        dmpdz2_col = jnp.where(ideep1, jnp.where(cnt > 0, dmsm, -1.0),
                               -cfg.tentrm)
        dmpdz2 = _bfull(dmpdz2_col, pver)

        b2 = buoyan_dilute(cfg, msg, q, t, p, z, pf, zi_, zs, pblt, tpert,
                           landfrac, dmpdz2, scan_impl=scan_impl)
        if cfg.retrigger:
            ideep = trigger(b2.cape, b2.cin)
        cld = cldprp(cfg, msg, q, t, p, z, s, zf, shat, qhat, b2.mx, b2.lel,
                     landfrac, scan_impl=scan_impl, aero=aero)
        buoy_used = b2
        eurt = -dmpdz2
    else:
        buoy_used = b1
        cld = c1

    mask = ideep
    maskf = _c(mask.astype(dtype))

    mx = buoy_used.mx
    jt = cld.jt
    dz = _lsl(zf, slice(None, -1)) - _lsl(zf, slice(1, None))

    # subcloud thickness (zm_conv.F90:990-997)
    dsubcld = _lsum(jnp.where((karr >= _c(mx)) & (karr >= msg), dp, 0.0))

    # convert 1/m -> 1/mb (zm_conv.F90:1252-1262)
    fac_mb = dz / dp
    du = cld.du * fac_mb
    eu = cld.eu * fac_mb
    ed = cld.ed * fac_mb
    cu = cld.cu * fac_mb
    cmeg = cld.cmeg * fac_mb
    rprdg = cld.rprd * fac_mb
    evpg = cld.evp * fac_mb
    sprdg = cld.sprd * fac_mb          # (zm_conv.F90:1264-1271)
    frzg = cld.frz * fac_mb

    # freezing-CAPE increment boosts the closure (capeg += dcape,
    # zm_conv.F90:1242-1246)
    # dcape applies to the gathered (triggered) columns only — the
    # reference's capeg is a gathered array (zm_conv.F90:1242-1246)
    cape_eff = buoy_used.cape + (
        cld.dcape * mask.astype(dtype) if cfg.microp else 0.0)
    mb = closure(cfg, msg, q, t, p, z, s, buoy_used.tp, cld.qst, cld.qu,
                 cld.su, cld.mc, du, cld.mu, cld.md, cld.qd, cld.sd, qhat,
                 shat, dp, buoy_used.qstp, zf, cld.ql, dsubcld,
                 cape_eff, buoy_used.tl, buoy_used.lcl, buoy_used.lel,
                 jt, mx)

    # CFL cap (zm_conv.F90:1285-1300)
    mumax = _lmax(jnp.where(karr >= msg + 1, cld.mu / dp, 0.0))
    mb = jnp.where(mumax > 0.0,
                   jnp.minimum(mb, 0.5 / (delt * jnp.where(mumax <= 0, 1e30,
                                                           mumax))), 0.0)
    if cfg.no_deep_pbl:
        zm_jt = _take_col(zm_, jt)
        mb = jnp.where(zm_jt < pblh, 0.0, mb)
    mb = jnp.where(mask, mb, 0.0)

    # scale by mb (zm_conv.F90:1319-1331)
    mbk = _c(mb)
    mu = cld.mu * mbk
    md = cld.md * mbk
    mc = cld.mc * mbk
    du = du * mbk
    eu = eu * mbk
    ed = ed * mbk
    cmeg = cmeg * mbk
    rprdg = rprdg * mbk
    cu = cu * mbk
    evpg = evpg * mbk
    sprdg = sprdg * mbk                # (zm_conv.F90:1310-1316)
    frzg = frzg * mbk
    pflxg = _lcat(
        [_c(jnp.zeros((ncol,), dtype)),
         _lsl(cld.pflx, slice(1, None)) * mbk * 100.0 / GRAV])

    microp_extra = None
    if cfg.microp:
        microp_extra = (frzg, cld.qide, cld.qncde, cld.qnide)
    dqdt, dsdt, dlg, (dig, dnlg, dnig) = q1q2_pjr(
        msg, q, cld.qst, cld.qu, cld.su, du, qhat,
        shat, dp, mu, md, cld.sd, cld.qd, cld.qcde,
        dsubcld, jt, mx, (evpg, cu), microp_extra=microp_extra)

    dqdt = dqdt * maskf
    dsdt = dsdt * maskf
    dlg = dlg * maskf
    dig = dig * maskf
    dnlg = dnlg * maskf
    dnig = dnig * maskf
    sprdg = sprdg * maskf
    frzg = frzg * maskf
    mu = mu * maskf
    md = md * maskf
    mc = mc * maskf
    du = du * maskf
    eu = eu * maskf
    ed = ed * maskf
    cmeg = cmeg * maskf
    rprdg = rprdg * maskf
    evpg = evpg * maskf
    pflxg = pflxg * _c(mask.astype(dtype))
    qlg = cld.ql * maskf

    if cfg.microp:
        # vapor-negativity fixer (zm_conv.F90:1400-1470, vectorized
        # simplification): where the projected q would go negative, cap
        # dqdt with latent-heat compensation and take the condensate out
        # of the SAME level's precip production, snow last (the reference
        # walks the column up to jt redistributing the deficit across
        # levels; the local form leaves any residual to the caller's
        # qneg3 — a documented deviation)
        q_proj = qh + 2.0 * delt * dqdt
        deficit = jnp.where(q_proj < 0.0,
                            (dqdt + 0.5 * qh / delt) / 0.9999, 0.0)  # <= 0
        dqdt = dqdt - deficit
        dsdt = dsdt + deficit * RL / CP
        # rprdg can be legitimately NEGATIVE (downdraft evaporation
        # exceeding production); red must never "remove" from such levels
        red = jnp.maximum(jnp.minimum(-deficit, rprdg), 0.0)
        rain_avail = jnp.maximum(rprdg - sprdg, 0.0)
        from_snow = jnp.maximum(red - rain_avail, 0.0)
        rprdg = rprdg - red
        sprdg = sprdg - from_snow
        dsdt = dsdt - from_snow * c.LATICE / CP

    # precipitation from column moisture change (zm_conv.F90:1495-1640);
    # with microp the detrained ice stream counts too (:1516-1519)
    q_new = qh + 2.0 * delt * dqdt
    prec = _lsum(-dpp * (q_new - qh) - dpp * (dlg + dig) * 2.0 * delt)
    prec = RGRAV * jnp.maximum(prec, 0.0) / (2.0 * delt) / 1000.0

    # reserved liquid/ice (zm_conv.F90:1645-1652)
    rliq = _lsum((dlg + dig) * dpp / GRAV) / 1000.0
    rice = _lsum(dig * dpp / GRAV) / 1000.0

    mcon = _lcat([mc * maskf, _c(jnp.zeros((ncol,), dtype))])

    jctop = jnp.where(mask, jt, pver - 1)
    jcbot = jnp.where(mask, mx, 0)

    return ZMConvOut(
        qtnd=dqdt, heat=dsdt * CP, prec=prec, jctop=jctop, jcbot=jcbot,
        cape=cape_eff, cin=buoy_used.cin, mcon=mcon, dlf=dlg,
        pflx=pflxg, cme=cmeg, zdu=du, rprd=rprdg, mu=mu, eu=eu, du=du, md=md,
        ed=ed, dp=dp, dsubcld=dsubcld, jt=jt, maxg=mx, ideep=mask, eurt=eurt,
        ql=qlg, rliq=rliq, rice=rice,
        dif=dig, dnlf=dnlg, dnif=dnig, sprd=sprdg, frz=frzg,
        qliq=cld.qliq * maskf, qice=cld.qice * maskf,
        qnl=cld.qnl * maskf, qni=cld.qni * maskf, wu=cld.wu * maskf,
        dcape=cld.dcape * mask.astype(dtype),
        mrates={k: v * fac_mb * mbk * maskf
                for k, v in cld.mrates.items()})


# =============================================================================
# zm_conv_evap  (zm_conv.F90:1712-1972)
# =============================================================================

def zm_conv_evap(cfg: ZMConfig, t, pmid, pdel, q, landfrac, prdprec, cldfrc,
                 deltat, prec_in, prdsnow=None):
    """Sundqvist evaporation of convective precip + snow production/melt
    (zm_conv_evap, zm_conv.F90:1712-1972), tht humidity fix.

    Two snow formulations, keyed on `prdsnow` exactly like the reference
    (:1789-1794): `prdsnow=None` is the old_snow path (snow diagnosed from
    the temperature partition, production heating +latice applied HERE);
    with `prdsnow` (the microp sprd profile) snow production comes from the
    in-plume scheme — its latent-ice heating already entered via the plume
    frz budget, so only the melt/evaporation cooling applies here
    (:1919-1941, 1957-1961), and snowmelt is T-limited partial melt
    (:1828-1847).

    prec_in in m/s; returns dict with heating/moistening tendencies, surface
    prec/snow (m/s), interface fluxes (kg/m2/s), and net production terms.
    """
    ncol, pver = t.shape
    dtype = t.dtype
    old_snow = prdsnow is None
    omsm = 0.9999

    prec = prec_in * 1000.0   # kg/m2/s
    _, qs = qsat_blend(t, pmid)
    fice, fsnow_conv = cldfrc_fice(t)
    kemask = cfg.ke * jnp.ones_like(landfrac) if not cfg.org else \
        cfg.ke * (1.0 - landfrac) + cfg.ke_lnd * landfrac
    if old_snow:
        prdsnow = jnp.zeros_like(prdprec)

    def step(cy, x):
        (t_k, q_k, qs_k, pdel_k, prdprec_k, cldfrc_k, fsnow_k,
         prdsnow_k) = x
        flxprec_k, flxsnow_k, evpvint = cy

        melt = t_k > TFREEZ
        if old_snow:
            flxsntm = jnp.where(melt, 0.0, flxsnow_k)
            snowmlt = jnp.where(melt, flxsnow_k * GRAV / pdel_k, 0.0)
        else:
            # partial melt, limited so the cooling cannot push T below
            # tmelt (zm_conv.F90:1828-1847)
            pot = flxsnow_k * GRAV / pdel_k
            full_cool = -c.LATICE / CP * pot * deltat
            frac = jnp.where(
                t_k + full_cool <= TFREEZ,
                jnp.clip((t_k - TFREEZ) * CP / c.LATICE / deltat /
                         jnp.maximum(pot, 1e-30), 0.0, 1.0),
                1.0) * omsm
            frac = jnp.where(melt, frac, 0.0)
            flxsntm = flxsnow_k * (1.0 - frac)
            snowmlt = frac * pot

        # tht humidity-basis fix (zm_conv.F90:1853-1860)
        evplimit = jnp.maximum(1.0 - q_k / (1.0 + q_k) / qs_k, 0.0)
        evpprec = kemask * (1.0 - cldfrc_k) * evplimit * jnp.sqrt(flxprec_k)
        evplimit2 = flxprec_k * GRAV / pdel_k
        evplimit2 = jnp.minimum(evplimit2,
                                (prec - evpvint) * GRAV / pdel_k)
        evpprec = jnp.minimum(evplimit2, evpprec)
        if not old_snow:
            evpprec = jnp.maximum(evpprec, 0.0) * omsm   # (:1904-1907)

        work1 = jnp.where(flxprec_k > 0.0,
                          jnp.clip(flxsntm / jnp.where(flxprec_k == 0, 1e-30,
                                                       flxprec_k), 0.0, 1.0),
                          0.0)
        evpsnow = evpprec * work1
        evpvint = evpvint + evpprec * pdel_k / GRAV

        ntprprd = prdprec_k - evpprec
        if old_snow:
            work1b = jnp.where(
                flxprec_k > 0.0,
                jnp.clip(flxsnow_k / jnp.where(flxprec_k == 0, 1e-30,
                                               flxprec_k), 0.0, 1.0),
                0.0)
            work2 = jnp.maximum(fsnow_k, work1b)
            work2 = jnp.where(snowmlt > 0.0, 0.0, work2)
            ntsnprd = prdprec_k * work2 - evpsnow - snowmlt
            tend_s_snwprd = prdprec_k * work2 * c.LATICE
            tend_s_snwevmlt = -(evpsnow + snowmlt) * c.LATICE
            tend_s = -evpprec * c.LATVAP + ntsnprd * c.LATICE
        else:
            # snow production from the in-plume scheme; its +latice
            # heating already entered through frz (zm_conv.F90:1936-1941)
            snk = jnp.minimum(flxsnow_k * GRAV / pdel_k,
                              evpsnow + snowmlt)
            ntsnprd = prdsnow_k - snk
            tend_s_snwprd = prdsnow_k * c.LATICE
            tend_s_snwevmlt = -snk * c.LATICE
            tend_s = -evpprec * c.LATVAP + tend_s_snwevmlt

        flxprec_n = jnp.maximum(flxprec_k + ntprprd * pdel_k / GRAV, 0.0)
        flxsnow_n = jnp.maximum(flxsnow_k + ntsnprd * pdel_k / GRAV, 0.0)

        tend_q = evpprec
        outs = (tend_s, tend_q, tend_s_snwprd, tend_s_snwevmlt, ntprprd,
                ntsnprd, flxprec_k, flxsnow_k, flxprec_n, flxsnow_n)
        return (flxprec_n, flxsnow_n, evpvint), outs

    z1 = jnp.zeros((ncol,), dtype)
    xs = (t.T, q.T, qs.T, pdel.T, prdprec.T, cldfrc.T, fsnow_conv.T,
          prdsnow.T)
    (_, _, _), outs = jax.lax.scan(step, (z1, z1, z1), xs)
    (tend_s, tend_q, tend_s_snwprd, tend_s_snwevmlt, ntprprd, ntsnprd,
     flxprec_top, flxsnow_top, flxprec_bot, flxsnow_bot) = \
        [o.T for o in outs]

    flxprec = jnp.concatenate([flxprec_top, flxprec_bot[:, -1:]], axis=1)
    flxsnow = jnp.concatenate([flxsnow_top, flxsnow_bot[:, -1:]], axis=1)

    return dict(
        tend_s=tend_s, tend_q=tend_q, tend_s_snwprd=tend_s_snwprd,
        tend_s_snwevmlt=tend_s_snwevmlt, ntprprd=ntprprd, ntsnprd=ntsnprd,
        flxprec=flxprec, flxsnow=flxsnow,
        prec=flxprec[:, -1] / 1000.0, snow=flxsnow[:, -1] / 1000.0)
