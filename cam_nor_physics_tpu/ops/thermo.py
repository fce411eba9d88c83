"""Moist thermodynamics: entropy, enthalpy, and their vectorized inversions.

TPU-native equivalents of the ZM plume thermodynamic core:
  - `entropy` (Raymond & Blyth 1992)   — /root/reference/physics/zm_conv.F90:5280-5300
  - `enthalpy` (tht moist enthalpy)    — /root/reference/physics/zm_conv.F90:5440-5457
  - `ientropy`/`ienthalpy` Brent-method inversions — zm_conv.F90:5304-5414

The reference inverts per scalar column/level with Brent's method and hard-aborts
after 100 iterations. Here the inversion runs vectorized over every (column,
level) pair at once as a fixed-upper-bound `lax.while_loop` whose carried state
is whole arrays; converged lanes freeze via masks. Non-convergence never aborts
the step — it returns NaN on those lanes so the caller's blow-up sentinels can
surface it (SURVEY §5.3 policy).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import constants as c
from .saturation import qsat_hpa

# ZM-internal constant aliases (zm_convi, zm_conv.F90:155-168)
CPRES = c.CPAIR
RL = c.LATVAP
TFREEZ = c.TMELT
EPS1 = c.EPSILO
RGAS = c.RAIR


# WACCM-X major-species thermodynamic properties (upstream air_composition/
# cam_thermo contract consumed by the reference's high-altitude branch,
# /root/reference/fv/dyn_comp.F90:2371-2489): molecular weight (kg/kmole)
# and the kinetic-theory cp factor (cp = factor * R_universal / MW;
# monatomic 5/2, diatomic 7/2). Pure N2 gives kappa = 2/7 = 0.2857, within
# 0.1% of the dry-air CAPPA — the constant-composition limit.
MAJOR_SPECIES = {
    "O": (15.9994, 2.5),
    "O2": (31.9988, 3.5),
    "H": (1.0074, 2.5),
    "N2": (28.0134, 3.5),
}


def calc_kappav(q, species):
    """Composition-dependent kappa = R/cp from major-species mass mixing
    ratios (the cam_thermo_calc_kappav role at
    /root/reference/fv/dyn_comp.F90:2474; upstream cam_thermo).

    q: (nq, ...) tracer stack; `species`: tuple of (name, index) pairs
    locating the advected major species ('O', 'O2', 'H') in q. Molecular
    nitrogen is the remainder 1 - sum(q_i), so with no species listed the
    result is the constant N2 kappa (the well-mixed lower atmosphere
    limit). Returns kappa with the shape of one tracer."""
    rair = 0.0
    cpair = 0.0
    # tracer-shaped zero so the no-species result still has field shape
    # (the dycore advects the returned κ as a tracer slot)
    qsum = jnp.zeros_like(q[0])
    for name, ix in species:
        mw, cpfac = MAJOR_SPECIES[name]
        qi = jnp.clip(q[ix], 0.0, 1.0)
        qsum = qsum + qi
        rair = rair + qi * (c.RGAS / mw)
        cpair = cpair + qi * cpfac * (c.RGAS / mw)
    mw_n2, cp_n2 = MAJOR_SPECIES["N2"]
    qn2 = jnp.clip(1.0 - qsum, 0.0, 1.0)
    rair = rair + qn2 * (c.RGAS / mw_n2)
    cpair = cpair + qn2 * cp_n2 * (c.RGAS / mw_n2)
    return rair / cpair


def entropy(tk, p_hpa, qtot):
    """Moist entropy (J/kg/K), Raymond & Blyth 1992. p in hPa.

    s = (cp + qt*cl) ln(T/Tf) - Rd ln((p-e)/pref) + L qv/T - qv Rv ln(qv/qst)
    with qv = min(qt, qst) and L = Lv - (cl - cpv)(T - Tf).
    """
    pref = 1000.0
    L = RL - (c.CPLIQ - c.CPWV) * (tk - TFREEZ)
    _, qst = qsat_hpa(tk, p_hpa)
    qv = jnp.minimum(qtot, qst)
    e = qv * p_hpa / (EPS1 + qv)
    return ((CPRES + qtot * c.CPLIQ) * jnp.log(tk / TFREEZ)
            - RGAS * jnp.log((p_hpa - e) / pref)
            + L * qv / tk
            - qv * c.RH2O * jnp.log(qv / qst))


def enthalpy(tk, p_hpa, qtot, z):
    """Moist static enthalpy (J/kg), tht variant. p in hPa, z in m.

    h = (cp + qt*cl) T + L qv + (1+qt) g z, qv = min(qt, qst).
    """
    L = RL - (c.CPLIQ - c.CPWV) * (tk - TFREEZ)
    _, qst = qsat_hpa(tk, p_hpa)
    qv = jnp.minimum(qtot, qst)
    return (CPRES + qtot * c.CPLIQ) * tk + L * qv + (1.0 + qtot) * c.GRAVIT * z


def _brent_invert(f, target, t_guess, max_iter=100, tol=0.001):
    """Vectorized Brent root find of f(T) = target, bracketed at t_guess +- 10 K.

    Elementwise translation of the scalar Brent loop in zm_conv.F90:5335-5391:
    every branch becomes a jnp.where so all lanes advance together; the loop
    exits early once every lane converges. Returns (T, converged_mask).
    """
    eps_ = 3.0e-8

    # The reference brackets at t_guess +- 10 K (zm_conv.F90:5330-5331) and
    # hard-aborts when that fails. A 10 K bracket is too narrow when a single
    # model layer spans a large parcel dT (thick upper layers), so expand the
    # half-width by doubling (10 -> 160 K) on lanes whose endpoints have the
    # same sign; lanes already bracketed are untouched, preserving reference
    # behavior exactly where the reference works.
    half = jnp.full_like(t_guess, 10.0)
    for _ in range(4):
        same = (f(t_guess - half) - target) * (f(t_guess + half) - target) > 0.0
        half = jnp.where(same, half * 2.0, half)
    a0 = t_guess - half
    b0 = t_guess + half
    fa0 = f(a0) - target
    fb0 = f(b0) - target
    # Root must lie inside the bracket; same-signed endpoints mean the
    # inversion cannot succeed and is flagged as failed (NaN), never aborted.
    bracketed = fa0 * fb0 <= 0.0

    state = dict(a=a0, b=b0, cc=b0, fa=fa0, fb=fb0, fc=fb0,
                 d=b0 - a0, e=b0 - a0,
                 done=jnp.zeros_like(t_guess, dtype=bool),
                 it=jnp.array(0, dtype=jnp.int32))

    def cond(s):
        return jnp.logical_and(s["it"] <= max_iter, ~jnp.all(s["done"]))

    def body(s):
        a, b, cc = s["a"], s["b"], s["cc"]
        fa, fb, fc = s["fa"], s["fb"], s["fc"]
        d, e = s["d"], s["e"]

        # re-bracket if fb, fc on the same side
        same = (fb > 0) & (fc > 0) | (fb < 0) & (fc < 0)
        cc = jnp.where(same, a, cc)
        fc = jnp.where(same, fa, fc)
        d = jnp.where(same, b - a, d)
        e = jnp.where(same, b - a, e)

        # swap so that b is the best guess
        swap = jnp.abs(fc) < jnp.abs(fb)
        a2 = jnp.where(swap, b, a)
        b2 = jnp.where(swap, cc, b)
        cc2 = jnp.where(swap, a2, cc)
        fa2 = jnp.where(swap, fb, fa)
        fb2 = jnp.where(swap, fc, fb)
        fc2 = jnp.where(swap, fa2, fc)

        tol1 = 2.0 * eps_ * jnp.abs(b2) + 0.5 * tol
        xm = 0.5 * (cc2 - b2)
        newly_done = (jnp.abs(xm) <= tol1) | (fb2 == 0.0)
        done = s["done"] | newly_done

        # interpolation step
        use_interp = (jnp.abs(e) >= tol1) & (jnp.abs(fa2) > jnp.abs(fb2))
        sbr = fb2 / jnp.where(fa2 == 0, 1e-30, fa2)
        a_eq_c = a2 == cc2
        # secant (a == c) vs inverse quadratic
        p_sec = 2.0 * xm * sbr
        q_sec = 1.0 - sbr
        qbr = fa2 / jnp.where(fc2 == 0, 1e-30, fc2)
        rbr = fb2 / jnp.where(fc2 == 0, 1e-30, fc2)
        p_iq = sbr * (2.0 * xm * qbr * (qbr - rbr) - (b2 - a2) * (rbr - 1.0))
        q_iq = (qbr - 1.0) * (rbr - 1.0) * (sbr - 1.0)
        pbr = jnp.where(a_eq_c, p_sec, p_iq)
        qbr2 = jnp.where(a_eq_c, q_sec, q_iq)
        qbr2 = jnp.where(pbr > 0, -qbr2, qbr2)
        pbr = jnp.abs(pbr)
        ok = 2.0 * pbr < jnp.minimum(3.0 * xm * qbr2 - jnp.abs(tol1 * qbr2),
                                     jnp.abs(e * qbr2))
        d_new = jnp.where(use_interp & ok,
                          pbr / jnp.where(qbr2 == 0, 1e-30, qbr2), xm)
        e_new = jnp.where(use_interp & ok, d, d_new)

        a3 = b2
        fa3 = fb2
        step = jnp.where(jnp.abs(d_new) > tol1, d_new,
                         jnp.where(xm >= 0, tol1, -tol1))
        b3 = b2 + step
        fb3 = f(b3) - target

        # freeze converged lanes
        frz = lambda new, old: jnp.where(done, old, new)
        return dict(a=frz(a3, a2), b=frz(b3, b2), cc=frz(cc2, cc2),
                    fa=frz(fa3, fa2), fb=frz(fb3, fb2), fc=frz(fc2, fc2),
                    d=frz(d_new, d), e=frz(e_new, e),
                    done=done, it=s["it"] + 1)

    out = jax.lax.while_loop(cond, body, state)
    ok = out["done"] & bracketed
    t = jnp.where(ok, out["b"], jnp.nan)
    return t, ok


def _newton_invert(f, target, t_guess, iters=7, dt_fd=0.5, clamp=10.0,
                   tol=0.001):
    """Fixed-count damped secant-Newton inversion of f(T) = target.

    TPU-first alternative to the Brent loop: the iteration count is STATIC
    (fully unrolled, no while_loop), so XLA fuses the whole inversion into a
    handful of kernels; each step uses a forward-difference slope and clamps
    the update to ±clamp K (robust across the saturation kink of moist
    entropy/enthalpy, which is C0 but monotone in T). 8 iterations reach the
    reference's 0.001 K tolerance from a same-level initial guess; the
    convergence flag mirrors the Brent contract (NaN-free, mask out).
    """
    # secant iteration: one f-eval per step (moist entropy/enthalpy are
    # strictly increasing in T, so the bracket direction is the sign of f)
    tp = t_guess
    fp = f(tp) - target
    tc = tp + jnp.where(fp > 0, -dt_fd, dt_fd)
    for _ in range(iters):
        fc = f(tc) - target
        denom = fc - fp
        denom = jnp.where(jnp.abs(denom) < 1e-12,
                          jnp.where(denom >= 0, 1e-12, -1e-12), denom)
        step = fc * (tc - tp) / denom
        tn = tc - jnp.clip(step, -clamp, clamp)
        tp, fp, tc = tc, fc, tn
    fc = f(tc) - target
    conv = jnp.abs(fc) <= jnp.abs(f(tc + tol) - (fc + target)) + \
        1e-6 * jnp.abs(target)
    return tc, conv


def _enthalpy_and_deriv(tk, p_hpa, qtot, z):
    """(h, dh/dT) with the exact saturated-branch derivative.

    h = (cp + qt·cl) T + L(T) qv(T) + (1+qt) g z with qv = min(qt, qst(T)),
    L = Lv − (cl − cpv)(T − Tf). dh/dT = (cp + qt·cl) + L'·qv + L·qv',
    qv' = dqst/dT on the saturated branch (Clausius-Clapeyron), else 0.
    h is strictly increasing in T, so Newton from an environment-T guess
    converges quadratically (~3 iterations to 1e-3 K vs ~8 secant evals)."""
    from .saturation import dqsdt_water
    L = RL - (c.CPLIQ - c.CPWV) * (tk - TFREEZ)
    _, qst = qsat_hpa(tk, p_hpa)
    sat = qtot >= qst
    qv = jnp.where(sat, qst, qtot)
    h = (CPRES + qtot * c.CPLIQ) * tk + L * qv + (1.0 + qtot) * c.GRAVIT * z
    dqvdt = jnp.where(sat, dqsdt_water(tk, p_hpa * 100.0), 0.0)
    dh = (CPRES + qtot * c.CPLIQ) - (c.CPLIQ - c.CPWV) * qv + L * dqvdt
    return h, dh


def _entropy_and_deriv(tk, p_hpa, qtot):
    """(s, ds/dT) with the exact saturated-branch derivative.

    On the unsaturated branch qv = qt and e are T-independent:
      ds/dT = (cp + qt·cl)/T + L' qv/T − L qv/T².
    Saturated (qv = qst(T), e = e(qst)): the extra terms from qst(T) in
    L qv/T and −qv Rv ln(qv/qst) cancel at qv = qst except through the
    vapor-pressure term, giving
      ds/dT = (cp + qt·cl)/T + L' qst/T − L qst/T² + qst'·(L/T − Rv ln(qv/qst))
              + Rd/(p−e) · de/dT,  de/dT = e' from qst'.
    (At qv == qst the log term is 0.)"""
    from .saturation import dqsdt_water
    L = RL - (c.CPLIQ - c.CPWV) * (tk - TFREEZ)
    Lp = -(c.CPLIQ - c.CPWV)
    _, qst = qsat_hpa(tk, p_hpa)
    sat = qtot >= qst
    qv = jnp.where(sat, qst, qtot)
    e = qv * p_hpa / (EPS1 + qv)
    pref = 1000.0
    s = ((CPRES + qtot * c.CPLIQ) * jnp.log(tk / TFREEZ)
         - RGAS * jnp.log((p_hpa - e) / pref)
         + L * qv / tk
         - qv * c.RH2O * jnp.log(qv / qst))
    qstp = dqsdt_water(tk, p_hpa * 100.0)
    dqvdt = jnp.where(sat, qstp, 0.0)
    dedqv = p_hpa * EPS1 / (EPS1 + qv) ** 2
    # d/dT of -qv Rv ln(qv/qst): on the saturated branch qv=qst -> ln=1·0,
    # derivative -Rv qst' ln(1) - qv Rv (qv'/qv - qst'/qst) = 0; unsaturated:
    # qv const -> +qv Rv qst'/qst.
    dlog = jnp.where(sat, 0.0, qv * c.RH2O * qstp / qst)
    ds = ((CPRES + qtot * c.CPLIQ) / tk
          + RGAS * dedqv * dqvdt / (p_hpa - e)
          + (Lp * qv + L * dqvdt) / tk - L * qv / (tk * tk)
          + dlog)
    return s, ds


def _newton_exact_invert(fdf, target, t_guess, iters=4, clamp=10.0,
                         tol=0.001):
    """Newton with the analytic derivative (quadratic convergence; iteration
    count static and unrolled like `_newton_invert`). The derivative of both
    moist potentials is bounded below by cp/T-scale positives, so the step
    is well-defined; ±clamp K damping guards the saturation kink."""
    tc = t_guess
    for _ in range(iters):
        fc, dfc = fdf(tc)
        step = (fc - target) / jnp.maximum(dfc, 1e-6)
        tc = tc - jnp.clip(step, -clamp, clamp)
    fc, dfc = fdf(tc)
    conv = jnp.abs(fc - target) <= dfc * tol + 1e-6 * jnp.abs(target)
    return tc, conv


def ientropy(s_target, p_hpa, qt, t_guess, max_iter=100, solver="brent"):
    """Invert entropy(T, p, qt) = s for T; returns (T, qst, converged).

    Equivalent of zm_conv.F90:5304-5414 but batched over arrays.
    solver="newton" selects the fixed-count unrolled inversion (faster on
    TPU, agrees to the 0.001 K tolerance); "brent" is the reference method.
    """
    fn = partial(entropy, p_hpa=p_hpa, qtot=qt)
    if solver == "newton":
        t, conv = _newton_invert(fn, s_target, t_guess)
    elif solver == "newton_exact":
        t, conv = _newton_exact_invert(
            partial(_entropy_and_deriv, p_hpa=p_hpa, qtot=qt),
            s_target, t_guess)
    else:
        t, conv = _brent_invert(fn, s_target, t_guess, max_iter=max_iter)
    _, qst = qsat_hpa(jnp.where(conv, t, t_guess), p_hpa)
    return t, qst, conv


def ienthalpy(h_target, p_hpa, qt, z, t_guess, max_iter=100, solver="brent"):
    """Invert enthalpy(T, p, qt, z) = h for T; returns (T, qst, converged).

    Equivalent of zm_conv.F90 ienthalpy (identical to ientropy with the
    function swapped). See `ientropy` for the solver switch.
    """
    fn = partial(enthalpy, p_hpa=p_hpa, qtot=qt, z=z)
    if solver == "newton":
        t, conv = _newton_invert(fn, h_target, t_guess)
    elif solver == "newton_exact":
        t, conv = _newton_exact_invert(
            partial(_enthalpy_and_deriv, p_hpa=p_hpa, qtot=qt, z=z),
            h_target, t_guess)
    else:
        t, conv = _brent_invert(fn, h_target, t_guess, max_iter=max_iter)
    _, qst = qsat_hpa(jnp.where(conv, t, t_guess), p_hpa)
    return t, qst, conv
