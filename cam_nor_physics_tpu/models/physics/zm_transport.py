"""Convective tracer and momentum transport (convtran / momtran).

TPU-native re-implementation of /root/reference/physics/zm_conv.F90:1976-2715.
The reference runs per-gathered-column scalar loops; here updraft/downdraft
in-cloud profiles are `lax.scan`s over the level axis for the whole column
batch, and the gather is replaced by masking with `ideep` (columns where deep
convection is inactive have zero mass fluxes, so their tendencies vanish
naturally). Tracer axis handled by vmap — all tracers share the mass-flux
profiles (SURVEY §2.3 P6: the tracer dimension is the vectorizable one).

All mass fluxes/dp are in mb (as produced by zm_convr); `dt` is the full model
step ztodt (zm_conv_intr.F90:875-886).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import constants as c

MBSTH = 1.0e-15   # mass-flux threshold (mb/s), zm_conv.F90:2077
SMALL = 1.0e-36


def _safe_div(a, b, eps=1.0e-300):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b >= 0, eps, -eps), b)


def _interface_chat(const, geometric: bool):
    """Environment interface values chat(k) from (const(k-1), const(k)).

    convtran uses a geometric (log) mean when layers differ significantly
    (zm_conv.F90:2120-2143); momtran uses the arithmetic mean (:2424).
    chat(0) = const(0) (km1=max(1,k-1) collapses at the top).
    """
    c0 = jnp.concatenate([const[:, :1], const[:, :-1]], axis=1)  # const(k-1)
    if not geometric:
        return 0.5 * (const + c0)
    minc = jnp.minimum(c0, const)
    maxc = jnp.maximum(c0, const)
    cdifr = jnp.where(minc < 0, 0.0,
                      _safe_div(jnp.abs(const - c0), jnp.maximum(maxc, SMALL)))
    cabv = jnp.maximum(c0, maxc * 1.0e-12)
    cbel = jnp.maximum(const, maxc * 1.0e-12)
    use_log = cdifr > 1.0e-6
    safe = jnp.where(use_log & (cabv != cbel), cabv - cbel, 1.0)
    logmean = jnp.log(jnp.where(use_log, _safe_div(cabv, cbel), 1.0)) / safe * \
        cabv * cbel
    return jnp.where(use_log, logmean, 0.5 * (const + c0))


def _updraft_profile(const_src, chat, mu, du, eu, dp, extra=None):
    """conu scan, bottom-up (zm_conv.F90:2151-2186 / 2520-2560).

    conu(k) = (mu(k+1) conu(k+1) + eu(k) const_src(k) dp(k) [+ extra(k) dp(k)])
              / (mu(k) + du(k) dp(k))     when the denominator > MBSTH,
    else chat(k). `extra` carries momtran's pressure-gradient term.
    """
    ncol, pver = chat.shape
    if extra is None:
        extra = jnp.zeros_like(chat)

    def step(cy, x):
        conu_b, mu_b = cy
        chat_k, src_k, mu_k, du_k, eu_k, dp_k, ex_k = x
        mupdudp = mu_k + du_k * dp_k
        val = _safe_div(mu_b * conu_b + eu_k * src_k * dp_k + ex_k * dp_k,
                        mupdudp)
        conu_k = jnp.where(mupdudp > MBSTH, val, chat_k)
        return (conu_k, mu_k), conu_k

    xs = tuple(a[:, ::-1].T for a in (chat, const_src, mu, du, eu, dp, extra))
    z = jnp.zeros((ncol,), chat.dtype)
    _, conu_r = jax.lax.scan(step, (z, z), xs)
    return conu_r.T[:, ::-1]


def _downdraft_profile(const_src, chat, md, ed, dp, extra=None):
    """cond scan, top-down (zm_conv.F90:2189-2199 / 2563-2574).

    cond(k) = (md(k-1) cond(k-1) - ed(k-1) const_src(k-1) dp(k-1)
               [- extra(k-1) dp(k-1)]) / md(k)   when md(k) < -MBSTH,
    else chat(k).
    """
    ncol, pver = chat.shape
    if extra is None:
        extra = jnp.zeros_like(chat)

    def step(cy, x):
        cond_p, md_p, src_p, dp_p, ex_p = cy
        chat_k, src_k, md_k, dp_k, ex_k = x
        val = _safe_div(md_p * cond_p - ed_p_dp(src_p, dp_p, ex_p), md_k)
        cond_k = jnp.where(md_k < -MBSTH, val, chat_k)
        return (cond_k, md_k, src_k, dp_k, ex_k), cond_k

    # ed(k-1)*src(k-1)*dp(k-1) + extra(k-1)*dp(k-1): fold ed into src upstream
    def ed_p_dp(src_p, dp_p, ex_p):
        return src_p * dp_p + ex_p * dp_p

    xs = tuple(a.T for a in (chat, const_src, md, dp, extra))
    z = jnp.zeros((ncol,), chat.dtype)
    carry0 = (z, z, jnp.zeros((ncol,), chat.dtype), z, z)
    _, cond_r = jax.lax.scan(step, carry0, xs)
    return cond_r.T


def convtran_single(qcnst, fracis, mu, md, du, eu, ed, dp, jt, mx, dt,
                    dpdry=None, is_dry: bool = False):
    """Convective transport of one tracer (convtran inner loop,
    zm_conv.F90:1976-2311). Returns dqdt (/s)."""
    ncol, pver = qcnst.shape
    karr = jnp.arange(pver)[None, :]

    if is_dry:
        fac = dp / dpdry
        dptmp, dutmp, eutmp, edtmp = dpdry, du * fac, eu * fac, ed * fac
    else:
        dptmp, dutmp, eutmp, edtmp = dp, du, eu, ed

    const = qcnst
    chat = _interface_chat(const, geometric=True)

    conu = _updraft_profile(fracis * const, chat, mu, dutmp, eutmp, dptmp)
    cond = _downdraft_profile(edtmp * fracis * const, chat, md, edtmp, dptmp)

    # interface-shifted arrays: X_b = X(k+1)
    def below(a, fill=None):
        last = a[:, -1:] if fill is None else jnp.full_like(a[:, -1:], fill)
        return jnp.concatenate([a[:, 1:], last], axis=1)

    def above(a):
        return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)

    mu_b = below(mu, 0.0)
    md_b = below(md, 0.0)
    conu_b = below(conu)
    cond_b = below(cond)
    chat_b = below(chat)
    const_b = below(const)      # const(k+1)
    const_a = above(const)      # const(k-1)

    # version-3 flux-limited tendency (zm_conv.F90:2232-2248)
    fluxin = mu_b * conu_b + mu * jnp.minimum(chat, const_a) - \
        (md * cond + md_b * jnp.minimum(chat_b, const_b))
    fluxout = mu * conu + mu_b * jnp.minimum(chat_b, const) - \
        (md_b * cond_b + md * jnp.minimum(chat, const))
    netflux = fluxin - fluxout
    netflux = jnp.where(jnp.abs(netflux) <
                        jnp.maximum(fluxin, fluxout) * 1.0e-12, 0.0, netflux)
    dcondt = jnp.where(karr >= jt[:, None], netflux / dptmp, 0.0)

    # subcloud (zm_conv.F90:2253-2288): at k==mx version-3; below mx zero
    fluxin_s = mu * jnp.minimum(chat, const_a) - md * cond
    fluxout_s = mu * conu - md * jnp.minimum(chat, const)
    netflux_s = fluxin_s - fluxout_s
    netflux_s = jnp.where(jnp.abs(netflux_s) <
                          jnp.maximum(fluxin_s, fluxout_s) * 1.0e-12,
                          0.0, netflux_s)
    at_mx = karr == mx[:, None]
    below_mx = karr > mx[:, None]
    dcondt = jnp.where(at_mx, netflux_s / dptmp,
                       jnp.where(below_mx, 0.0, dcondt))
    return dcondt


def convtran(doconvtran, q, mu, md, du, eu, ed, dp, jt, mx, dt, fracis=None,
             dpdry=None, dry_mask=None):
    """Convective transport of tracers m >= 1 (water vapor excluded, matching
    the reference's `do m = 2, ncnst`). `doconvtran`/`dry_mask` are static
    per-tracer tuples; q is (ncol, pver, pcnst). Returns dqdt."""
    ncol, pver, pcnst = q.shape
    if fracis is None:
        fracis = jnp.ones_like(q)
    out = [jnp.zeros((ncol, pver), q.dtype)]
    for m in range(1, pcnst):
        if doconvtran[m]:
            is_dry = bool(dry_mask[m]) if dry_mask is not None else False
            out.append(convtran_single(q[:, :, m], fracis[:, :, m], mu, md,
                                       du, eu, ed, dp, jt, mx, dt,
                                       dpdry=dpdry, is_dry=is_dry))
        else:
            out.append(jnp.zeros((ncol, pver), q.dtype))
    return jnp.stack(out, axis=-1)


def momtran(u, v, mu, md, du, eu, ed, dp, jt, mx, dt,
            momcu: float, momcd: float):
    """Convective momentum transport with pressure-gradient terms and the
    Boville-Bretherton KE-dissipation heating (momtran, zm_conv.F90:2315-2715).

    Returns dict(dudt, dvdt, seten, pguall, pgdall, icwu, icwd) — seten is the
    dry-static-energy tendency (J/kg/s).
    """
    ncol, pver = u.shape
    dtype = u.dtype
    karr = jnp.arange(pver)[None, :]

    def below(a, fill=None):
        last = a[:, -1:] if fill is None else jnp.full_like(a[:, -1:], fill)
        return jnp.concatenate([a[:, 1:], last], axis=1)

    def above(a):
        return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)

    mu_b = below(mu, 0.0)
    md_b = below(md, 0.0)

    winds = (u, v)
    dqdt = []
    mflux = []
    windf_all = []
    pgu_all = []
    pgd_all = []
    icwu_all = []
    icwd_all = []

    for const in winds:
        chat = _interface_chat(const, geometric=False)
        const_a = above(const)
        const_b = below(const)
        dp_a = above(dp)

        # pressure-perturbation terms (zm_conv.F90:2466-2515)
        mududp = mu * _safe_div(const - const_a, dp_a) + \
            mu_b * _safe_div(const_b - const, dp)
        mddudp = md * _safe_div(const - const_a, dp_a) + \
            md_b * _safe_div(const_b - const, dp)
        pgu = -momcu * 0.5 * mududp
        pgd = -momcd * 0.5 * mddudp
        # bottom boundary: single-sided (zm_conv.F90:2503-2515)
        mududp_bot = mu * _safe_div(const - const_a, dp_a)
        mddudp_bot = md * _safe_div(const - const_a, dp_a)
        at_bot = karr == pver - 1
        pgu = jnp.where(at_bot, -momcu * mududp_bot, pgu)
        pgd = jnp.where(at_bot, -momcd * mddudp_bot, pgd)
        pgu = jnp.where(karr == 0, 0.0, pgu)
        pgd = jnp.where(karr == 0, 0.0, pgd)

        conu = _updraft_profile(const, chat, mu, du, eu, dp, extra=pgu)
        cond = _downdraft_profile(ed * const, chat, md, ed, dp, extra=pgd)

        conu_b = below(conu)
        cond_b = below(cond)
        chat_b = below(chat)

        dcondt = (mu_b * (conu_b - chat_b) - mu * (conu - chat) +
                  md_b * (cond_b - chat_b) - md * (cond - chat)) / dp
        dcondt = jnp.where(karr >= jt[:, None], dcondt, 0.0)
        at_mx = karr == mx[:, None]
        dcondt_mx = (1.0 / dp) * (-mu * (conu - chat) - md * (cond - chat))
        dcondt = jnp.where(at_mx, dcondt_mx,
                           jnp.where(karr > mx[:, None], 0.0, dcondt))

        mfx = -mu * (conu - chat) - md * (cond - chat)
        mfx = jnp.where(karr >= jt[:, None], mfx, 0.0)
        mfx_b = below(mfx, 0.0)
        windf = const - (mfx_b - mfx) * dt / dp

        dqdt.append(dcondt)
        mflux.append((mfx, mfx_b))
        windf_all.append(windf)
        pgu_all.append(-pgu)
        pgd_all.append(-pgd)
        icwu_all.append(conu)
        icwd_all.append(cond)

    # KE dissipation -> heating (zm_conv.F90:2648-2695)
    u0, v0 = winds
    u0_a, v0_a = above(u0), above(v0)
    u0_b, v0_b = below(u0), below(v0)
    utop, vtop = 0.5 * (u0 + u0_a), 0.5 * (v0 + v0_a)
    ubot, vbot = 0.5 * (u0 + u0_b), 0.5 * (v0 + v0_b)
    fket = utop * mflux[0][0] + vtop * mflux[1][0]
    fkeb = ubot * mflux[0][1] + vbot * mflux[1][1]
    ketend_cons = (fket - fkeb) / dp
    uf, vf = windf_all
    ketend = ((uf ** 2 + vf ** 2) - (u0 ** 2 + v0 ** 2)) * 0.5 / dt
    seten = jnp.where(karr >= jt[:, None], ketend_cons - ketend, 0.0)

    return dict(dudt=dqdt[0], dvdt=dqdt[1], seten=seten,
                pguall=(pgu_all[0], pgu_all[1]),
                pgdall=(pgd_all[0], pgd_all[1]),
                icwu=(icwu_all[0], icwu_all[1]),
                icwd=(icwd_all[0], icwd_all[1]))
