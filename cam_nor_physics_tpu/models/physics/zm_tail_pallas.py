"""Fused Pallas TPU kernel for the ZM pipeline tail: evap + momtran + convtran.

After zm_convr, zm_conv_tend runs three more level-recursive components
(zm_conv_evap, momtran, convtran — reference zm_conv.F90:1712-2715) whose XLA
lowering fragments into ~2300 tiny kernels (each lax.scan step is a launch
wave); at FV bench resolution they cost ~5 ms of pure dispatch through the
device tunnel for <1 ms of compute. This module fuses all three into ONE
Pallas program per column block.

TPU-first design decisions (vs the (cols, pver) mega-kernel in zm_pallas.py):
- **(pver, cols)-major layout**: operands arrive transposed as (pver, bc)
  blocks, so the 26-level axis pads to 32 sublanes and the column axis fills
  all 128 lanes x 4 tiles (bc=512). The (cols, pver) layout wastes 80% of
  each vreg (26 of 128 lanes).
- **Statically unrolled level recursions**: pver is static and small, so the
  updraft/downdraft/evaporation scans unroll into straight-line code on
  full-lane (bc,) rows — no fori carries (rank-1 layout joins), no dynamic
  value indexing, no scratch laundering (the zm_pallas pitfall catalog).
- Bulk level shifts (k-1 / k+1) are static-slice concatenations along the
  sublane axis.

Numerics are the same formulas as zm_conv.zm_conv_evap / zm_transport.momtran
/ zm_transport.convtran; Mosaic-vs-XLA transcendental ULP differences (the
Goff-Gratch qsat) bound the equivalence to ~1e-6 relative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import constants as c
from ...utils.config import ZMConfig
from ..physics.zm_conv import TFREEZ, cldfrc_fice
from ...ops.saturation import qsat as qsat_blend
from .zm_transport import MBSTH, SMALL, _safe_div

_F32 = jnp.float32


def use_pallas_tail(cfg: ZMConfig, dtype) -> bool:
    """Dispatch gate for the fused tail kernel (ZMConfig.use_pallas_tail:
    'auto' | True | False). Independent of the zm_convr mega-kernel flag."""
    import os
    if os.environ.get("CAM_FORCE_XLA") == "1":
        return False          # operational kill-switch (see ops.pallas_kernels)
    flag = getattr(cfg, "use_pallas_tail", "auto")
    if flag is True:
        return True
    if flag != "auto":
        return False
    try:
        return (jax.default_backend() == "tpu"
                and jax.device_count() == 1
                and dtype == jnp.float32)
    except Exception:
        return False


def _above(a):
    """a(k-1) with row 0 clamped (km1 = max(1, k-1) semantics)."""
    return jnp.concatenate([a[:1], a[:-1]], axis=0)


def _below(a, fill=None):
    """a(k+1) with the last row clamped (or filled with `fill`)."""
    last = a[-1:] if fill is None else jnp.full_like(a[-1:], fill)
    return jnp.concatenate([a[1:], last], axis=0)


def _chat_arith(const):
    return 0.5 * (const + _above(const))


def _chat_geometric(const):
    """Log-mean interface values (convtran, zm_conv.F90:2120-2143)."""
    c0 = _above(const)
    minc = jnp.minimum(c0, const)
    maxc = jnp.maximum(c0, const)
    cdifr = jnp.where(minc < 0, 0.0,
                      _safe_div(jnp.abs(const - c0),
                                jnp.maximum(maxc, SMALL)))
    cabv = jnp.maximum(c0, maxc * 1.0e-12)
    cbel = jnp.maximum(const, maxc * 1.0e-12)
    use_log = cdifr > 1.0e-6
    safe = jnp.where(use_log & (cabv != cbel), cabv - cbel, 1.0)
    logmean = jnp.log(jnp.where(use_log, _safe_div(cabv, cbel),
                                1.0)) / safe * cabv * cbel
    return jnp.where(use_log, logmean, 0.5 * (const + c0))


def _updraft(const_src, chat, mu, du, eu, dp, extra=None):
    """conu recursion, bottom-up, statically unrolled (zm_conv.F90:2151-2186)."""
    pver = chat.shape[0]
    zero = chat[0] * 0.0
    conu_b, mu_b = zero, zero
    rows = [None] * pver
    for k in range(pver - 1, -1, -1):
        ex = zero if extra is None else extra[k]
        mupdudp = mu[k] + du[k] * dp[k]
        val = _safe_div(mu_b * conu_b + eu[k] * const_src[k] * dp[k]
                        + ex * dp[k], mupdudp)
        conu_k = jnp.where(mupdudp > MBSTH, val, chat[k])
        rows[k] = conu_k
        conu_b, mu_b = conu_k, mu[k]
    return jnp.stack(rows, axis=0)


def _downdraft(const_src, chat, md, dp, extra=None):
    """cond recursion, top-down, statically unrolled (zm_conv.F90:2189-2199).

    const_src carries the ed-folded source (ed*const for tracers, ed*wind
    for momentum), matching zm_transport._downdraft_profile.
    """
    pver = chat.shape[0]
    zero = chat[0] * 0.0
    cond_p, md_p, src_p, dp_p, ex_p = zero, zero, zero, zero, zero
    rows = [None] * pver
    for k in range(pver):
        val = _safe_div(md_p * cond_p - (src_p * dp_p + ex_p * dp_p), md[k])
        cond_k = jnp.where(md[k] < -MBSTH, val, chat[k])
        rows[k] = cond_k
        cond_p, md_p, dp_p = cond_k, md[k], dp[k]
        src_p = const_src[k]
        ex_p = zero if extra is None else extra[k]
    return jnp.stack(rows, axis=0)


def _convtran_one(const, mu, md, du, eu, ed, dp, kge_jt, at_mx, below_mx):
    """Flux-limited convective transport of one tracer (fracis == 1)."""
    chat = _chat_geometric(const)
    conu = _updraft(const, chat, mu, du, eu, dp)
    cond = _downdraft(ed * const, chat, md, dp)

    mu_b = _below(mu, 0.0)
    md_b = _below(md, 0.0)
    conu_b = _below(conu)
    cond_b = _below(cond)
    chat_b = _below(chat)
    const_b = _below(const)
    const_a = _above(const)

    fluxin = mu_b * conu_b + mu * jnp.minimum(chat, const_a) - \
        (md * cond + md_b * jnp.minimum(chat_b, const_b))
    fluxout = mu * conu + mu_b * jnp.minimum(chat_b, const) - \
        (md_b * cond_b + md * jnp.minimum(chat, const))
    netflux = fluxin - fluxout
    netflux = jnp.where(jnp.abs(netflux) <
                        jnp.maximum(fluxin, fluxout) * 1.0e-12, 0.0, netflux)
    dcondt = jnp.where(kge_jt, netflux / dp, 0.0)

    fluxin_s = mu * jnp.minimum(chat, const_a) - md * cond
    fluxout_s = mu * conu - md * jnp.minimum(chat, const)
    netflux_s = fluxin_s - fluxout_s
    netflux_s = jnp.where(jnp.abs(netflux_s) <
                          jnp.maximum(fluxin_s, fluxout_s) * 1.0e-12,
                          0.0, netflux_s)
    return jnp.where(at_mx, netflux_s / dp,
                     jnp.where(below_mx, 0.0, dcondt))


def _momtran_wind(const, mu, md, du, eu, ed, dp, mu_b, md_b, kge_jt, at_mx,
                  below_mx, at_bot, at_top, momcu, momcd, dt):
    """One wind component of momtran (zm_conv.F90:2315-2715)."""
    chat = _chat_arith(const)
    const_a = _above(const)
    const_b = _below(const)
    dp_a = _above(dp)

    dgrad_a = _safe_div(const - const_a, dp_a)
    dgrad_b = _safe_div(const_b - const, dp)
    mududp = mu * dgrad_a + mu_b * dgrad_b
    mddudp = md * dgrad_a + md_b * dgrad_b
    pgu = -momcu * 0.5 * mududp
    pgd = -momcd * 0.5 * mddudp
    pgu = jnp.where(at_bot, -momcu * mu * dgrad_a, pgu)
    pgd = jnp.where(at_bot, -momcd * md * dgrad_a, pgd)
    pgu = jnp.where(at_top, 0.0, pgu)
    pgd = jnp.where(at_top, 0.0, pgd)

    conu = _updraft(const, chat, mu, du, eu, dp, extra=pgu)
    cond = _downdraft(ed * const, chat, md, dp, extra=pgd)

    conu_b = _below(conu)
    cond_b = _below(cond)
    chat_b = _below(chat)

    dcondt = (mu_b * (conu_b - chat_b) - mu * (conu - chat) +
              md_b * (cond_b - chat_b) - md * (cond - chat)) / dp
    dcondt = jnp.where(kge_jt, dcondt, 0.0)
    dcondt_mx = (1.0 / dp) * (-mu * (conu - chat) - md * (cond - chat))
    dcondt = jnp.where(at_mx, dcondt_mx, jnp.where(below_mx, 0.0, dcondt))

    mfx = -mu * (conu - chat) - md * (cond - chat)
    mfx = jnp.where(kge_jt, mfx, 0.0)
    mfx_b = _below(mfx, 0.0)
    windf = const - (mfx_b - mfx) * dt / dp
    return dict(dcondt=dcondt, mfx=mfx, mfx_b=mfx_b, windf=windf,
                pgu=-pgu, pgd=-pgd, conu=conu, cond=cond)


# scalar-per-column rows packed into one (n, bc) f32 operand
_SCAL = ("kemask", "prec", "jt", "mx")


def _tail_kernel(refs, *, pver, ntr, momcu, momcd, dt, ke_dummy):
    n_in = 14
    (t1_r, qv1_r, pmid_r, pdel_r, u_r, v_r, cld_r, rprd_r,
     mu_r, md_r, du_r, eu_r, ed_r, dp_r) = refs[:n_in]
    tr_rs = refs[n_in:n_in + ntr]
    scal_r = refs[n_in + ntr]
    outs = refs[n_in + ntr + 1:]
    (tend_s_o, tend_q_o, snwprd_o, snwevmlt_o, ntprprd_o, ntsnprd_o,
     flxprec_o, flxsnow_o, dudt_o, dvdt_o, seten_o,
     pguu_o, pguv_o, pgdu_o, pgdv_o, icwuu_o, icwuv_o, icwdu_o, icwdv_o
     ) = outs[:19]
    dq_os = outs[19:]

    t1 = t1_r[...]
    qv1 = qv1_r[...]
    pmid = pmid_r[...]
    pdel = pdel_r[...]
    mu = mu_r[...]
    md = md_r[...]
    du = du_r[...]
    eu = eu_r[...]
    ed = ed_r[...]
    dp = dp_r[...]
    kemask = scal_r[0, :]
    prec = scal_r[1, :]
    jt_f = scal_r[2, :]
    mx_f = scal_r[3, :]

    karr = jax.lax.broadcasted_iota(
        jnp.int32, (pver, t1.shape[1]), 0).astype(jnp.float32)
    kge_jt = karr >= jt_f[None, :]
    at_mx = karr == mx_f[None, :]
    below_mx = karr > mx_f[None, :]
    at_bot = karr == float(pver - 1)
    at_top = karr == 0.0

    # ---- zm_conv_evap (zm_conv.F90:1712-1972) ----
    _, qs = qsat_blend(t1, pmid)
    _, fsnow_conv = cldfrc_fice(t1)
    rprd = rprd_r[...]
    cld = cld_r[...]
    zero = t1[0] * 0.0
    flxprec_k, flxsnow_k, evpvint = zero, zero, zero
    flxprec_o[0, :] = zero
    flxsnow_o[0, :] = zero
    for k in range(pver):
        t_k, q_k, qs_k, pdel_k = t1[k], qv1[k], qs[k], pdel[k]
        melt = t_k > TFREEZ
        flxsntm = jnp.where(melt, 0.0, flxsnow_k)
        snowmlt = jnp.where(melt, flxsnow_k * c.GRAVIT / pdel_k, 0.0)
        evplimit = jnp.maximum(1.0 - q_k / (1.0 + q_k) / qs_k, 0.0)
        evpprec = kemask * (1.0 - cld[k]) * evplimit * jnp.sqrt(flxprec_k)
        evplimit2 = flxprec_k * c.GRAVIT / pdel_k
        evplimit2 = jnp.minimum(evplimit2,
                                (prec - evpvint) * c.GRAVIT / pdel_k)
        evpprec = jnp.minimum(evplimit2, evpprec)
        work1 = jnp.where(flxprec_k > 0.0,
                          jnp.clip(flxsntm / jnp.where(flxprec_k == 0, 1e-30,
                                                       flxprec_k), 0.0, 1.0),
                          0.0)
        evpsnow = evpprec * work1
        evpvint = evpvint + evpprec * pdel_k / c.GRAVIT
        ntprprd = rprd[k] - evpprec
        work1b = jnp.where(flxprec_k > 0.0,
                           jnp.clip(flxsnow_k / jnp.where(flxprec_k == 0,
                                                          1e-30, flxprec_k),
                                    0.0, 1.0),
                           0.0)
        work2 = jnp.maximum(fsnow_conv[k], work1b)
        work2 = jnp.where(snowmlt > 0.0, 0.0, work2)
        ntsnprd = rprd[k] * work2 - evpsnow - snowmlt
        snwprd_o[k, :] = rprd[k] * work2 * c.LATICE
        snwevmlt_o[k, :] = -(evpsnow + snowmlt) * c.LATICE
        flxprec_k = jnp.maximum(flxprec_k + ntprprd * pdel_k / c.GRAVIT, 0.0)
        flxsnow_k = jnp.maximum(flxsnow_k + ntsnprd * pdel_k / c.GRAVIT, 0.0)
        tend_s_o[k, :] = -evpprec * c.LATVAP + ntsnprd * c.LATICE
        tend_q_o[k, :] = evpprec
        ntprprd_o[k, :] = ntprprd
        ntsnprd_o[k, :] = ntsnprd
        flxprec_o[k + 1, :] = flxprec_k
        flxsnow_o[k + 1, :] = flxsnow_k

    # ---- momtran (zm_conv.F90:2315-2715) ----
    mu_b = _below(mu, 0.0)
    md_b = _below(md, 0.0)
    u0 = u_r[...]
    v0 = v_r[...]
    wu = _momtran_wind(u0, mu, md, du, eu, ed, dp, mu_b, md_b, kge_jt, at_mx,
                       below_mx, at_bot, at_top, momcu, momcd, dt)
    wv = _momtran_wind(v0, mu, md, du, eu, ed, dp, mu_b, md_b, kge_jt, at_mx,
                       below_mx, at_bot, at_top, momcu, momcd, dt)
    dudt_o[...] = wu["dcondt"]
    dvdt_o[...] = wv["dcondt"]
    pguu_o[...] = wu["pgu"]
    pguv_o[...] = wv["pgu"]
    pgdu_o[...] = wu["pgd"]
    pgdv_o[...] = wv["pgd"]
    icwuu_o[...] = wu["conu"]
    icwuv_o[...] = wv["conu"]
    icwdu_o[...] = wu["cond"]
    icwdv_o[...] = wv["cond"]

    utop, vtop = 0.5 * (u0 + _above(u0)), 0.5 * (v0 + _above(v0))
    ubot, vbot = 0.5 * (u0 + _below(u0)), 0.5 * (v0 + _below(v0))
    fket = utop * wu["mfx"] + vtop * wv["mfx"]
    fkeb = ubot * wu["mfx_b"] + vbot * wv["mfx_b"]
    ketend_cons = (fket - fkeb) / dp
    uf, vf = wu["windf"], wv["windf"]
    ketend = ((uf * uf + vf * vf) - (u0 * u0 + v0 * v0)) * 0.5 / dt
    seten_o[...] = jnp.where(kge_jt, ketend_cons - ketend, 0.0)

    # ---- convtran pass 1 (zm_conv.F90:1976-2311; fracis == 1, wet dp) ----
    for m in range(ntr):
        dq_os[m][...] = _convtran_one(tr_rs[m][...], mu, md, du, eu, ed, dp,
                                      kge_jt, at_mx, below_mx)


def zm_tail_pallas(cfg: ZMConfig, t1, qv1, pmid, pdel, u, v, q_tr, cld,
                   mu, md, du, eu, ed, dp, jt, mx, rprd, prec_in, landfrac,
                   ztodt: float, block_cols: int = 512, interpret: bool = False):
    """Run the fused evap+momtran+convtran tail.

    q_tr: (ncol, pver, ntr) stacked convtran-1 tracers (already in their
    pre-transport state — conv/evap updates never touch them).
    Returns (ev_dict, mt_dict, dq_tr) mirroring zm_conv_evap / momtran /
    convtran XLA outputs (dq_tr is (ncol, pver, ntr)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ncol, pver = t1.shape
    ntr = q_tr.shape[2]
    dtype = t1.dtype
    bc = min(block_cols, max(128, (ncol // 128) * 128 or 128))
    pad = (-ncol) % bc
    ncp = ncol + pad

    def padc(a):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)

    def t2(a):  # (ncol, pver) -> (pver, ncp)
        return padc(a).T.astype(_F32)

    kemask = cfg.ke * jnp.ones_like(landfrac) if not cfg.org else \
        cfg.ke * (1.0 - landfrac) + cfg.ke_lnd * landfrac
    scal = jnp.stack([padc(kemask), padc(prec_in * 1000.0),
                      padc(jt.astype(_F32)), padc(mx.astype(_F32))]
                     ).astype(_F32)

    ins = ([t2(a) for a in (t1, qv1, pmid, pdel, u, v, cld, rprd,
                            mu, md, du, eu, ed, dp)]
           + [t2(q_tr[:, :, m]) for m in range(ntr)] + [scal])

    sp_m = pl.BlockSpec((pver, bc), lambda i: (0, i), memory_space=pltpu.VMEM)
    sp_i = pl.BlockSpec((pver + 1, bc), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    sp_s = pl.BlockSpec((len(_SCAL), bc), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    in_specs = [sp_m] * (14 + ntr) + [sp_s]

    n_m_out = 19 + ntr
    out_shapes, out_specs = [], []
    for j in range(n_m_out):
        if j in (6, 7):     # flxprec / flxsnow on interfaces
            out_shapes.append(jax.ShapeDtypeStruct((pver + 1, ncp), _F32))
            out_specs.append(sp_i)
        else:
            out_shapes.append(jax.ShapeDtypeStruct((pver, ncp), _F32))
            out_specs.append(sp_m)

    def kern(*refs):
        _tail_kernel(refs, pver=pver, ntr=ntr, momcu=float(cfg.momcu),
                     momcd=float(cfg.momcd), dt=float(ztodt),
                     ke_dummy=float(cfg.ke))

    raw = pl.pallas_call(
        kern, grid=(ncp // bc,),
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*ins)

    def tb(a):  # (pver[,+1], ncp) -> (ncol, pver[,+1])
        return a.T[:ncol].astype(dtype)

    (tend_s, tend_q, snwprd, snwevmlt, ntprprd, ntsnprd, flxprec, flxsnow,
     dudt, dvdt, seten, pguu, pguv, pgdu, pgdv, icwuu, icwuv, icwdu,
     icwdv) = [tb(a) for a in raw[:19]]
    dq_tr = jnp.stack([tb(raw[19 + m]) for m in range(ntr)], axis=-1)

    ev = dict(tend_s=tend_s, tend_q=tend_q, tend_s_snwprd=snwprd,
              tend_s_snwevmlt=snwevmlt, ntprprd=ntprprd, ntsnprd=ntsnprd,
              flxprec=flxprec, flxsnow=flxsnow,
              prec=flxprec[:, -1] / 1000.0, snow=flxsnow[:, -1] / 1000.0)
    mt = dict(dudt=dudt, dvdt=dvdt, seten=seten,
              pguall=(pguu, pguv), pgdall=(pgdu, pgdv),
              icwu=(icwuu, icwuv), icwd=(icwdu, icwdv))
    return ev, mt, dq_tr
