"""TEST-ONLY scalar-loop NumPy oracles of the reference zm_conv routines.

Line-faithful transliterations of /root/reference/physics/zm_conv.F90
(`closure` :4028-4260, `q1q2_pjr` :4262-4421, `buoyan_dilute`'s CAPE/CIN
accumulation :4749-4816) used ONLY to pin the TPU-native forms
(cam_nor_physics_tpu/models/physics/zm_conv.py) against the reference's
actual arithmetic in f64 (the "allclose vs Fortran" north star, VERDICT r1
item 3 — no Fortran compiler exists in this environment, so the scalar
loops ARE the executable reference).

Conventions: 1-based Fortran level k maps to 0-based k-1 with the same
orientation (k=0 is the model top); the Fortran loop `do k = msg+1, pver`
becomes `for k in range(msg, pver)`. Column gathering (il1g:il2g) becomes
a plain loop over all columns — the repo solves ungathered with masks, so
untriggered columns are compared where both sides are defined. All
arithmetic is float64 in reference statement order.
"""

from __future__ import annotations

import numpy as np

# physical constants as zm_convi sets them (zm_conv.F90:129-176 via
# shr_const: rdair = rgas/mwdair = 8314.46759.../28.966)
CP = 1004.64
RD = 287.0423113650487
RL = 2.501e6
GRAV = 9.80616
EPS1 = 0.6219705862045155     # epsilo = rh2o/rair ratio form used by zm


def closure_oracle(q, t, p, z, s, tp, qs, qu, su, mc, du, mu, md, qd, sd,
                   qhat, shat, dp, qstp, zf, ql, dsubcld, cape, tl,
                   lcl, lel, jt, mx, msg, capelmt, tau):
    """closure (zm_conv.F90:4028-4260): CAPE-relaxation cloud-base mass
    flux. All arrays (ncol, pver) [zf (ncol, pver+1)], indices 0-based.
    Returns (mb, dadt, dboydt)."""
    ncol, pver = t.shape
    dtbdt = np.zeros(ncol)
    dqbdt = np.zeros(ncol)
    dtldt = np.zeros(ncol)
    dtmdt = np.zeros((ncol, pver))
    dqmdt = np.zeros((ncol, pver))
    dboydt = np.zeros((ncol, pver))
    thetavp = np.zeros((ncol, pver))
    thetavm = np.zeros((ncol, pver))
    dqsdtp = np.zeros((ncol, pver))
    dtpdt = np.zeros((ncol, pver))
    mb = np.zeros(ncol)

    for i in range(ncol):
        eb = p[i, mx[i]] * q[i, mx[i]] / (EPS1 + q[i, mx[i]])
        dtbdt[i] = (1.0 / dsubcld[i]) * (
            mu[i, mx[i]] * (shat[i, mx[i]] - su[i, mx[i]]) +
            md[i, mx[i]] * (shat[i, mx[i]] - sd[i, mx[i]]))
        dqbdt[i] = (1.0 / dsubcld[i]) * (
            mu[i, mx[i]] * (qhat[i, mx[i]] - qu[i, mx[i]]) +
            md[i, mx[i]] * (qhat[i, mx[i]] - qd[i, mx[i]]))
        debdt = EPS1 * p[i, mx[i]] / (EPS1 + q[i, mx[i]]) ** 2 * dqbdt[i]
        dtldt[i] = -2840.0 * (3.5 / t[i, mx[i]] * dtbdt[i] - debdt / eb) / \
            (3.5 * np.log(t[i, mx[i]]) - np.log(eb) - 4.805) ** 2

    # dtmdt / dqmdt: cumulus heating and drying (:4152-4185)
    for k in range(msg, pver - 1):
        for i in range(ncol):
            if k == jt[i]:
                dqmdt[i, k] = (1.0 / dp[i, k]) * (
                    mu[i, k + 1] * (qu[i, k + 1] - qhat[i, k + 1] +
                                    ql[i, k + 1]) +
                    md[i, k + 1] * (qd[i, k + 1] - qhat[i, k + 1]))
                dtmdt[i, k] = (1.0 / dp[i, k]) * (
                    mu[i, k + 1] * (su[i, k + 1] - shat[i, k + 1] -
                                    RL / CP * ql[i, k + 1]) +
                    md[i, k + 1] * (sd[i, k + 1] - shat[i, k + 1]))

    beta = 0.0
    for k in range(msg, pver - 1):
        for i in range(ncol):
            if k > jt[i] and k < mx[i]:
                dtmdt[i, k] = (mc[i, k] * (shat[i, k] - s[i, k]) -
                               mc[i, k + 1] * (shat[i, k + 1] - s[i, k])) \
                    / dp[i, k] - RL / CP * du[i, k] * \
                    (beta * ql[i, k] + (1 - beta) * ql[i, k + 1])
                dqmdt[i, k] = (
                    mu[i, k + 1] * (qu[i, k + 1] - qhat[i, k + 1] +
                                    CP / RL * (su[i, k + 1] - s[i, k])) -
                    mu[i, k] * (qu[i, k] - qhat[i, k] +
                                CP / RL * (su[i, k] - s[i, k])) +
                    md[i, k + 1] * (qd[i, k + 1] - qhat[i, k + 1] +
                                    CP / RL * (sd[i, k + 1] - s[i, k])) -
                    md[i, k] * (qd[i, k] - qhat[i, k] +
                                CP / RL * (sd[i, k] - s[i, k]))) / dp[i, k] \
                    + du[i, k] * (beta * ql[i, k] + (1 - beta) * ql[i, k + 1])

    # dboydt integrand, saturated segment lel..lcl (:4188-4219)
    for k in range(msg, pver):
        for i in range(ncol):
            if k >= lel[i] and k <= lcl[i]:
                thetavp[i, k] = tp[i, k] * (1000.0 / p[i, k]) ** (RD / CP) \
                    * (1.0 + 1.608 * qstp[i, k] - q[i, mx[i]])
                thetavm[i, k] = t[i, k] * (1000.0 / p[i, k]) ** (RD / CP) \
                    * (1.0 + 0.608 * q[i, k])
                dqsdtp[i, k] = qstp[i, k] * (1.0 + qstp[i, k] / EPS1) * \
                    EPS1 * RL / (RD * tp[i, k] ** 2)
                dtpdt[i, k] = tp[i, k] / (
                    1.0 + RL / CP * (dqsdtp[i, k] - qstp[i, k] / tp[i, k])) \
                    * (dtbdt[i] / t[i, mx[i]] + RL / CP *
                       (dqbdt[i] / tl[i] -
                        q[i, mx[i]] / tl[i] ** 2 * dtldt[i]))
                dboydt[i, k] = ((dtpdt[i, k] / tp[i, k] + 1.0 /
                                 (1.0 + 1.608 * qstp[i, k] - q[i, mx[i]]) *
                                 (1.608 * dqsdtp[i, k] * dtpdt[i, k] -
                                  dqbdt[i])) -
                                (dtmdt[i, k] / t[i, k] + 0.608 /
                                 (1.0 + 0.608 * q[i, k]) * dqmdt[i, k])) * \
                    GRAV * thetavp[i, k] / thetavm[i, k]

    # unsaturated segment lcl+1..mx-1 (:4222-4237)
    for k in range(msg, pver):
        for i in range(ncol):
            if k > lcl[i] and k < mx[i]:
                thetavp[i, k] = tp[i, k] * (1000.0 / p[i, k]) ** (RD / CP) \
                    * (1.0 + 0.608 * q[i, mx[i]])
                thetavm[i, k] = t[i, k] * (1000.0 / p[i, k]) ** (RD / CP) \
                    * (1.0 + 0.608 * q[i, k])
                dboydt[i, k] = (dtbdt[i] / t[i, mx[i]] + 0.608 /
                                (1.0 + 0.608 * q[i, mx[i]]) * dqbdt[i] -
                                dtmdt[i, k] / t[i, k] - 0.608 /
                                (1.0 + 0.608 * q[i, k]) * dqmdt[i, k]) * \
                    GRAV * thetavp[i, k] / thetavm[i, k]

    # dadt integral and mb (:4242-4257)
    dadt = np.zeros(ncol)
    for i in range(ncol):
        for k in range(lel[i], mx[i]):
            dadt[i] += dboydt[i, k] * (zf[i, k] - zf[i, k + 1])
        dltaa = -1.0 * (cape[i] - capelmt)
        if dadt[i] != 0.0:
            mb[i] = max(dltaa / tau / dadt[i], 0.0)
    return mb, dadt, dboydt


def q1q2_oracle(q, qs, qu, su, du, qhat, shat, dp, mu, md, sd, qd, ql,
                dsubcld, jt, mx, msg, evp, cu):
    """q1q2_pjr (zm_conv.F90:4262-4421), microp-off path.
    Returns (dqdt, dsdt, dl)."""
    ncol, pver = q.shape
    dqdt = np.zeros((ncol, pver))
    dsdt = np.zeros((ncol, pver))
    dl = np.zeros((ncol, pver))

    ktm = int(min(jt))
    for k in range(ktm, pver - 1):
        for i in range(ncol):
            emc = -cu[i, k] + evp[i, k]
            dsdt[i, k] = -RL / CP * emc + (
                mu[i, k + 1] * (su[i, k + 1] - shat[i, k + 1]) -
                mu[i, k] * (su[i, k] - shat[i, k]) +
                md[i, k + 1] * (sd[i, k + 1] - shat[i, k + 1]) -
                md[i, k] * (sd[i, k] - shat[i, k])) / dp[i, k]
            dqdt[i, k] = emc + (
                mu[i, k + 1] * (qu[i, k + 1] - qhat[i, k + 1]) -
                mu[i, k] * (qu[i, k] - qhat[i, k]) +
                md[i, k + 1] * (qd[i, k + 1] - qhat[i, k + 1]) -
                md[i, k] * (qd[i, k] - qhat[i, k])) / dp[i, k]
            dl[i, k] = du[i, k] * ql[i, k + 1]

    kbm = int(min(mx))
    for k in range(kbm, pver):
        for i in range(ncol):
            if k == mx[i]:
                dsdt[i, k] = (1.0 / dsubcld[i]) * (
                    -mu[i, k] * (su[i, k] - shat[i, k]) -
                    md[i, k] * (sd[i, k] - shat[i, k]))
                dqdt[i, k] = (1.0 / dsubcld[i]) * (
                    -mu[i, k] * (qu[i, k] - qhat[i, k]) -
                    md[i, k] * (qd[i, k] - qhat[i, k]))
            elif k > mx[i]:
                dsdt[i, k] = dsdt[i, k - 1]
                dqdt[i, k] = dqdt[i, k - 1]
    return dqdt, dsdt, dl


def cape_cin_oracle(buoy, pf, plge600, lcl, mx, msg, num_cin):
    """CAPE/CIN accumulation (buoyan_dilute, zm_conv.F90:4772-4816),
    statement-order transliteration. buoy is the finished parcel buoyancy
    tpv - tv + tiedke_add on midpoints (0 outside the plume), pf interface
    pressures (ncol, pver+1) in hPa, lcl/mx 0-based level indices, plge600
    the pl >= plclmin trigger mask. Returns (cape, cin, lel) per column;
    lel defaults to pver-1 where nothing is found (as the caller
    initializes it)."""
    ncol, pver = buoy.shape
    # neutral-buoyancy crossings, lelten bookkeeping (:4773-4782): Fortran
    # k = msg+2..pver maps to 0-based msg+1..pver-2 under k < lcl <= pver-1
    knt = np.zeros(ncol, dtype=int)
    lelten = np.full((ncol, num_cin), pver - 1, dtype=int)
    for k in range(msg + 1, pver):
        for i in range(ncol):
            if k < lcl[i] and plge600[i]:
                if buoy[i, k + 1] > 0.0 and buoy[i, k] <= 0.0:
                    knt[i] = min(num_cin, knt[i] + 1)
                    lelten[i, knt[i] - 1] = k
    # capeten/cinten per tentative EL (:4784-4795)
    capeten = np.zeros((ncol, num_cin))
    cinten = np.zeros((ncol, num_cin))
    for n in range(num_cin):
        for k in range(msg, pver):
            for i in range(ncol):
                if plge600[i] and k <= mx[i] and k > lelten[i, n]:
                    dlnp = np.log(pf[i, k + 1] / pf[i, k])
                    capeten[i, n] += RD * buoy[i, k] * dlnp
                    cinten[i, n] -= RD * min(buoy[i, k], 0.0) * dlnp
    # keep the maximum tentative cape (:4801-4810)
    cape = np.zeros(ncol)
    cin = np.zeros(ncol)
    lel = np.full(ncol, pver - 1, dtype=int)
    for n in range(num_cin):
        for i in range(ncol):
            if capeten[i, n] > cape[i]:
                cape[i] = capeten[i, n]
                cin[i] = cinten[i, n]
                lel[i] = lelten[i, n]
    return np.maximum(cape, 0.0), cin, lel


def zm_conv_evap_oracle(t, pmid, pdel, q, qs, fsnow_conv, prdprec, cldfrc,
                        deltat, prec_in, ke, ke_lnd, landfrac, zm_org,
                        tht_tweaks=True):
    """zm_conv_evap (zm_conv.F90:1712-1972), old_snow + tht path,
    statement-order transliteration. qs/fsnow_conv are precomputed inputs
    (the upstream qsat / cldfrc_fice products); prec_in in m/s.
    Returns a dict mirroring the repo routine's outputs."""
    TMELT = 273.15
    GRAVIT = 9.80616
    LATVAP = 2.501e6
    LATICE = 3.337e5
    ncol, pver = t.shape

    prec = prec_in * 1000.0
    flxprec = np.zeros((ncol, pver + 1))
    flxsnow = np.zeros((ncol, pver + 1))
    evpvint = np.zeros(ncol)
    ntprprd = np.zeros((ncol, pver))
    ntsnprd = np.zeros((ncol, pver))
    tend_s = np.zeros((ncol, pver))
    tend_q = np.zeros((ncol, pver))
    tend_s_snwprd = np.zeros((ncol, pver))
    tend_s_snwevmlt = np.zeros((ncol, pver))

    for k in range(pver):
        for i in range(ncol):
            # melt snow falling into layer (old_snow)
            if t[i, k] > TMELT:
                flxsntm = 0.0
                snowmlt = flxsnow[i, k] * GRAVIT / pdel[i, k]
            else:
                flxsntm = flxsnow[i, k]
                snowmlt = 0.0

            if tht_tweaks:
                evplimit = max(
                    1.0 - q[i, k] / (1.0 + q[i, k]) / qs[i, k], 0.0)
            else:
                evplimit = max(1.0 - q[i, k] / qs[i, k], 0.0)

            kemask = (ke * (1.0 - landfrac[i]) + ke_lnd * landfrac[i]
                      if zm_org else ke)
            evpprec = kemask * (1.0 - cldfrc[i, k]) * evplimit * \
                np.sqrt(flxprec[i, k])
            # supersaturation cap: the tht path COMMENTS OUT the qs-q cap
            # (zm_conv.F90:1877-1880), keeping only the flux-based limits
            evplimit = flxprec[i, k] * GRAVIT / pdel[i, k]
            evplimit = min(evplimit,
                           (prec[i] - evpvint[i]) * GRAVIT / pdel[i, k])
            evpprec = min(evplimit, evpprec)

            if flxprec[i, k] > 0.0:
                work1 = min(max(0.0, flxsntm / flxprec[i, k]), 1.0)
                evpsnow = evpprec * work1
            else:
                evpsnow = 0.0

            evpvint[i] += evpprec * pdel[i, k] / GRAVIT
            ntprprd[i, k] = prdprec[i, k] - evpprec

            if flxprec[i, k] > 0.0:
                work1b = min(max(0.0, flxsnow[i, k] / flxprec[i, k]), 1.0)
            else:
                work1b = 0.0
            work2 = max(fsnow_conv[i, k], work1b)
            if snowmlt > 0.0:
                work2 = 0.0
            ntsnprd[i, k] = prdprec[i, k] * work2 - evpsnow - snowmlt
            tend_s_snwprd[i, k] = prdprec[i, k] * work2 * LATICE
            tend_s_snwevmlt[i, k] = -(evpsnow + snowmlt) * LATICE

            flxprec[i, k + 1] = max(
                flxprec[i, k] + ntprprd[i, k] * pdel[i, k] / GRAVIT, 0.0)
            flxsnow[i, k + 1] = max(
                flxsnow[i, k] + ntsnprd[i, k] * pdel[i, k] / GRAVIT, 0.0)

            tend_s[i, k] = -evpprec * LATVAP + ntsnprd[i, k] * LATICE
            tend_q[i, k] = evpprec

    return dict(tend_s=tend_s, tend_q=tend_q, tend_s_snwprd=tend_s_snwprd,
                tend_s_snwevmlt=tend_s_snwevmlt, ntprprd=ntprprd,
                ntsnprd=ntsnprd, flxprec=flxprec, flxsnow=flxsnow,
                prec=flxprec[:, pver] / 1000.0,
                snow=flxsnow[:, pver] / 1000.0)


# constants the tht thermo uses (zm_convi via shr_const, zm_conv.F90:129-176)
ZVIR = 461.5046398201599 / RD - 1.0      # rh2o/rair - 1
CPVIR = 1.810e3 / CP - 1.0               # cpwv/cpair - 1
DCOL = (4.188e3 - 1.810e3) / RL          # (cpliq - cpwv)/latvap
TMELT = 273.15


def _qsat_hpa(t, p_hpa):
    """Goff-Gratch over water, hPa interface (qsat_hPa,
    zm_conv.F90:5421-5437 -> upstream qsat_water), scalar."""
    ts = 373.16
    e = (-7.90298 * (ts / t - 1.0)
         + 5.02808 * np.log10(ts / t)
         - 1.3816e-7 * (10.0 ** (11.344 * (1.0 - t / ts)) - 1.0)
         + 8.1328e-3 * (10.0 ** (-3.49149 * (ts / t - 1.0)) - 1.0)
         + np.log10(1013.246))
    es = 10.0 ** e * 100.0                    # Pa
    p = p_hpa * 100.0
    es = min(es, p)
    qs = EPS1 * es / (p - (1.0 - EPS1) * es)
    if p - es <= 0.0:
        qs = 1.0
    return es * 0.01, qs


def cldprp_oracle(q, t, p, z, s, zf, shat, qhat, jb, lel, landfrac, msg,
                  c0_lnd, c0_ocn, tiedke_add, tiedke_lnd, entrmn, alfadet):
    """cldprp (zm_conv.F90:3024-4026), zmconv_microp=OFF + tht-thermo path,
    statement-order transliteration. All profile arrays (ncol, pver)
    [zf (ncol, pver+1)], p in hPa, indices 0-based with k=0 the model top;
    jb == mx (updraft base), lel the launch level from buoyan_dilute;
    limcnv_f maps to msg+1 as in the repo. Returns a dict of the full
    output set (mass fluxes normalized by cloud-base flux, eu/du/ed in
    1/m)."""
    ncol, pver = t.shape

    ftemp = np.zeros(ncol)
    expnum = np.zeros(ncol)
    expdif = np.zeros(ncol)
    c0mask = c0_ocn * (1.0 - landfrac) + c0_lnd * landfrac
    tiedke_msk = tiedke_add * (1.0 - landfrac) + tiedke_lnd * landfrac

    dz = zf[:, :-1] - zf[:, 1:]

    pflx = np.zeros((ncol, pver + 1))
    k1 = np.zeros((ncol, pver))
    i2 = np.zeros((ncol, pver))
    i3 = np.zeros((ncol, pver))
    i4 = np.zeros((ncol, pver))
    mu = np.zeros((ncol, pver))
    f = np.zeros((ncol, pver))
    eps = np.zeros((ncol, pver))
    eu = np.zeros((ncol, pver))
    du = np.zeros((ncol, pver))
    ql = np.zeros((ncol, pver))
    cu = np.zeros((ncol, pver))
    evp = np.zeros((ncol, pver))
    cmeg = np.zeros((ncol, pver))
    qds = q.copy()
    md = np.zeros((ncol, pver))
    ed = np.zeros((ncol, pver))
    sd = s.copy()
    qd = q.copy()
    mc = np.zeros((ncol, pver))
    qu = q.copy()
    su = s.copy()
    qst = np.zeros((ncol, pver))
    est = np.zeros(ncol)
    mrd = np.zeros((ncol, pver))
    mcp = np.zeros((ncol, pver))
    mrl = np.zeros((ncol, pver))
    gamma = np.zeros((ncol, pver))
    hmn = np.zeros((ncol, pver))
    hsat = np.zeros((ncol, pver))
    hu = np.zeros((ncol, pver))
    hd = np.zeros((ncol, pver))
    rprd = np.zeros((ncol, pver))
    qcde = np.zeros((ncol, pver))
    tu = np.zeros((ncol, pver))
    td = np.zeros((ncol, pver))
    frz = np.zeros((ncol, pver))

    for k in range(pver):
        for i in range(ncol):
            est[i], qst[i, k] = _qsat_hpa(t[i, k], p[i, k])
            if p[i, k] - est[i] <= 0.0:
                qst[i, k] = 1.0
            mrd[i, k] = (1.0 + ZVIR * q[i, k]) * RD
            mcp[i, k] = (1.0 + CPVIR * q[i, k]) * CP
            mrl[i, k] = (1.0 - DCOL * (t[i, k] - TMELT)) * RL
            gamma[i, k] = qst[i, k] * (1.0 + qst[i, k] / EPS1) * EPS1 * \
                mrl[i, k] / (mrd[i, k] * t[i, k] ** 2) * mrl[i, k] / mcp[i, k]
            hmn[i, k] = mcp[i, k] * t[i, k] + GRAV * z[i, k] + \
                mrl[i, k] * q[i, k]
            hsat[i, k] = mcp[i, k] * t[i, k] + GRAV * z[i, k] + \
                mrl[i, k] * qst[i, k]
            hu[i, k] = hmn[i, k]
            hd[i, k] = hmn[i, k]
            td[i, k] = (hd[i, k] - GRAV * zf[i, k] -
                        (1.0 + DCOL * TMELT) * RL * qds[i, k]) / \
                (CP * (1.0 + (CPVIR - DCOL * (RL / CP)) * qds[i, k]))

    # interface log-means (:3379-3404)
    qsthat = np.zeros((ncol, pver))
    hsthat = np.zeros((ncol, pver))
    gamhat = np.zeros((ncol, pver))
    for k in range(msg + 1):
        hsthat[:, k] = hsat[:, k]
        qsthat[:, k] = qst[:, k]
        gamhat[:, k] = gamma[:, k]
    totpcp = np.zeros(ncol)
    totevp = np.zeros(ncol)
    for k in range(msg + 1, pver):
        for i in range(ncol):
            if abs(qst[i, k - 1] - qst[i, k]) > 1.0e-6:
                qsthat[i, k] = np.log(qst[i, k - 1] / qst[i, k]) * \
                    qst[i, k - 1] * qst[i, k] / (qst[i, k - 1] - qst[i, k])
            else:
                qsthat[i, k] = qst[i, k]
            hsthat[i, k] = mcp[i, k] * shat[i, k] + mrl[i, k] * qsthat[i, k]
            if abs(gamma[i, k - 1] - gamma[i, k]) > 1.0e-6:
                gamhat[i, k] = np.log(gamma[i, k - 1] / gamma[i, k]) * \
                    gamma[i, k - 1] * gamma[i, k] / \
                    (gamma[i, k - 1] - gamma[i, k])
            else:
                gamhat[i, k] = gamma[i, k]

    # initial plume top / detrainment level (:3410-3446)
    jt = np.zeros(ncol, dtype=int)
    jd = np.zeros(ncol, dtype=int)
    jlcl = np.zeros(ncol, dtype=int)
    j0 = np.zeros(ncol, dtype=int)
    hmin = np.full(ncol, 1.0e6)
    for i in range(ncol):
        jt[i] = min(max(lel[i], msg + 1), pver - 1)
        jd[i] = pver - 1
        jlcl[i] = lel[i]
    for k in range(msg, pver):
        for i in range(ncol):
            if hsat[i, k] <= hmin[i] and jt[i] <= k <= jb[i]:
                hmin[i] = hsat[i, k]
                j0[i] = k
    for i in range(ncol):
        j0[i] = min(j0[i], jb[i] - 2)
        j0[i] = max(j0[i], jt[i] + 2)
        j0[i] = min(j0[i], pver - 1)
        for k in range(msg, pver):
            if jt[i] <= k <= jb[i]:
                hu[i, k] = hmn[i, jb[i]] + CP * tiedke_msk[i]
                su[i, k] = s[i, jb[i]] + tiedke_msk[i] / \
                    (1.0 + CPVIR * qu[i, k])

    # Taylor-series integrals (:3430-3442)
    for k in range(pver - 2, msg - 1, -1):
        for i in range(ncol):
            if k < jb[i] and k >= jt[i]:
                k1[i, k] = k1[i, k + 1] + \
                    (hmn[i, jb[i]] - hmn[i, k]) * dz[i, k]
                ihat = 0.5 * (k1[i, k + 1] + k1[i, k])
                i2[i, k] = i2[i, k + 1] + ihat * dz[i, k]
                idag = 0.5 * (i2[i, k + 1] + i2[i, k])
                i3[i, k] = i3[i, k + 1] + idag * dz[i, k]
                iprm = 0.5 * (i3[i, k + 1] + i3[i, k])
                i4[i, k] = i4[i, k + 1] + iprm * dz[i, k]

    hmin[:] = 1.0e6
    for k in range(msg, pver):
        for i in range(ncol):
            if j0[i] <= k <= jb[i] and hmn[i, k] <= hmin[i]:
                hmin[i] = hmn[i, k]
                expdif[i] = hmn[i, jb[i]] - hmin[i]

    # eps(z) via the Taylor series (:3461-3487)
    for k in range(msg + 1, pver):
        for i in range(ncol):
            expnum[i] = 0.0
            ftemp[i] = 0.0
            if k < jt[i] or k >= jb[i]:
                k1[i, k] = 0.0
                expnum[i] = 0.0
            else:
                expnum[i] = hmn[i, jb[i]] - \
                    (hsat[i, k - 1] * (zf[i, k] - z[i, k]) +
                     hsat[i, k] * (z[i, k - 1] - zf[i, k])) / \
                    (z[i, k - 1] - z[i, k])
            if (expdif[i] > 100.0 and expnum[i] > 0.0) and \
                    k1[i, k] > expnum[i] * dz[i, k]:
                ftemp[i] = expnum[i] / k1[i, k]
                f[i, k] = ftemp[i] + i2[i, k] / k1[i, k] * ftemp[i] ** 2 + \
                    (2.0 * i2[i, k] ** 2 - k1[i, k] * i3[i, k]) / \
                    k1[i, k] ** 2 * ftemp[i] ** 3 + \
                    (-5.0 * k1[i, k] * i2[i, k] * i3[i, k] +
                     5.0 * i2[i, k] ** 3 + k1[i, k] ** 2 * i4[i, k]) / \
                    k1[i, k] ** 3 * ftemp[i] ** 4
                f[i, k] = max(f[i, k], 0.0)
                f[i, k] = min(f[i, k], entrmn)
    for i in range(ncol):
        if j0[i] < jb[i]:
            if f[i, j0[i]] < 1.0e-6 and f[i, j0[i] + 1] > f[i, j0[i]]:
                j0[i] = j0[i] + 1
    for k in range(msg + 1, pver):
        for i in range(ncol):
            if jt[i] <= k <= j0[i]:
                f[i, k] = max(f[i, k], f[i, k - 1])
    eps0 = np.zeros(ncol)
    for i in range(ncol):
        eps0[i] = f[i, j0[i]]
        eps[i, jb[i]] = eps0[i]
    for k in range(pver - 1, msg - 1, -1):
        for i in range(ncol):
            if j0[i] <= k <= jb[i]:
                eps[i, k] = f[i, j0[i]]
    for k in range(pver - 1, msg - 1, -1):
        for i in range(ncol):
            if k < j0[i] and k >= jt[i]:
                eps[i, k] = f[i, k]

    # ---- single iteration (zmconv_microp off: itnum = 1) ----
    # updraft mass flux / entrainment / detrainment (:3545-3570)
    tmplel = np.zeros(ncol, dtype=int)
    for i in range(ncol):
        if eps0[i] > 0.0:
            mu[i, jb[i]] = 1.0
            eu[i, jb[i]] = mu[i, jb[i]] / dz[i, jb[i]]
        tmplel[i] = jt[i]
    for k in range(pver - 1, msg - 1, -1):
        for i in range(ncol):
            if eps0[i] > 0.0 and tmplel[i] <= k < jb[i]:
                zuef = zf[i, k] - zf[i, jb[i]]
                rmue = (1.0 / eps0[i]) * \
                    (np.exp(eps[i, k + 1] * zuef) - 1.0) / zuef
                mu[i, k] = (1.0 / eps0[i]) * \
                    (np.exp(eps[i, k] * zuef) - 1.0) / zuef
                eu[i, k] = (rmue - mu[i, k + 1]) / dz[i, k]
                du[i, k] = (rmue - mu[i, k]) / dz[i, k]

    khighest = min(lel)
    klowest = max(jb)
    for k in range(klowest - 1, khighest - 1, -1):
        for i in range(ncol):
            if k <= jb[i] - 1 and k >= lel[i] and eps0[i] > 0.0:
                if mu[i, k] < 0.02:
                    hu[i, k] = hmn[i, k]
                    mu[i, k] = 0.0
                    eu[i, k] = 0.0
                    du[i, k] = mu[i, k + 1] / dz[i, k]
                else:
                    hu[i, k] = mu[i, k + 1] / mu[i, k] * hu[i, k + 1] + \
                        dz[i, k] / mu[i, k] * \
                        (eu[i, k] * hmn[i, k] - du[i, k] * hsat[i, k])

    # plume-top reset (:3601-3628); totfrz = 0 on the microp-off path
    doit = np.ones(ncol, dtype=bool)
    for k in range(klowest - 2, khighest - 2, -1):
        for i in range(ncol):
            if doit[i] and k <= jb[i] - 2 and k >= lel[i] - 1:
                if hu[i, k] <= hsthat[i, k] and \
                        hu[i, k + 1] > hsthat[i, k + 1] and \
                        mu[i, k] >= 0.02:
                    if hu[i, k] - hsthat[i, k] < -2000.0:
                        jt[i] = k + 1
                    else:
                        jt[i] = k
                    doit[i] = False
                elif hu[i, k] > hu[i, jb[i]] or mu[i, k] < 0.02:
                    jt[i] = k + 1
                    doit[i] = False

    for k in range(pver - 1, msg - 1, -1):
        for i in range(ncol):
            if k >= lel[i] and k <= jt[i] and eps0[i] > 0.0:
                mu[i, k] = 0.0
                eu[i, k] = 0.0
                du[i, k] = 0.0
                hu[i, k] = hmn[i, k]
            if k == jt[i] and eps0[i] > 0.0:
                du[i, k] = mu[i, k + 1] / dz[i, k]
                eu[i, k] = 0.0
                mu[i, k] = 0.0

    # initialise tu (:3648-3654)
    for k in range(pver - 1, msg, -1):
        for i in range(ncol):
            tu[i, k] = (hu[i, k] - GRAV * zf[i, k] -
                        (1.0 + DCOL * TMELT) * RL * qu[i, k]) / \
                (CP * (1.0 + (CPVIR - DCOL * (RL / CP)) * qu[i, k]))

    # updraft ascent with LCL search (:3656-3694)
    done = np.zeros(ncol, dtype=bool)
    kount = 0
    for k in range(pver - 1, msg, -1):
        for i in range(ncol):
            if k == jb[i] and eps0[i] > 0.0:
                qu[i, k] = q[i, jb[i]]
                tu[i, k] = (hu[i, k] - GRAV * zf[i, k] -
                            (1.0 + DCOL * TMELT) * RL * qu[i, k]) / \
                    (CP * (1.0 + (CPVIR - DCOL * (RL / CP)) * qu[i, k]))
                su[i, k] = (hu[i, k] -
                            (1.0 - DCOL * (tu[i, k] - TMELT)) * RL *
                            qu[i, k]) / ((1.0 + CPVIR * qu[i, k]) * CP)
            if (not done[i] and k > jt[i] and k < jb[i]) and eps0[i] > 0.0:
                su[i, k] = mu[i, k + 1] / mu[i, k] * su[i, k + 1] + \
                    dz[i, k] / mu[i, k] * (eu[i, k] - du[i, k]) * s[i, k]
                qu[i, k] = mu[i, k + 1] / mu[i, k] * qu[i, k + 1] + \
                    dz[i, k] / mu[i, k] * \
                    (eu[i, k] * q[i, k] - du[i, k] * qst[i, k])
                tu[i, k] = su[i, k] - GRAV / \
                    ((1.0 + 0.85 * qu[i, k]) * CP) * zf[i, k]
                _, qstu = _qsat_hpa(tu[i, k],
                                    (p[i, k] + p[i, k - 1]) / 2.0)
                if qu[i, k] >= qstu:
                    jlcl[i] = k
                    kount += 1
                    done[i] = True
        if kount >= ncol:
            break

    # saturated segment above the LCL (:3696-3707)
    for k in range(msg + 1, pver):
        for i in range(ncol):
            if (k > jt[i] and k <= jlcl[i]) and eps0[i] > 0.0:
                qu[i, k] = qsthat[i, k] + gamhat[i, k] * \
                    (hu[i, k] - hsthat[i, k]) / \
                    ((1.0 - DCOL * (tu[i, k] - TMELT)) * RL *
                     (1.0 + gamhat[i, k]))
                su[i, k] = shat[i, k] + (hu[i, k] - hsthat[i, k]) / \
                    ((1.0 + CPVIR * qu[i, k]) * CP * (1.0 + gamhat[i, k]))
                tu[i, k] = su[i, k] - GRAV / \
                    ((1.0 + CPVIR * qu[i, k]) * CP) * zf[i, k]

    # condensation (:3710-3737), microp-off branch
    for k in range(pver - 1, msg, -1):
        for i in range(ncol):
            if jt[i] <= k < jb[i] and eps0[i] > 0.0:
                cu[i, k] = ((mu[i, k] * su[i, k] -
                             mu[i, k + 1] * su[i, k + 1]) / dz[i, k] -
                            (eu[i, k] - du[i, k]) * s[i, k]) / (RL / CP) * \
                    ((1.0 + CPVIR * qu[i, k]) /
                     (1.0 - DCOL * (tu[i, k] - TMELT)))
                if k == jt[i]:
                    cu[i, k] = 0.0
                cu[i, k] = max(0.0, cu[i, k])

    # liquid water budget + rain production (:3838-3864), microp off
    for k in range(pver - 1, msg, -1):
        for i in range(ncol):
            rprd[i, k] = 0.0
            if jt[i] <= k < jb[i] and eps0[i] > 0.0 and mu[i, k] >= 0.0:
                if mu[i, k] > 0.0:
                    ql1 = 1.0 / mu[i, k] * \
                        (mu[i, k + 1] * ql[i, k + 1] -
                         dz[i, k] * du[i, k] * ql[i, k + 1] +
                         dz[i, k] * cu[i, k])
                    ql[i, k] = ql1 / (1.0 + dz[i, k] * c0mask[i])
                else:
                    ql[i, k] = 0.0
                totpcp[i] = totpcp[i] + dz[i, k] * \
                    (cu[i, k] - du[i, k] * ql[i, k + 1])
                rprd[i, k] = c0mask[i] * mu[i, k] * ql[i, k]
                qcde[i, k] = ql[i, k]

    # downdraft geometry + mass flux (:3868-3905)
    alfa = np.full(ncol, alfadet)
    epsm = np.zeros(ncol)
    for i in range(ncol):
        jt[i] = min(jt[i], jb[i] - 1)
        jd[i] = max(j0[i], jt[i] + 1)
        jd[i] = min(jd[i], jb[i])
        hd[i, jd[i]] = hmn[i, jd[i] - 1]
        if jd[i] < jb[i] and eps0[i] > 0.0:
            epsm[i] = eps0[i]
            md[i, jd[i]] = -alfa[i] * epsm[i] / eps0[i]
    for k in range(msg, pver):
        for i in range(ncol):
            if (k > jd[i] and k <= jb[i]) and eps0[i] > 0.0:
                zdef = zf[i, jd[i]] - zf[i, k]
                md[i, k] = -alfa[i] / (2.0 * eps0[i]) * \
                    (np.exp(2.0 * epsm[i] * zdef) - 1.0) / zdef
    for k in range(msg, pver):
        for i in range(ncol):
            if (jt[i] <= k <= jb[i]) and eps0[i] > 0.0 and jd[i] < jb[i]:
                ratmjb = min(abs(mu[i, jb[i]] / md[i, jb[i]]), 1.0)
                md[i, k] = md[i, k] * ratmjb

    small = 1.0e-20
    for k in range(msg, pver):
        for i in range(ncol):
            # k-1 guard: the reference relies on jt >= limcnv+1 keeping
            # k-1 in range; Python would silently wrap a -1 index
            if k >= max(jt[i], 1) and eps0[i] > 0.0:
                ed[i, k - 1] = (md[i, k - 1] - md[i, k]) / dz[i, k - 1]
                mdt = min(md[i, k], -small)
                hd[i, k] = (md[i, k - 1] * hd[i, k - 1] -
                            dz[i, k - 1] * ed[i, k - 1] * hmn[i, k - 1]) / mdt

    # downdraft humidity/dse (:3915-3968)
    for k in range(msg + 1, pver):
        for i in range(ncol):
            if (jd[i] <= k <= jb[i]) and eps0[i] > 0.0 and jd[i] < jb[i]:
                qds[i, k] = qsthat[i, k] + gamhat[i, k] * \
                    (hd[i, k] - hsthat[i, k]) / (RL * (1.0 + gamhat[i, k]))
                td[i, k] = (hd[i, k] - GRAV * zf[i, k] -
                            (1.0 + DCOL * TMELT) * RL * qds[i, k]) / \
                    (CP * (1.0 + (CPVIR - DCOL * (RL / CP)) * qds[i, k]))
                qds[i, k] = qsthat[i, k] + gamhat[i, k] * \
                    (hd[i, k] - hsthat[i, k]) / \
                    ((1.0 - DCOL * (td[i, k] - TMELT)) * RL *
                     (1.0 + gamhat[i, k]))
    for i in range(ncol):
        k = jd[i]
        qd[i, k] = qds[i, k]
        sd[i, k] = (hd[i, k] -
                    (1.0 - DCOL * (td[i, k] - TMELT)) * RL * qd[i, k]) / \
            ((1.0 + CPVIR * qd[i, k]) * CP)
        td[i, k] = sd[i, k] - GRAV / ((1.0 + CPVIR * qd[i, k]) * CP) * \
            zf[i, k]

    for k in range(msg + 1, pver):
        for i in range(ncol):
            if jd[i] <= k < jb[i] and eps0[i] > 0.0:
                qd[i, k + 1] = qds[i, k + 1]
                evp[i, k] = -ed[i, k] * q[i, k] + \
                    (md[i, k] * qd[i, k] - md[i, k + 1] * qd[i, k + 1]) / \
                    dz[i, k]
                evp[i, k] = max(evp[i, k], 0.0)
                mdt = min(md[i, k + 1], -small)
                sd[i, k + 1] = (((1.0 - DCOL * (td[i, k] - TMELT)) * RL /
                                 ((1.0 + CPVIR * qd[i, k]) * CP) *
                                 evp[i, k] - ed[i, k] * s[i, k]) * dz[i, k] +
                                md[i, k] * sd[i, k]) / mdt
                totevp[i] = totevp[i] - dz[i, k] * ed[i, k] * q[i, k]
    for i in range(ncol):
        totevp[i] = totevp[i] + md[i, jd[i]] * qd[i, jd[i]] - \
            md[i, jb[i]] * qd[i, jb[i]]

    for i in range(ncol):
        totpcp[i] = max(totpcp[i], 0.0)
        totevp[i] = max(totevp[i], 0.0)

    # evaporation-limited downdraft scaling + net rates (:3990-4008)
    for k in range(msg + 1, pver):
        for i in range(ncol):
            if totevp[i] > 0.0 and totpcp[i] > 0.0:
                fac = min(1.0, totpcp[i] / (totevp[i] + totpcp[i]))
                md[i, k] = md[i, k] * fac
                ed[i, k] = ed[i, k] * fac
                evp[i, k] = evp[i, k] * fac
            else:
                md[i, k] = 0.0
                ed[i, k] = 0.0
                evp[i, k] = 0.0
            cmeg[i, k] = cu[i, k] - evp[i, k]
            rprd[i, k] = rprd[i, k] - evp[i, k]

    # precipitation flux + net mass flux (:4011-4021)
    pflx[:, 0] = 0.0
    for k in range(1, pver + 1):
        for i in range(ncol):
            pflx[i, k] = pflx[i, k - 1] + rprd[i, k - 1] * dz[i, k - 1]
    for k in range(msg, pver):
        for i in range(ncol):
            mc[i, k] = mu[i, k] + md[i, k]

    return dict(mu=mu, eu=eu, du=du, md=md, ed=ed, sd=sd, qd=qd, mc=mc,
                qu=qu, su=su, qst=qst, hmn=hmn, hsat=hsat, ql=ql, qcde=qcde,
                cu=cu, evp=evp, cmeg=cmeg, rprd=rprd, pflx=pflx, jt=jt,
                jlcl=jlcl, j0=j0, jd=jd, eps0=eps0, hu=hu, hd=hd,
                totpcp=totpcp, totevp=totevp)


# ---------------------------------------------------------------------------
# parcel_dilute + entropy/enthalpy Brent inversions (zm_conv.F90:4824-5478)
# ---------------------------------------------------------------------------

CPLIQ = 4.188e3
CPWV = 1.810e3
RH2O = RD / EPS1
LATICE = 3.337e5
TFREEZ = 273.15


def _entropy(TK, p, qtot):
    """Raymond-Blythe moist entropy (entropy, zm_conv.F90:5280-5300);
    p in hPa."""
    L = RL - (CPLIQ - CPWV) * (TK - TFREEZ)
    _, qst = _qsat_hpa(TK, p)
    qv = min(qtot, qst)
    e = qv * p / (EPS1 + qv)
    return (CP + qtot * CPLIQ) * np.log(TK / TFREEZ) - \
        RD * np.log((p - e) / 1000.0) + L * qv / TK - \
        qv * RH2O * np.log(qv / qst)


def _enthalpy(TK, p, qtot, z):
    """Moist static enthalpy (enthalpy, zm_conv.F90:5440-5460); p in hPa."""
    L = RL - (CPLIQ - CPWV) * (TK - TFREEZ)
    _, qst = _qsat_hpa(TK, p)
    qv = min(qtot, qst)
    return (CP + qtot * CPLIQ) * TK + L * qv + (1.0 + qtot) * GRAV * z


def _brent_invert(func, s, Tfg):
    """The ientropy/ienthalpy Brent loop (zm_conv.F90:5304-5414),
    statement-order. func(T) is the entropy/enthalpy at T; returns
    (T, converged)."""
    LOOPMAX = 100
    EPS = 3.0e-8
    a = Tfg - 10.0
    b = Tfg + 10.0
    fa = func(a) - s
    fb = func(b) - s
    c = b
    fc = fb
    tol = 0.001
    d = ebr = b - a
    converged = False
    for _ in range(LOOPMAX + 1):
        if (fb > 0.0 and fc > 0.0) or (fb < 0.0 and fc < 0.0):
            c = a
            fc = fa
            d = b - a
            ebr = d
        if abs(fc) < abs(fb):
            a = b
            b = c
            c = a
            fa = fb
            fb = fc
            fc = fa
        tol1 = 2.0 * EPS * abs(b) + 0.5 * tol
        xm = 0.5 * (c - b)
        converged = abs(xm) <= tol1 or fb == 0.0
        if converged:
            break
        if abs(ebr) >= tol1 and abs(fa) > abs(fb):
            sbr = fb / fa
            if a == c:
                pbr = 2.0 * xm * sbr
                qbr = 1.0 - sbr
            else:
                qbr = fa / fc
                rbr = fb / fc
                pbr = sbr * (2.0 * xm * qbr * (qbr - rbr) -
                             (b - a) * (rbr - 1.0))
                qbr = (qbr - 1.0) * (rbr - 1.0) * (sbr - 1.0)
            if pbr > 0.0:
                qbr = -qbr
            pbr = abs(pbr)
            if 2.0 * pbr < min(3.0 * xm * qbr - abs(tol1 * qbr),
                               abs(ebr * qbr)):
                ebr = d
                d = pbr / qbr
            else:
                d = xm
                ebr = d
        else:
            d = xm
            ebr = d
        a = b
        fa = fb
        b = b + (d if abs(d) > tol1 else np.copysign(tol1, xm))
        fb = func(b) - s
    T = b
    _, qst = _qsat_hpa(T, p_global[0])
    return T, qst, converged


def _ienthalpy(s, p, z, qt, Tfg):
    p_global[0] = p
    return _brent_invert(lambda T: _enthalpy(T, p, qt, z), s, Tfg)


def _ientropy(s, p, qt, Tfg):
    p_global[0] = p
    return _brent_invert(lambda T: _entropy(T, p, qt), s, Tfg)


p_global = [1000.0]   # closure cell for the post-loop qsat in _brent_invert


def parcel_dilute_oracle(klaunch, p, z, t, q, tpert, dmpdz, msg):
    """parcel_dilute (zm_conv.F90:4824-5277), tht_tweaks path (enthalpy
    dilution, entropy precip/freeze adjustment), zm_org / lparcel_pbl off.
    p in hPa, dmpdz (ncol, pver) negative /m. Returns dict with
    tp/qstp/tpv/tmix/qsmix/tl/pl/lcl (0-based; lcl = klaunch where no
    condensation level was found, as the caller's init)."""
    ncol, pver = t.shape
    nit_lheat = 2
    lwmax = 1.0e-3
    tscool = 0.0

    tmix = np.zeros((ncol, pver))
    qtmix = np.zeros((ncol, pver))
    qsmix = np.zeros((ncol, pver))
    smix = np.zeros((ncol, pver))
    xsh2o = np.zeros((ncol, pver))
    ds_xsh2o = np.zeros((ncol, pver))
    ds_freeze = np.zeros((ncol, pver))
    tp = np.zeros((ncol, pver))
    qstp = np.zeros((ncol, pver))
    tpv = np.zeros((ncol, pver))
    tl = np.zeros(ncol)
    pl = np.zeros(ncol)
    zl = np.zeros(ncol)
    lcl = klaunch.copy()
    sp0 = np.zeros(ncol)
    qtp0 = np.zeros(ncol)
    mp0 = np.zeros(ncol)
    sp = np.zeros(ncol)
    qtp = np.zeros(ncol)
    mp = np.zeros(ncol)

    # ---- entrainment ascent (:4995-5148) ----
    for k in range(pver - 1, msg - 1, -1):
        for i in range(ncol):
            if k == klaunch[i]:
                qtp0[i] = q[i, k]
                sp0[i] = _enthalpy(t[i, k], p[i, k], qtp0[i], z[i, k])
                mp0[i] = 1.0
                smix[i, k] = sp0[i]
                qtmix[i, k] = qtp0[i]
                tmix[i, k] = t[i, k]
                _, qsmix[i, k] = _qsat_hpa(tmix[i, k], p[i, k])
            if k < klaunch[i]:
                dp = p[i, k] - p[i, k + 1]
                qtenv = 0.5 * (q[i, k] + q[i, k + 1])
                tenv = 0.5 * (t[i, k] + t[i, k + 1])
                penv = 0.5 * (p[i, k] + p[i, k + 1])
                zenv = 0.5 * (z[i, k] + z[i, k + 1])
                senv = _enthalpy(tenv, penv, qtenv, zenv)
                dpdz = -(penv * GRAV) / (RD * tenv)
                dzdp = 1.0 / dpdz
                dmpdp = dmpdz[i, k] * dzdp
                sp[i] = sp[i] - dmpdp * dp * senv
                qtp[i] = qtp[i] - dmpdp * dp * qtenv
                mp[i] = mp[i] - dmpdp * dp
                smix[i, k] = (sp0[i] + sp[i]) / (mp0[i] + mp[i])
                qtmix[i, k] = (qtp0[i] + qtp[i]) / (mp0[i] + mp[i])
                tfguess = tmix[i, k + 1]
                tmix[i, k], qsmix[i, k], _ = _ienthalpy(
                    smix[i, k], p[i, k], z[i, k], qtmix[i, k], tfguess)
                if qsmix[i, k] <= qtmix[i, k] and \
                        qsmix[i, k + 1] > qtmix[i, k + 1]:
                    lcl[i] = k
                    qxsk = qtmix[i, k] - qsmix[i, k]
                    qxskp1 = qtmix[i, k + 1] - qsmix[i, k + 1]
                    dqxsdp = (qxsk - qxskp1) / dp
                    pl[i] = p[i, k + 1] - qxskp1 / dqxsdp
                    zl[i] = z[i, k + 1] - qxskp1 / dqxsdp * dzdp
                    dsdp = (smix[i, k] - smix[i, k + 1]) / dp
                    dqtdp = (qtmix[i, k] - qtmix[i, k + 1]) / dp
                    slcl = smix[i, k + 1] + dsdp * (pl[i] - p[i, k + 1])
                    qtlcl = qtmix[i, k + 1] + dqtdp * (pl[i] - p[i, k + 1])
                    tfguess = tmix[i, k]
                    tl[i], _, _ = _ienthalpy(slcl, pl[i], zl[i], qtlcl,
                                             tfguess)

    # ---- precipitation / freezing adjustment (:5170-5270) ----
    for k in range(pver - 1, msg - 1, -1):
        for i in range(ncol):
            if k == klaunch[i]:
                tp[i, k] = tmix[i, k]
                qstp[i, k] = q[i, k]
                tpv[i, k] = (tp[i, k] + tpert[i]) * \
                    (1.0 + qstp[i, k] / EPS1) / (1.0 + qstp[i, k])
            if k < klaunch[i]:
                smix[i, k] = _entropy(tmix[i, k], p[i, k], qtmix[i, k])
                new_q = qtmix[i, k]
                for _ in range(nit_lheat):
                    xsh2o[i, k] = max(
                        0.0, qtmix[i, k] - qsmix[i, k] - lwmax)
                    ds_xsh2o[i, k] = ds_xsh2o[i, k + 1] - CPLIQ * \
                        np.log(tmix[i, k] / TFREEZ) * \
                        max(0.0, xsh2o[i, k] - xsh2o[i, k + 1])
                    if tmix[i, k] <= TFREEZ + tscool and \
                            ds_freeze[i, k + 1] == 0.0:
                        ds_freeze[i, k] = (LATICE / tmix[i, k]) * max(
                            0.0, qtmix[i, k] - qsmix[i, k] - xsh2o[i, k])
                    if tmix[i, k] <= TFREEZ + tscool and \
                            ds_freeze[i, k + 1] != 0.0:
                        ds_freeze[i, k] = ds_freeze[i, k + 1] + \
                            (LATICE / tmix[i, k]) * max(
                                0.0, qsmix[i, k + 1] - qsmix[i, k])
                    new_s = smix[i, k] + ds_xsh2o[i, k] + ds_freeze[i, k]
                    new_q = qtmix[i, k] - xsh2o[i, k]
                    tfguess = tmix[i, k]
                    tmix[i, k], qsmix[i, k], _ = _ientropy(
                        new_s, p[i, k], new_q, tfguess)
                tp[i, k] = tmix[i, k]
                if new_q > qsmix[i, k]:
                    qstp[i, k] = qsmix[i, k]
                else:
                    qstp[i, k] = new_q
                tpv[i, k] = (tp[i, k] + tpert[i]) * \
                    (1.0 + qstp[i, k] / EPS1) / (1.0 + new_q)

    return dict(tp=tp, qstp=qstp, tpv=tpv, tmix=tmix, qsmix=qsmix,
                qtmix=qtmix, tl=tl, pl=pl, lcl=lcl)


def convtran_oracle(doconvtran, q, mu, md, du, eu, ed, dp, dsubcld, jt, mx,
                    fracis, dpdry, dry_mask, dt, msg=0):
    """convtran (zm_conv.F90:1976-2311), microp-off path, statement-order.
    All columns treated as gathered (ideep = identity); q (ncol, pver,
    ncnst); doconvtran/dry_mask per-tracer bools (m=0 never transported,
    matching `do m = 2, ncnst`). Returns dqdt."""
    ncol, pver, ncnst = q.shape
    small = 1.0e-36
    mbsth = 1.0e-15
    dqdt = np.zeros_like(q)
    ktm = int(min(jt))
    kbm = int(min(mx))

    for m in range(1, ncnst):
        if not doconvtran[m]:
            continue
        if dry_mask[m]:
            dptmp = dpdry.copy()
            dutmp = du * dp / dpdry
            eutmp = eu * dp / dpdry
            edtmp = ed * dp / dpdry
        else:
            dptmp, dutmp, eutmp, edtmp = dp, du, eu, ed
        const = q[:, :, m]
        fisg = fracis[:, :, m]

        chat = np.zeros((ncol, pver))
        conu = np.zeros((ncol, pver))
        cond = np.zeros((ncol, pver))
        dcondt = np.zeros((ncol, pver))
        for k in range(pver):
            km1 = max(0, k - 1)
            for i in range(ncol):
                minc = min(const[i, km1], const[i, k])
                maxc = max(const[i, km1], const[i, k])
                if minc < 0:
                    cdifr = 0.0
                else:
                    cdifr = abs(const[i, k] - const[i, km1]) / \
                        max(maxc, small)
                if cdifr > 1.0e-6:
                    cabv = max(const[i, km1], maxc * 1e-12)
                    cbel = max(const[i, k], maxc * 1e-12)
                    chat[i, k] = np.log(cabv / cbel) / (cabv - cbel) * \
                        cabv * cbel
                else:
                    chat[i, k] = 0.5 * (const[i, k] + const[i, km1])
                conu[i, k] = chat[i, k]
                cond[i, k] = chat[i, k]

        # boundary levels (:2152-2163); F k=2 -> 0-based 1
        for i in range(ncol):
            kk = pver - 1
            mupdudp = mu[i, kk] + dutmp[i, kk] * dptmp[i, kk]
            if mupdudp > mbsth:
                conu[i, kk] = (eutmp[i, kk] * fisg[i, kk] * const[i, kk] *
                               dptmp[i, kk]) / mupdudp
            if md[i, 1] < -mbsth:
                cond[i, 1] = (-edtmp[i, 0] * fisg[i, 0] * const[i, 0] *
                              dptmp[i, 0]) / md[i, 1]
        # updraft bottom->top (:2166-2175)
        for kk in range(pver - 2, -1, -1):
            kkp1 = min(pver - 1, kk + 1)
            for i in range(ncol):
                mupdudp = mu[i, kk] + dutmp[i, kk] * dptmp[i, kk]
                if mupdudp > mbsth:
                    conu[i, kk] = (mu[i, kkp1] * conu[i, kkp1] +
                                   eutmp[i, kk] * fisg[i, kk] *
                                   const[i, kk] * dptmp[i, kk]) / mupdudp
        # downdraft top->bottom (:2178-2186); F k=3..pver -> 0-based 2..
        for k in range(2, pver):
            km1 = max(0, k - 1)
            for i in range(ncol):
                if md[i, k] < -mbsth:
                    cond[i, k] = (md[i, km1] * cond[i, km1] -
                                  edtmp[i, km1] * fisg[i, km1] *
                                  const[i, km1] * dptmp[i, km1]) / md[i, k]

        # interior tendencies, version-3 limited fluxes (:2189-2221)
        for k in range(ktm, pver):
            km1 = max(0, k - 1)
            kp1 = min(pver - 1, k + 1)
            for i in range(ncol):
                fluxin = mu[i, kp1] * conu[i, kp1] + \
                    mu[i, k] * min(chat[i, k], const[i, km1]) - \
                    (md[i, k] * cond[i, k] +
                     md[i, kp1] * min(chat[i, kp1], const[i, kp1]))
                fluxout = mu[i, k] * conu[i, k] + \
                    mu[i, kp1] * min(chat[i, kp1], const[i, k]) - \
                    (md[i, kp1] * cond[i, kp1] +
                     md[i, k] * min(chat[i, k], const[i, k]))
                netflux = fluxin - fluxout
                if abs(netflux) < max(fluxin, fluxout) * 1e-12:
                    netflux = 0.0
                dcondt[i, k] = netflux / dptmp[i, k]
        # cloud-base layer (:2225-2257)
        for k in range(kbm, pver):
            km1 = max(0, k - 1)
            for i in range(ncol):
                if k == mx[i]:
                    fluxin = mu[i, k] * min(chat[i, k], const[i, km1]) - \
                        md[i, k] * cond[i, k]
                    fluxout = mu[i, k] * conu[i, k] - \
                        md[i, k] * min(chat[i, k], const[i, k])
                    netflux = fluxin - fluxout
                    if abs(netflux) < max(fluxin, fluxout) * 1e-12:
                        netflux = 0.0
                    dcondt[i, k] = netflux / dptmp[i, k]
                elif k > mx[i]:
                    dcondt[i, k] = 0.0
        dqdt[:, :, m] = dcondt
    return dqdt


def momtran_oracle(u, v, mu, md, du, eu, ed, dp, jt, mx, dt, momcu, momcd):
    """momtran (zm_conv.F90:2315-2715), statement-order incl. the
    pressure-gradient terms, the reference's as-written downdraft boundary
    parenthesization, and the Boville-Bretherton KE-dissipation heating.
    Returns dict(dudt, dvdt, seten, pguall, pgdall, icwu, icwd)."""
    ncol, pver = u.shape
    mbsth = 1.0e-15
    winds = [u, v]
    coefs = [momcu, momcd]
    ktm = int(min(jt))
    kbm = int(min(mx))

    dqdt = np.zeros((ncol, pver, 2))
    pguall = np.zeros((ncol, pver, 2))
    pgdall = np.zeros((ncol, pver, 2))
    icwu = np.stack([u, v], axis=-1).copy()
    icwd = np.stack([u, v], axis=-1).copy()
    mflux = np.zeros((ncol, pver + 1, 2))
    wind0 = np.zeros((ncol, pver, 2))
    windf = np.zeros((ncol, pver, 2))
    seten = np.zeros((ncol, pver))

    for m in range(2):
        const = winds[m].copy()
        wind0[:, :, m] = const
        chat = np.zeros((ncol, pver))
        conu = np.zeros((ncol, pver))
        cond = np.zeros((ncol, pver))
        dcondt = np.zeros((ncol, pver))
        for k in range(pver):
            km1 = max(0, k - 1)
            chat[:, k] = 0.5 * (const[:, k] + const[:, km1])
        conu[:] = chat
        cond[:] = chat

        pgu = np.zeros((ncol, pver))
        pgd = np.zeros((ncol, pver))
        for k in range(1, pver - 1):
            km1 = max(0, k - 1)
            kp1 = min(pver - 1, k + 1)
            for i in range(ncol):
                mududp = mu[i, k] * (const[i, k] - const[i, km1]) / \
                    dp[i, km1] + mu[i, kp1] * \
                    (const[i, kp1] - const[i, k]) / dp[i, k]
                pgu[i, k] = -momcu * 0.5 * mududp
                mddudp = md[i, k] * (const[i, k] - const[i, km1]) / \
                    dp[i, km1] + md[i, kp1] * \
                    (const[i, kp1] - const[i, k]) / dp[i, k]
                pgd[i, k] = -momcd * 0.5 * mddudp
        k = pver - 1
        km1 = k - 1
        for i in range(ncol):
            mududp = mu[i, k] * (const[i, k] - const[i, km1]) / dp[i, km1]
            pgu[i, k] = -momcu * mududp
            mddudp = md[i, k] * (const[i, k] - const[i, km1]) / dp[i, km1]
            pgd[i, k] = -momcd * mddudp

        # boundary levels; NOTE the reference's as-written parenthesization
        # of the downdraft init: only the pgd term is divided by md
        # (zm_conv.F90:2520-2523)
        for i in range(ncol):
            kk = pver - 1
            mupdudp = mu[i, kk] + du[i, kk] * dp[i, kk]
            if mupdudp > mbsth:
                conu[i, kk] = (eu[i, kk] * const[i, kk] * dp[i, kk] +
                               pgu[i, kk] * dp[i, kk]) / mupdudp
            if md[i, 1] < -mbsth:
                cond[i, 1] = (-ed[i, 0] * const[i, 0] * dp[i, 0]) - \
                    pgd[i, 0] * dp[i, 0] / md[i, 1]
        for kk in range(pver - 2, -1, -1):
            kkp1 = min(pver - 1, kk + 1)
            for i in range(ncol):
                mupdudp = mu[i, kk] + du[i, kk] * dp[i, kk]
                if mupdudp > mbsth:
                    conu[i, kk] = (mu[i, kkp1] * conu[i, kkp1] +
                                   eu[i, kk] * const[i, kk] * dp[i, kk] +
                                   pgu[i, kk] * dp[i, kk]) / mupdudp
        for k in range(2, pver):
            km1 = max(0, k - 1)
            for i in range(ncol):
                if md[i, k] < -mbsth:
                    cond[i, k] = (md[i, km1] * cond[i, km1] -
                                  ed[i, km1] * const[i, km1] * dp[i, km1] -
                                  pgd[i, km1] * dp[i, km1]) / md[i, k]

        for k in range(ktm, pver):
            kp1 = min(pver - 1, k + 1)
            for i in range(ncol):
                dcondt[i, k] = (mu[i, kp1] * (conu[i, kp1] - chat[i, kp1]) -
                                mu[i, k] * (conu[i, k] - chat[i, k]) +
                                md[i, kp1] * (cond[i, kp1] - chat[i, kp1]) -
                                md[i, k] * (cond[i, k] - chat[i, k])) / \
                    dp[i, k]
        for k in range(kbm, pver):
            for i in range(ncol):
                if k == mx[i]:
                    dcondt[i, k] = (1.0 / dp[i, k]) * \
                        (-mu[i, k] * (conu[i, k] - chat[i, k]) -
                         md[i, k] * (cond[i, k] - chat[i, k]))
        dqdt[:, :, m] = dcondt
        pguall[:, :, m] = -pgu
        pgdall[:, :, m] = -pgd
        icwu[:, :, m] = conu
        icwd[:, :, m] = cond
        for k in range(ktm, pver):
            mflux[:, k, m] = -mu[:, k] * (conu[:, k] - chat[:, k]) - \
                md[:, k] * (cond[:, k] - chat[:, k])
        for k in range(ktm, pver):
            windf[:, k, m] = const[:, k] - \
                (mflux[:, k + 1, m] - mflux[:, k, m]) * dt / dp[:, k]

    # KE-dissipation heating (:2664-2692)
    for k in range(ktm, pver):
        km1 = max(0, k - 1)
        kp1 = min(pver - 1, k + 1)
        for i in range(ncol):
            utop = 0.5 * (wind0[i, k, 0] + wind0[i, km1, 0])
            vtop = 0.5 * (wind0[i, k, 1] + wind0[i, km1, 1])
            ubot = 0.5 * (wind0[i, kp1, 0] + wind0[i, k, 0])
            vbot = 0.5 * (wind0[i, kp1, 1] + wind0[i, k, 1])
            fket = utop * mflux[i, k, 0] + vtop * mflux[i, k, 1]
            fkeb = ubot * mflux[i, k + 1, 0] + vbot * mflux[i, k + 1, 1]
            ketend_cons = (fket - fkeb) / dp[i, k]
            ketend = ((windf[i, k, 0] ** 2 + windf[i, k, 1] ** 2) -
                      (wind0[i, k, 0] ** 2 + wind0[i, k, 1] ** 2)) * \
                0.5 / dt
            seten[i, k] = ketend_cons - ketend

    return dict(dudt=dqdt[:, :, 0], dvdt=dqdt[:, :, 1], seten=seten,
                pguall=(pguall[:, :, 0], pguall[:, :, 1]),
                pgdall=(pgdall[:, :, 0], pgdall[:, :, 1]),
                icwu=(icwu[:, :, 0], icwu[:, :, 1]),
                icwd=(icwd[:, :, 0], icwd[:, :, 1]))
