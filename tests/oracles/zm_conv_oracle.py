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
