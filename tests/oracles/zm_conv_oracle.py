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

# physical constants as zm_convi sets them (zm_conv.F90:129-176 via shr_const)
CP = 1004.64
RD = 287.042
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


def cape_cin_oracle(buoy, pmid, lel, lcl, mx, msg, num_cin):
    """The CAPE/CIN accumulation over up-to-num_cin buoyancy segments
    (buoyan_dilute, zm_conv.F90:4749-4816): from the launch level upward,
    alternate positive-area (CAPE) and negative-area (CIN) segments in
    hydrostatic-log-pressure form, keeping the deepest CAPE. buoy is the
    parcel buoyancy tpv - tv + tiedke_add on midpoints (0-based, k=0 top).
    Returns (cape, cin, lel_chosen) per column."""
    ncol, pver = buoy.shape
    cape = np.zeros(ncol)
    cin = np.zeros(ncol)
    lel_out = mx.copy()
    for i in range(ncol):
        best = 0.0
        # scan candidate LFC/EL pairs: a segment starts where buoy turns
        # positive going up (the reference's plge/plfc bookkeeping)
        n_seg = 0
        k = mx[i]
        while k > msg and n_seg < num_cin:
            # descend negative (CIN) stretch
            cin_seg = 0.0
            while k > msg and buoy[i, k] <= 0.0:
                dlnp = np.log(pmid[i, k] / pmid[i, k - 1])
                cin_seg += RD * (-min(buoy[i, k], 0.0)) * dlnp
                k -= 1
            cape_seg = 0.0
            lel_seg = k
            while k > msg and buoy[i, k] > 0.0:
                dlnp = np.log(pmid[i, k] / pmid[i, k - 1])
                cape_seg += RD * buoy[i, k] * dlnp
                lel_seg = k - 1
                k -= 1
            if cape_seg > max(best, 0.0):
                best = cape_seg
                cape[i] = cape_seg
                cin[i] = cin_seg
                lel_out[i] = lel_seg
            n_seg += 1
        cape[i] = max(cape[i], 0.0)
    return cape, cin, lel_out
