"""TEST-ONLY scalar-loop NumPy oracles of the reference tp_core routines.

Line-faithful transliterations of /root/reference/fv/tp_core.F90 (xtpv
:285-497, xmist :505-556, fxppm :564-685, steepx :693-759, lmppm :767-877,
huynh :885-971, ymist :1084-1214, fyppm :1222-1388) used ONLY to pin the
TPU-native ops (cam_nor_physics_tpu/ops/tp_core.py) against the reference's
actual arithmetic in f64 (the "allclose vs Fortran" north star, VERDICT r1
item 3 — no Fortran compiler exists in this environment, so the scalar
loops ARE the executable reference).

Conventions: Fortran arrays with ghost bounds (-im/3 : im+im/3) become
`_Ghost` offset arrays; 1-based Fortran i maps to the same i here (the
comparisons shift to the repo's 0-based layout at the call sites). All
arithmetic is float64 in reference statement order.
"""

from __future__ import annotations

import numpy as np


class _Ghost:
    """Fortran array a(lo:hi) with integer indexing."""

    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.a = np.zeros(hi - lo + 1, np.float64)

    def __getitem__(self, i):
        return self.a[i - self.lo]

    def __setitem__(self, i, v):
        self.a[i - self.lo] = v


def _sign(a, b):
    """Fortran sign(a, b): |a| with the sign of b (+ for b == 0)."""
    return abs(a) if b >= 0 else -abs(a)


def _int(x):
    """Fortran real->integer assignment: truncation toward zero."""
    return int(np.trunc(x))


def xmist_oracle(q: _Ghost, im: int, id_: int) -> _Ghost:
    """xmist (tp_core.F90:505-556): 4th-order slope + Lin94 limiter.
    q must be ghost-filled on [-2, im+2] at least."""
    dm = _Ghost(-(im // 3), im + im // 3)
    r24 = 1.0 / 24.0
    if id_ <= 2:
        for i in range(1, im + 1):
            dm[i] = r24 * (8.0 * (q[i + 1] - q[i - 1]) + q[i - 2] - q[i + 2])
    else:
        for i in range(1, im + 1):
            dm[i] = 0.25 * (q[i + 1] - q[i - 1])
    if id_ < 0:
        return dm
    for i in range(1, im + 1):
        qmax = max(q[i - 1], q[i], q[i + 1]) - q[i]
        qmin = q[i] - min(q[i - 1], q[i], q[i + 1])
        dm[i] = _sign(min(abs(dm[i]), qmax, qmin), dm[i])
    return dm


def lmppm_oracle(dm, a6, ar, al, p, n: int, lmt: int):
    """lmppm (tp_core.F90:767-877) on 1-based length-n window views.
    Mutates a6/ar/al in place (lists or 1-indexed callables not needed —
    plain 0-based numpy views with Fortran i-1 shift applied by caller)."""
    r12 = 1.0 / 12.0
    if lmt == 0:
        for i in range(n):
            if dm[i] == 0.0:
                ar[i] = p[i]
                al[i] = p[i]
                a6[i] = 0.0
            else:
                da1 = ar[i] - al[i]
                da2 = da1 ** 2
                a6da = a6[i] * da1
                if a6da < -da2:
                    a6[i] = 3.0 * (al[i] - p[i])
                    ar[i] = al[i] - a6[i]
                elif a6da > da2:
                    a6[i] = 3.0 * (ar[i] - p[i])
                    al[i] = ar[i] - a6[i]
    elif lmt == 1:
        for i in range(n):
            da1 = dm[i] + dm[i]
            dl = _sign(min(abs(da1), abs(al[i] - p[i])), da1)
            dr = _sign(min(abs(da1), abs(ar[i] - p[i])), da1)
            ar[i] = p[i] + dr
            al[i] = p[i] - dl
            a6[i] = 3.0 * (dl - dr)
    elif lmt == 2:
        for i in range(n):
            if abs(ar[i] - al[i]) >= -a6[i]:
                continue
            fmin = p[i] + 0.25 * (ar[i] - al[i]) ** 2 / a6[i] + a6[i] * r12
            if fmin >= 0.0:
                continue
            if p[i] < ar[i] and p[i] < al[i]:
                ar[i] = p[i]
                al[i] = p[i]
                a6[i] = 0.0
            elif ar[i] > al[i]:
                a6[i] = 3.0 * (al[i] - p[i])
                ar[i] = al[i] - a6[i]
            else:
                a6[i] = 3.0 * (ar[i] - p[i])
                al[i] = ar[i] - a6[i]
    elif lmt == 3:
        for i in range(n):
            da1 = 4.0 * dm[i]
            dl = _sign(min(abs(da1), abs(al[i] - p[i])), da1)
            dr = _sign(min(abs(da1), abs(ar[i] - p[i])), da1)
            ar[i] = p[i] + dr
            al[i] = p[i] - dl
            a6[i] = 3.0 * (dl - dr)


def steepx_oracle(p: _Ghost, al: np.ndarray, dm: _Ghost, im: int):
    """steepx (tp_core.F90:693-759); al is the 1..im window (0-based)."""
    r3 = 1.0 / 3.0
    dh = np.zeros(im + 1)                 # 0..im
    d2 = np.zeros(im + 2)                 # 0..im+1
    eta = np.zeros(im + 1)                # 0..im
    for i in range(0, im + 1):
        dh[i] = p[i + 1] - p[i]
    for i in range(1, im + 1):
        d2[i] = dh[i] - dh[i - 1]
    d2[0] = d2[im]
    d2[im + 1] = d2[1]
    for i in range(1, im + 1):
        if d2[i + 1] * d2[i - 1] < 0.0 and p[i + 1] != p[i - 1]:
            xxx = 1.0 - 0.5 * (p[i + 2] - p[i - 2]) / (p[i + 1] - p[i - 1])
            eta[i] = max(0.0, min(xxx, 0.5))
        else:
            eta[i] = 0.0
    eta[0] = eta[im]
    for i in range(1, im + 1):
        bbb = (2.0 * eta[i] - eta[i - 1]) * dm[i - 1]
        ccc = (2.0 * eta[i - 1] - eta[i]) * dm[i]
        al[i - 1] = al[i - 1] + 0.5 * (eta[i - 1] - eta[i]) * dh[i - 1] + \
            (bbb - ccc) * r3
    return al


def huynh_oracle(ar, al, p, im: int):
    """huynh (tp_core.F90:885-971) on 0-based length-im windows; returns
    (a6, ar, al)."""
    d1 = np.zeros(im)
    d2 = np.zeros(im)
    d1[0] = p[0] - p[im - 1]
    for i in range(1, im):
        d1[i] = p[i] - p[i - 1]
    for i in range(im - 1):
        d2[i] = d1[i + 1] - d1[i]
    d2[im - 1] = d1[0] - d1[im - 1]
    # AR
    pmp = p[0] + 2.0 * d1[0]
    lac = p[0] + 0.5 * (d1[0] + d2[im - 1]) + d2[im - 1]
    ar[0] = min(max(p[0], pmp, lac), max(ar[0], min(p[0], pmp, lac)))
    for i in range(1, im):
        pmp = p[i] + 2.0 * d1[i]
        lac = p[i] + 0.5 * (d1[i] + d2[i - 1]) + d2[i - 1]
        ar[i] = min(max(p[i], pmp, lac), max(ar[i], min(p[i], pmp, lac)))
    # AL
    for i in range(im - 1):
        pmp = p[i] - 2.0 * d1[i + 1]
        lac = p[i] + 0.5 * (d2[i + 1] - d1[i + 1]) + d2[i + 1]
        al[i] = min(max(p[i], pmp, lac), max(al[i], min(p[i], pmp, lac)))
    pmp = p[im - 1] - 2.0 * d1[0]
    lac = p[im - 1] + 0.5 * (d2[0] - d1[0]) + d2[0]
    al[im - 1] = min(max(p[im - 1], pmp, lac),
                     max(al[im - 1], min(p[im - 1], pmp, lac)))
    a6 = 3.0 * (p + p - (al + ar))
    return a6, ar, al


def fxppm_oracle(c, mfx, qtmp: _Ghost, dm: _Ghost, iord: int, iuw: int,
                 iue: int, ffsl: bool, im: int):
    """fxppm (tp_core.F90:564-685). c/mfx are 0-based length-im (Fortran
    1..im); returns (fx 0-based, isave dict Fortran-indexed)."""
    r3, r23 = 1.0 / 3.0, 2.0 / 3.0
    G = im // 3
    al = _Ghost(-G, im + G)
    ar = _Ghost(-G, im + G)
    a6 = _Ghost(-G, im + G)
    fx = np.zeros(im)
    isave = {}

    for i in range(1, im + 1):
        al[i] = 0.5 * (qtmp[i - 1] + qtmp[i]) + (dm[i - 1] - dm[i]) * r3
    if iord == 6:
        alw = np.array([al[i] for i in range(1, im + 1)])
        steepx_oracle(qtmp, alw, dm, im)
        for i in range(1, im + 1):
            al[i] = alw[i - 1]
    for i in range(1, im):
        ar[i] = al[i + 1]
    ar[im] = al[1]

    if iord == 7:
        arw = np.array([ar[i] for i in range(1, im + 1)])
        alw = np.array([al[i] for i in range(1, im + 1)])
        pw = np.array([qtmp[i] for i in range(1, im + 1)])
        a6w, arw, alw = huynh_oracle(arw, alw, pw, im)
        for i in range(1, im + 1):
            a6[i] = a6w[i - 1]
            ar[i] = arw[i - 1]
            al[i] = alw[i - 1]
    else:
        if iord in (3, 5):
            for i in range(1, im + 1):
                a6[i] = 3.0 * (qtmp[i] + qtmp[i] - (al[i] + ar[i]))
        lmt = iord - 3
        dmw = np.array([dm[i] for i in range(1, im + 1)])
        a6w = np.array([a6[i] for i in range(1, im + 1)])
        arw = np.array([ar[i] for i in range(1, im + 1)])
        alw = np.array([al[i] for i in range(1, im + 1)])
        pw = np.array([qtmp[i] for i in range(1, im + 1)])
        lmppm_oracle(dmw, a6w, arw, alw, pw, im, lmt)
        for i in range(1, im + 1):
            a6[i] = a6w[i - 1]
            ar[i] = arw[i - 1]
            al[i] = alw[i - 1]

    if ffsl:
        for i in range(iuw, 1):
            al[i] = al[im + i]
            ar[i] = ar[im + i]
            a6[i] = a6[im + i]
        for i in range(im + 1, iue + 1):
            al[i] = al[i - im]
            ar[i] = ar[i - im]
            a6[i] = a6[i - im]
        for i in range(1, im + 1):
            iu = _int(c[i - 1])
            ru = c[i - 1] - iu
            if c[i - 1] > 0.0:
                itmp = i - iu - 1
                isave[i] = itmp + 1
                fx[i - 1] = ru * (ar[itmp] + 0.5 * ru * (
                    al[itmp] - ar[itmp] + a6[itmp] * (1.0 - r23 * ru)))
            else:
                itmp = i - iu
                isave[i] = itmp - 1
                fx[i - 1] = ru * (al[itmp] - 0.5 * ru * (
                    ar[itmp] - al[itmp] + a6[itmp] * (1.0 + r23 * ru)))
    else:
        al[0] = al[im]
        ar[0] = ar[im]
        a6[0] = a6[im]
        for i in range(1, im + 1):
            if c[i - 1] > 0.0:
                fx[i - 1] = ar[i - 1] + 0.5 * c[i - 1] * (
                    al[i - 1] - ar[i - 1] + a6[i - 1] * (1.0 - r23 * c[i - 1]))
            else:
                fx[i - 1] = al[i] - 0.5 * c[i - 1] * (
                    ar[i] - al[i] + a6[i] * (1.0 + r23 * c[i - 1]))
            fx[i - 1] = mfx[i - 1] * fx[i - 1]
    return fx, isave


def xtp_oracle(q, c, mfx, cosa: float, ffsl: bool, iord: int, id_: int):
    """xtpv for one latitude row (tp_core.F90:285-497).

    q/c/mfx: 0-based (im,) float64; for ffsl rows, `mfx` must already be
    the reference caller's xfx = mfx / c (the per-Courant pre-division the
    repo's xtp applies internally). Returns fx (im,).
    """
    im = q.shape[0]
    G = im // 3
    cos_upw, cos_van, cos_ppm = 0.05, 0.1, 0.1
    imp = im + 1
    qtmp = _Ghost(-G, im + G)
    fx = np.zeros(im)
    isave = {}
    for i in range(1, im + 1):
        qtmp[i] = q[i - 1]

    if ffsl:
        # The reference sizes the ghost fill from the FIRST/LAST element's
        # Courant (iuw = -c(1), iue = im - c(im), tp_core.F90:363-376) —
        # adequate for longitude-smooth winds where neighboring |c| are
        # close. Random test fields violate that smoothness, so fill the
        # full ghost band periodically (identical result for smooth c,
        # well-defined for rough c; the repo op indexes modularly).
        iuw = -G
        for i in range(iuw, 1):
            qtmp[i] = q[im + i - 1]
        iue = im + G
        for i in range(imp, iue + 1):
            qtmp[i] = q[i - im - 1]

        if iord == 1 or cosa < cos_upw:
            for i in range(1, im + 1):
                iu = _int(c[i - 1])
                if c[i - 1] <= 0.0:
                    itmp = i - iu
                    isave[i] = itmp - 1
                else:
                    itmp = i - iu - 1
                    isave[i] = itmp + 1
                fx[i - 1] = (c[i - 1] - iu) * qtmp[itmp]
        else:
            dm = _Ghost(-G, im + G)
            for i in range(1, im + 1):
                tmp = 0.25 * (qtmp[i + 1] - qtmp[i - 1])
                qmax = max(qtmp[i - 1], qtmp[i], qtmp[i + 1]) - qtmp[i]
                qmin = qtmp[i] - min(qtmp[i - 1], qtmp[i], qtmp[i + 1])
                dm[i] = _sign(min(abs(tmp), qmax, qmin), tmp)
            for i in range(iuw, 1):
                dm[i] = dm[im + i]
            for i in range(imp, iue + 1):
                dm[i] = dm[i - im]

            if iord >= 3 and cosa > cos_ppm:
                fx, isave = fxppm_oracle(c, mfx, qtmp, dm, iord, iuw, iue,
                                         True, im)
            else:
                for i in range(1, im + 1):
                    iu = _int(c[i - 1])
                    rut = c[i - 1] - iu
                    if c[i - 1] <= 0.0:
                        itmp = i - iu
                        isave[i] = itmp - 1
                        fx[i - 1] = rut * (qtmp[itmp] -
                                           dm[itmp] * (1.0 + rut))
                    else:
                        itmp = i - iu - 1
                        isave[i] = itmp + 1
                        fx[i - 1] = rut * (qtmp[itmp] +
                                           dm[itmp] * (1.0 - rut))

        for i in range(1, im + 1):
            if c[i - 1] >= 1.0:
                for ist in range(isave[i], i):
                    fx[i - 1] += qtmp[ist]
            elif c[i - 1] <= -1.0:
                for ist in range(i, isave[i] + 1):
                    fx[i - 1] -= qtmp[ist]
        if id_ != 0:
            for i in range(im):
                fx[i] *= mfx[i]
        return fx

    # regular (Eulerian) branch
    qtmp[imp] = q[0]
    qtmp[0] = q[im - 1]
    if iord == 1 or cosa < cos_upw:
        for i in range(1, im + 1):
            iu = _int(float(i) - c[i - 1])
            fx[i - 1] = mfx[i - 1] * qtmp[iu]
        return fx
    qtmp[-1] = q[im - 2]
    qtmp[imp + 1] = q[1]
    if iord > 0 or cosa < cos_van:
        dm = xmist_oracle(qtmp, im, 2)
    else:
        dm = xmist_oracle(qtmp, im, iord)
    dm[0] = dm[im]
    if abs(iord) == 2 or cosa < cos_van:
        for i in range(1, im + 1):
            iu = _int(float(i) - c[i - 1])
            fx[i - 1] = mfx[i - 1] * (qtmp[iu] + dm[iu] *
                                      (_sign(1.0, c[i - 1]) - c[i - 1]))
    else:
        fx, _ = fxppm_oracle(c, mfx, qtmp, dm, iord, 0, 0, False, im)
    return fx


def ymist_oracle(q, jord: int, iv: int):
    """ymist (tp_core.F90:1084-1214) for the full domain (jfirst=1,
    jlast=jm, ng=0 equivalent: all rows computed). q 0-based (jm, im);
    returns dm (jm, im)."""
    jm, im = q.shape
    dm = np.zeros_like(q)
    jm1 = jm - 1          # Fortran jm-1
    im2 = im // 2
    # interior rows: Fortran j = 2..jm-1 -> 0-based 1..jm-2
    for j in range(1, jm - 1):
        for i in range(im):
            dm[j, i] = 0.25 * (q[j + 1, i] - q[j - 1, i])
    if iv == 0:
        for i in range(im2):
            tmp = 0.25 * (q[1, i] - q[1, i + im2])
            qmax = max(q[1, i], q[0, i], q[1, i + im2]) - q[0, i]
            qmin = q[0, i] - min(q[1, i], q[0, i], q[1, i + im2])
            dm[0, i] = _sign(min(abs(tmp), qmax, qmin), tmp)
        for i in range(im2, im):
            dm[0, i] = -dm[0, i - im2]
        for i in range(im2):
            tmp = 0.25 * (q[jm1 - 1, i + im2] - q[jm1 - 1, i])
            qmax = max(q[jm1 - 1, i + im2], q[jm - 1, i],
                       q[jm1 - 1, i]) - q[jm - 1, i]
            qmin = q[jm - 1, i] - min(q[jm1 - 1, i + im2], q[jm - 1, i],
                                      q[jm1 - 1, i])
            dm[jm - 1, i] = _sign(min(abs(tmp), qmax, qmin), tmp)
        for i in range(im2, im):
            dm[jm - 1, i] = -dm[jm - 1, i - im2]
    else:
        for i in range(im2):
            tmp = 0.25 * (q[1, i] + q[1, i + im2])
            qmax = max(q[1, i], q[0, i], -q[1, i + im2]) - q[0, i]
            qmin = q[0, i] - min(q[1, i], q[0, i], -q[1, i + im2])
            dm[0, i] = _sign(min(abs(tmp), qmax, qmin), tmp)
        for i in range(im2, im):
            dm[0, i] = dm[0, i - im2]
        for i in range(im2):
            tmp = -0.25 * (q[jm1 - 1, i + im2] + q[jm1 - 1, i])
            qmax = max(-q[jm1 - 1, i + im2], q[jm - 1, i],
                       q[jm1 - 1, i]) - q[jm - 1, i]
            qmin = q[jm - 1, i] - min(-q[jm1 - 1, i + im2], q[jm - 1, i],
                                      q[jm1 - 1, i])
            dm[jm - 1, i] = _sign(min(abs(tmp), qmax, qmin), tmp)
        for i in range(im2, im):
            dm[jm - 1, i] = dm[jm - 1, i - im2]
    if jord > 0:
        for j in range(1, jm - 1):
            for i in range(im):
                qmax = max(q[j - 1, i], q[j, i], q[j + 1, i]) - q[j, i]
                qmin = q[j, i] - min(q[j - 1, i], q[j, i], q[j + 1, i])
                dm[j, i] = _sign(min(abs(dm[j, i]), qmin, qmax), dm[j, i])
    return dm


def fyppm_oracle(c, q, dm, jord: int, iv: int):
    """fyppm (tp_core.F90:1222-1388) for jfirst=1, jlast=jm. c/q/dm 0-based
    (jm, im) with c in the repo's south-edge convention (c[j] = Courant at
    the south edge of row j; the reference's c(i,j) = flux edge between
    rows j-1 and j is the same slot). Returns flux (jm, im), row 0 unset
    (=0)."""
    jm, im = q.shape
    r3, r23 = 1.0 / 3.0, 2.0 / 3.0
    imh = im // 2
    al = np.zeros((jm + 1, im))    # Fortran al(i, 1..jm+1) -> [j] 0..jm
    ar = np.zeros((jm, im))
    a6 = np.zeros((jm, im))
    flux = np.zeros((jm, im))
    # al: Fortran j=2..jm (js2g1..jn1g2 with jlast=jm: jn1g2=jm)
    for j in range(1, jm):
        for i in range(im):
            al[j, i] = 0.5 * (q[j - 1, i] + q[j, i]) + \
                r3 * (dm[j - 1, i] - dm[j, i])
    # ar: Fortran j=1..jm-1 (js1g1..jn2g1)
    for j in range(0, jm - 1):
        for i in range(im):
            ar[j, i] = al[j + 1, i]
    sgn = 1.0 if iv == 0 else -1.0
    for i in range(imh):
        al[0, i] = sgn * al[1, i + imh]
        al[0, i + imh] = sgn * al[1, i]
        ar[jm - 1, i] = sgn * ar[jm - 2, i + imh]
        ar[jm - 1, i + imh] = sgn * ar[jm - 2, i]
    if jord in (3, 5):
        for j in range(jm):
            for i in range(im):
                a6[j, i] = 3.0 * (q[j, i] + q[j, i] - (al[j, i] + ar[j, i]))
    lmt = jord - 3
    # reference flattens rows js1g1..jn1g1 = 1..jm into one lmppm call
    for j in range(jm):
        lmppm_oracle(dm[j], a6[j], ar[j], al[j], q[j], im, lmt)
    # flux: Fortran j=2..jm -> 0-based edge rows 1..jm-1
    for j in range(1, jm):
        for i in range(im):
            if c[j, i] > 0.0:
                flux[j, i] = ar[j - 1, i] + 0.5 * c[j, i] * (
                    al[j - 1, i] - ar[j - 1, i] +
                    a6[j - 1, i] * (1.0 - r23 * c[j, i]))
            else:
                flux[j, i] = al[j, i] - 0.5 * c[j, i] * (
                    ar[j, i] - al[j, i] +
                    a6[j, i] * (1.0 + r23 * c[j, i]))
    return flux


def ytp_oracle(q, c, yfx, jord: int, iv: int):
    """ytp (tp_core.F90:980-1076) for jfirst=1, jlast=jm. q/c/yfx 0-based
    (jm, im), c/yfx south-edge indexed (edge j = between rows j-1, j).
    Returns fy (jm, im), row 0 unset (=0)."""
    jm, im = q.shape
    fy = np.zeros_like(q)
    if jord == 1:
        # Fortran jt = int(j_F - c); 0-based donor row: e-1 (c>0) else e
        for j in range(1, jm):
            for i in range(im):
                jt = _int(float(j + 1) - c[j, i]) - 1
                fy[j, i] = q[jt, i]
    else:
        dm = ymist_oracle(q, jord, iv)
        if abs(jord) >= 3:
            fy = fyppm_oracle(c, q, dm, jord, iv)
        else:
            for j in range(1, jm):
                for i in range(im):
                    jt = _int(float(j + 1) - c[j, i]) - 1
                    fy[j, i] = q[jt, i] + \
                        (_sign(1.0, c[j, i]) - c[j, i]) * dm[jt, i]
    for j in range(1, jm):
        for i in range(im):
            fy[j, i] = fy[j, i] * yfx[j, i]
    return fy


def _xtp_slab(q, c, mfx, cosp, ffsl, iord, id_, rows=None):
    """Row loop over xtp_oracle; for ffsl rows with id_ != 0 pre-divides
    mfx by the Courant number (the reference caller's xfx = mfx/c
    convention that the repo's xtp applies internally)."""
    jm, im = q.shape
    fx = np.zeros_like(q)
    for j in (range(jm) if rows is None else rows):
        m = mfx[j]
        if ffsl[j] and id_ != 0:
            c_safe = np.where(np.abs(c[j]) < 1e-30,
                              np.where(c[j] < 0, -1e-30, 1e-30), c[j])
            m = mfx[j] / c_safe
        fx[j] = xtp_oracle(q[j], c[j], m, float(cosp[j]), bool(ffsl[j]),
                           iord, id_)
    return fx


def tp2d_oracle(va, q, crx, cry, iord: int, jord: int, xfx, yfx, cosp,
                ffsl, id_: int):
    """tp2d (tp_core.F90:163-276), full domain. All slabs (jm, im);
    cry/yfx south-edge indexed. Returns (fx, fy)."""
    jm, im = q.shape
    # inner advective x-op: first-order, id=0, mfx = crx (:228-243)
    wk1 = _xtp_slab(q, crx, crx, cosp, ffsl, 1, 0)
    adx = np.zeros_like(q)
    for j in range(jm):
        for i in range(im):
            ip = (i + 1) % im
            adx[j, i] = q[j, i] + 0.5 * (
                wk1[j, i] - wk1[j, ip] + q[j, i] * (crx[j, ip] - crx[j, i]))
    adx[0] = q[0]
    adx[jm - 1] = q[jm - 1]

    fy = ytp_oracle(adx, cry, yfx, jord, 0)

    # inner advective y-op (:260-265): jp = int(j_F - va) (|va| <= 1)
    ady = q.copy()
    for j in range(1, jm - 1):
        for i in range(im):
            jp = _int(float(j + 1) - va[j, i]) - 1
            ady[j, i] = q[j, i] + 0.5 * va[j, i] * (q[jp, i] - q[jp + 1, i])

    fx = _xtp_slab(ady, crx, xfx, cosp, ffsl, iord, id_,
                   rows=range(1, jm - 1))
    return fx, fy


def tp2c_oracle(va, h, crx, cry, iord: int, jord: int, xfx, yfx, cosp,
                acosp, rcap: float, ffsl):
    """tp2c (tp_core.F90:72-155), full domain, id=0. Returns (dh, fx, fy)."""
    jm, im = h.shape
    fx, fy = tp2d_oracle(va, h, crx, cry, iord, jord, xfx, yfx, cosp,
                         ffsl, 0)
    dh = np.zeros_like(h)
    for j in range(1, jm - 1):
        for i in range(im):
            ip = (i + 1) % im
            fy_n = fy[j + 1, i] if j + 1 < jm else 0.0
            dh[j, i] = fx[j, i] - fx[j, ip] + (fy[j, i] - fy_n) * acosp[j]
    dh[0, :] = -np.sum(fy[1, :]) * rcap
    dh[jm - 1, :] = np.sum(fy[jm - 1, :]) * rcap
    return dh, fx, fy


def ycc_oracle(q, vc, ymass, jord: int, iv: int):
    """ycc (tp_core.F90:1544-1704) for jfirst=1, jlast=jm. q/vc/ymass
    0-based (jm, im). NORTH-edge convention (unlike ytp): fy[j] is the flux
    between rows j and j+1, donor jt = int(j_F+1 - vc) (F), i.e. row j for
    vc>0 else row j+1. Rows 1..jm-2 set (F js2giv..jn2g0 = 2..jm-1 for the
    global domain, either iv). iv=0 scalar, iv=1 vector (pole sign flips)."""
    jm, im = q.shape
    im2 = im // 2
    fy = np.zeros_like(q)
    if jord == 1:
        for j in range(1, jm - 1):
            for i in range(im):
                jt = _int(float(j + 2) - vc[j, i]) - 1
                fy[j, i] = q[jt, i] * ymass[j, i]
        return fy

    dc = np.zeros_like(q)
    for j in range(2, jm - 1):                  # F js3giv..jn2g1 = 3..jm-1
        for i in range(im):
            dc[j, i] = 0.25 * (q[j + 1, i] - q[j - 1, i])
    if iv == 0:                                 # scalar poles (F :1624-1642)
        for i in range(im2):
            dc[1, i] = 0.25 * (q[2, i] - q[1, i + im2])
            dc[jm - 1, i] = 0.25 * (q[jm - 1, i + im2] - q[jm - 2, i])
        for i in range(im2, im):
            dc[1, i] = 0.25 * (q[2, i] - q[1, i - im2])
            dc[jm - 1, i] = 0.25 * (q[jm - 1, i - im2] - q[jm - 2, i])
    else:                                       # vector poles (F :1649-1667)
        for i in range(im2):
            dc[1, i] = 0.25 * (q[2, i] + q[1, i + im2])
            dc[jm - 1, i] = -0.25 * (q[jm - 2, i] + q[jm - 1, i + im2])
        for i in range(im2, im):
            dc[1, i] = 0.25 * (q[2, i] + q[1, i - im2])
            dc[jm - 1, i] = -0.25 * (q[jm - 2, i] + q[jm - 1, i - im2])
    if jord > 0:                                # monotonic (F :1671-1692)
        for j in range(2, jm - 1):
            for i in range(im):
                qmax = max(q[j - 1, i], q[j, i], q[j + 1, i]) - q[j, i]
                qmin = q[j, i] - min(q[j - 1, i], q[j, i], q[j + 1, i])
                dc[j, i] = _sign(min(abs(dc[j, i]), qmin, qmax), dc[j, i])
        dc[1, :] = 0.0
        dc[jm - 1, :] = 0.0
    for j in range(1, jm - 1):                  # F :1695-1700
        for i in range(im):
            jt = _int(float(j + 2) - vc[j, i]) - 1
            fy[j, i] = (q[jt, i] + (_sign(1.0, vc[j, i]) - vc[j, i])
                        * dc[jt, i]) * ymass[j, i]
    return fy


def tpcc_oracle(va, q, crx, cry, ymass, iord: int, jord: int, cose, ffsl):
    """tpcc (tp_core.F90:1396-1536) for jfirst=1, jlast=jm. All slabs
    0-based (jm, im); cry/ymass in ycc's north-edge convention; cose is the
    critical cosine per row (the C-grid xtp rows run at edge latitudes).
    Returns (fx, fy): fx rows 1..jm-1 set (F 2..jm), fy rows 1..jm-2.
    Mutates a COPY of q (the reference writes the SP mirror into q,
    F :1490-1498)."""
    jm, im = q.shape
    im2 = im // 2
    q = q.copy()
    # inner first-order advective x-op (F :1469-1485), rows F 2..jm
    wk1 = _xtp_slab(q, crx, crx, cose, ffsl, 1, 0, rows=range(1, jm))
    adx = np.zeros_like(q)
    for j in range(1, jm):
        for i in range(im):
            ip = (i + 1) % im
            adx[j, i] = q[j, i] + 0.5 * (
                wk1[j, i] - wk1[j, ip] + q[j, i] * (crx[j, ip] - crx[j, i]))
    fy = ycc_oracle(adx, cry, ymass, jord, 0)
    # scalar SP mirror into q row 1F (F :1490-1498)
    for i in range(im2):
        q[0, i] = q[1, i + im2]
    for i in range(im2, im):
        q[0, i] = q[1, i - im2]
    # NP advective row from va (F :1500-1515)
    fx1 = np.empty(im)
    for i in range(im2):
        fx1[i] = q[jm - 1, i + im2]
    for i in range(im2, im):
        fx1[i] = q[jm - 1, i - im2]
    for i in range(im):
        if va[jm - 1, i] > 0.0:
            adx[jm - 1, i] = q[jm - 1, i] + 0.5 * va[jm - 1, i] * (
                q[jm - 2, i] - q[jm - 1, i])
        else:
            adx[jm - 1, i] = q[jm - 1, i] + 0.5 * va[jm - 1, i] * (
                q[jm - 1, i] - fx1[i])
    # interior advective y-op (F :1517-1525): jp = int(j_F - va)
    for j in range(1, jm - 1):
        for i in range(im):
            jp = _int(float(j + 1) - va[j, i]) - 1
            adx[j, i] = q[j, i] + 0.5 * va[j, i] * (q[jp, i] - q[jp + 1, i])
    fx = _xtp_slab(adx, crx, crx, cose, ffsl, iord, 0, rows=range(1, jm))
    return fx, fy
