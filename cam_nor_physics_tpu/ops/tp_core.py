"""Lin-Rood flux-form semi-Lagrangian PPM transport operators (tp_core).

TPU-native re-implementation of /root/reference/fv/tp_core.F90 (2610 lines):
the 1-D/2-D FFSL PPM advection stencils of the FV dycore. Design notes
(SURVEY §2.3 P8, §7.1.3):

- The reference's `VECTORIZE` whole-slab variants (tp_core.F90:1707-2610) are
  the natural JAX formulation: every routine here is a whole-array op over
  (jm, im) lat-lon slabs; vmap over levels/tracers supplies the third axis.
- Fortran's explicit periodic ghost zones (arrays dimensioned -im/3:im+im/3,
  tp_core.F90:215-219) become modular index arithmetic: `jnp.roll` for fixed
  shifts, wrapped gathers for data-dependent (integer Courant) shifts.
- The FFSL integer-Courant summation loops (tp_core.F90:430-440) become an
  O(1) prefix-sum difference with explicit wrap handling.
- Latitude-dependent scheme switching (upwind/van Leer/PPM by cos φ,
  tp_core.F90:332-338) and the per-row `ffsl` flag become masks blended with
  `jnp.where` — all branches are computed, which is the TPU-friendly trade.

Array/axis conventions: slabs are (jm, im); j=0 is the SOUTH pole row,
j=jm-1 the north pole row; i wraps periodically. Edge-indexed x-arrays:
fx[..., i] = flux across the WEST edge of cell i. Edge-indexed y-arrays:
fy[e] = flux across the SOUTH edge of row e (valid e in [1, jm-1]).

Index mapping from the reference: Fortran (i,j) 1-based -> [j-1, i-1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

COS_UPW = 0.05   # critical cosine for upwind       (tp_core.F90:336)
COS_VAN = 0.10   # critical cosine for van Leer     (:337)
COS_PPM = 0.10   # critical cosine for PPM          (:338)
R3 = 1.0 / 3.0
R23 = 2.0 / 3.0


def _roll_static(a, shift: int, axis: int):
    """jnp.roll with a static shift as explicit slice+concat: jnp.roll
    lowers through dynamic_slice, which Mosaic (Pallas TPU) does not
    implement; the static form lowers everywhere and fuses identically."""
    axis = axis % a.ndim
    n = a.shape[axis]
    s = (-shift) % n
    if s == 0:
        return a
    lo = jax.lax.slice_in_dim(a, s, n, axis=axis)
    hi = jax.lax.slice_in_dim(a, 0, s, axis=axis)
    return jnp.concatenate([lo, hi], axis=axis)


def _rollx(a, shift):
    """Periodic shift along the x (last) axis; positive shift moves east->i+."""
    return _roll_static(a, shift, -1)


def wset_row(a, row: int, value, axis: int = -2):
    """a.at[row].set(value) along `axis`, expressed as elementwise where.

    Row updates via dynamic-update-slice on an axis that may be sharded
    miscompile in XLA's CPU SPMD partitioner (per-shard clipping in fused
    multi-output programs); the where-form partitions exactly. `value` must
    broadcast against `a` with the row axis of size 1 (scalars and (im,)
    vectors both work for axis=-2).
    """
    n = a.shape[axis]
    shape = [1] * a.ndim
    shape[axis] = n
    # reshape the int32 arange BEFORE comparing: reshaping the bool result
    # would be an i1 minor-dim insertion, which Mosaic (Pallas TPU) rejects
    mask = jnp.arange(n).reshape(shape) == (row % n)
    return jnp.where(mask, value, a)


def wset_interior(a, value, axis: int = -2):
    """a.at[1:-1].set(value) along `axis` as elementwise where; `value` has
    the same shape as `a` (already padded/rolled to full rows)."""
    n = a.shape[axis]
    shape = [1] * a.ndim
    shape[axis] = n
    idx = jnp.arange(n).reshape(shape)
    return jnp.where((idx >= 1) & (idx <= n - 2), value, a)


def _rolly(a, shift, axis: int = -2):
    """Shift along the y axis (non-periodic use: callers overwrite the rows
    that wrapped). Partitions to a collective permute under SPMD."""
    return _roll_static(a, shift, axis)


def _rollv(v, shift):
    """Roll a 1-D (im,) vector via a 2-D op: Mosaic (Pallas TPU) restricts
    1-D shuffles, so keep the roll two-dimensional."""
    return _roll_static(v[None, :], shift, -1)[0]


def _gatherx_rel(arrs, d, lo: int, hi: int):
    """out[t][..., i] = arrs[t][..., (i + d[..., i]) mod im] for integer
    offsets d in [lo, hi]: a select over static periodic rolls.

    The offsets in the FFSL path are donor distances bounded by the integer
    Courant number, so the gather is a short chain of roll+where that XLA
    fuses into one pass. The earlier one-hot-einsum form materialized a
    (km, jm, im, im) one-hot per index set — ~200 MB of HBM traffic per
    gather at FV resolution and the dominant cost of cd_core (measured
    3.5 GB/cd_step); this form is also Mosaic-clean (static slices only).
    All arrays share the index d (computed once per xtp call).
    """
    outs = [jnp.zeros_like(a) for a in arrs]
    for s in range(lo, hi + 1):
        m = d == s
        outs = [jnp.where(m, _rollx(a, -s), o) for a, o in zip(arrs, outs)]
    return outs


def _int_courant_sums(q, iu, K: int):
    """Whole-cell FFSL sums (tp_core.F90:430-440) as running-sum chains:

      pos[i] = sum_{n=1}^{iu}   q[i-n]   (donor cells for c >= 1)
      neg[i] = sum_{n=0}^{-iu-1} q[i+n]  (donor cells for c <= -1)

    selected at the per-element integer Courant iu in [-K, K]. Periodic by
    construction (static rolls); no prefix-sum matmul, no wrap bookkeeping.
    """
    run_p = jnp.zeros_like(q)
    acc_p = jnp.zeros_like(q)
    run_n = jnp.zeros_like(q)
    acc_n = jnp.zeros_like(q)
    for s in range(1, K + 1):
        run_p = run_p + _rollx(q, s)           # + q[i-s]
        acc_p = jnp.where(iu == s, run_p, acc_p)
        run_n = run_n + _rollx(q, -(s - 1))    # + q[i+s-1]
        acc_n = jnp.where(iu == -s, run_n, acc_n)
    return acc_p, acc_n


def xmist(q, id_: int):
    """4th-order x-slopes with optional Lin-et-al-1994 monotonic limiter
    (xmist, tp_core.F90:505-556). q is (..., im) periodic."""
    qp1, qm1 = _rollx(q, -1), _rollx(q, 1)
    if id_ <= 2:
        qp2, qm2 = _rollx(q, -2), _rollx(q, 2)
        dm = (1.0 / 24.0) * (8.0 * (qp1 - qm1) + qm2 - qp2)
    else:
        dm = 0.25 * (qp1 - qm1)
    if id_ < 0:
        return dm
    qmax = jnp.maximum(jnp.maximum(qm1, q), qp1) - q
    qmin = q - jnp.minimum(jnp.minimum(qm1, q), qp1)
    return jnp.sign(dm) * jnp.minimum(jnp.minimum(jnp.abs(dm), qmax), qmin)


def steepx(p, al, dm):
    """Yeh steepening of the left-edge value (steepx, tp_core.F90:693-759).
    All arrays (..., im) periodic; returns modified al."""
    dh = _rollx(p, -1) - p                       # dh[i] = p[i+1]-p[i]
    dhm = _rollx(dh, 1)                          # dh[i-1]
    d2 = dh - dhm                                # d2[i]
    d2p, d2m = _rollx(d2, -1), _rollx(d2, 1)
    pp1, pm1 = _rollx(p, -1), _rollx(p, 1)
    pp2, pm2 = _rollx(p, -2), _rollx(p, 2)
    denom = jnp.where(pp1 == pm1, 1.0, pp1 - pm1)
    xxx = 1.0 - 0.5 * (pp2 - pm2) / denom
    eta = jnp.where((d2p * d2m < 0.0) & (pp1 != pm1),
                    jnp.clip(xxx, 0.0, 0.5), 0.0)
    etam = _rollx(eta, 1)
    dmm = _rollx(dm, 1)
    bbb = (2.0 * eta - etam) * dmm
    ccc = (2.0 * etam - eta) * dm
    return al + 0.5 * (etam - eta) * dhm + (bbb - ccc) * R3


def lmppm(dm, a6, ar, al, p, lmt: int):
    """PPM monotonicity constraints (lmppm, tp_core.F90:767-877).

    lmt = 0 full, 1 improved full, 2 positive-definite, 3 quasi-monotone.
    Returns (a6, ar, al).
    """
    if lmt == 0:
        da1 = ar - al
        da2 = da1 ** 2
        a6da = a6 * da1
        a6_lo = 3.0 * (al - p)
        ar_lo = al - a6_lo
        a6_hi = 3.0 * (ar - p)
        al_hi = ar - a6_hi
        lo = a6da < -da2
        hi = a6da > da2
        zero = dm == 0.0
        a6n = jnp.where(zero, 0.0, jnp.where(lo, a6_lo, jnp.where(hi, a6_hi, a6)))
        arn = jnp.where(zero, p, jnp.where(lo, ar_lo, ar))
        aln = jnp.where(zero, p, jnp.where(hi, al_hi, al))
        return a6n, arn, aln
    if lmt == 1:
        da1 = dm + dm
        dl = jnp.sign(da1) * jnp.minimum(jnp.abs(da1), jnp.abs(al - p))
        dr = jnp.sign(da1) * jnp.minimum(jnp.abs(da1), jnp.abs(ar - p))
        return 3.0 * (dl - dr), p + dr, p - dl
    if lmt == 2:
        skip = jnp.abs(ar - al) >= -a6
        fmin = p + 0.25 * (ar - al) ** 2 / jnp.where(a6 == 0, 1e-30, a6) + \
            a6 * (1.0 / 12.0)
        skip = skip | (fmin >= 0.0)
        both = (p < ar) & (p < al)
        rgt = ar > al
        a6_b, ar_b, al_b = jnp.zeros_like(p), p, p
        a6_r = 3.0 * (al - p)
        ar_r = al - a6_r
        a6_l = 3.0 * (ar - p)
        al_l = ar - a6_l
        a6n = jnp.where(both, a6_b, jnp.where(rgt, a6_r, a6_l))
        arn = jnp.where(both, ar_b, jnp.where(rgt, ar_r, ar))
        aln = jnp.where(both, al_b, jnp.where(rgt, al, al_l))
        return (jnp.where(skip, a6, a6n), jnp.where(skip, ar, arn),
                jnp.where(skip, al, aln))
    if lmt == 3:
        da1 = 4.0 * dm
        dl = jnp.sign(da1) * jnp.minimum(jnp.abs(da1), jnp.abs(al - p))
        dr = jnp.sign(da1) * jnp.minimum(jnp.abs(da1), jnp.abs(ar - p))
        return 3.0 * (dl - dr), p + dr, p - dl
    return a6, ar, al  # lmt > 3: no constraint (e.g. iord=7 handled by huynh)


def huynh(ar, al, p):
    """Huynh's 2nd monotonicity constraint on a periodic row
    (huynh, tp_core.F90:885-971). Returns (a6, ar, al)."""
    d1 = p - _rollx(p, 1)            # d1[i] = p[i]-p[i-1]
    d2 = _rollx(d1, -1) - d1         # d2[i] = d1[i+1]-d1[i]
    d2m = _rollx(d2, 1)              # d2[i-1]
    pmp_r = p + 2.0 * d1
    lac_r = p + 0.5 * (d1 + d2m) + d2m
    pmin = jnp.minimum(jnp.minimum(p, pmp_r), lac_r)
    pmax = jnp.maximum(jnp.maximum(p, pmp_r), lac_r)
    ar = jnp.minimum(pmax, jnp.maximum(ar, pmin))
    d1p = _rollx(d1, -1)             # d1[i+1]
    d2p = _rollx(d2, -1)             # d2[i+1]
    pmp_l = p - 2.0 * d1p
    lac_l = p + 0.5 * (d2p - d1p) + d2p
    pmin = jnp.minimum(jnp.minimum(p, pmp_l), lac_l)
    pmax = jnp.maximum(jnp.maximum(p, pmp_l), lac_l)
    al = jnp.minimum(pmax, jnp.maximum(al, pmin))
    return 3.0 * (p + p - (al + ar)), ar, al


def _ppm_edges(p, dm, iord: int):
    """PPM edge reconstruction al/ar/a6 on a periodic row
    (fxppm head, tp_core.F90:615-636)."""
    al = 0.5 * (_rollx(p, 1) + p) + (_rollx(dm, 1) - dm) * R3
    if iord == 6:
        al = steepx(p, al, dm)
    ar = _rollx(al, -1)
    if iord == 7:
        a6, ar, al = huynh(ar, al, p)
    else:
        a6 = 3.0 * (p + p - (al + ar)) if iord in (3, 5) else jnp.zeros_like(p)
        a6, ar, al = lmppm(dm, a6, ar, al, p, iord - 3)
    return al, ar, a6


def ffsl_band(jm: int, dl: float, dt: float, umax: float = 320.0):
    """Static rows-per-pole envelope where |c| = u·dt/(a·cosφ·dl) can reach
    1 under the umax wind guard (cd_core's umax=300 m/s + margin). Rows
    equatorward of the band can never take the FFSL branch, so xtp can run
    the (dominant) FFSL roll+select chains on the polar sub-slab only.
    Returns None when the band covers the whole slab (no saving)."""
    import math

    import numpy as np
    rearth = 6.37122e6
    dp = math.pi / (jm - 1)
    lat = -0.5 * math.pi + dp * np.arange(jm)
    thresh = umax * dt / (rearth * dl)
    need = np.cos(lat) < thresh
    nb = int(need[: jm // 2].sum()) + 1     # +1 safety row
    nb = max(nb, 2)
    if 2 * nb >= jm:
        return None
    return nb


def xtp(q, c, mfx, cosa, ffsl, iord: int, id_: int, max_cfl_int: int = None,
        band: int | None = None):
    """E-W flux (xtpv, tp_core.F90:285-497), whole-slab.

    q, c, mfx: (jm, im); cosa, ffsl: (jm,) row properties (cosine of latitude
    and flux-form-semi-Lagrangian flag). Returns fx (jm, im) = flux across the
    west edge of cell i. id_=0: density (mfx = Courant); id_=1: mixing ratio
    (fx multiplied by mass flux mfx).

    max_cfl_int bounds the integer Courant handled exactly by the FFSL
    branch (default min(im//3, 15); the reference's ghost zones cap at im/3,
    tp_core.F90:215-219, and physical |c| at the last unfiltered row stays
    well under 10 even in polar-vortex transients). Donor distances are
    clamped into the bound, so an out-of-range event degrades to a
    nearer-donor flux instead of garbage.
    """
    jm, im = q.shape
    cosa = cosa[:, None]
    # expand the row flag via a float reshape + compare: Mosaic cannot
    # insert a minor dim on i1 (bool) vectors
    ffsl = jnp.asarray(ffsl, q.dtype)[:, None] > 0.5
    if max_cfl_int is None:
        max_cfl_int = min(im // 3, 15)

    # ---------- regular (Eulerian) branch, |c| < 1 ----------
    # Fortran's 1-based iu = int(i_F - c) maps to the 0-based donor
    # floor(i0 - c), which for |c| < 1 is just {i-1 (c>0), i (c<=0)}: a
    # two-point select of static rolls, not a gather (donor distance is
    # bounded by the CFL condition; the FFSL branch below handles |c| >= 1)
    up = c > 0.0

    def sel_reg(a):
        return jnp.where(up, _rollx(a, 1), a)

    fx_upw = mfx * sel_reg(q)

    if iord == 1:
        # static fast path (the C-grid half-step transport): pure upwind,
        # no slope/PPM construction
        fx_reg = fx_upw
    else:
        if iord > 0:
            dm4 = xmist(q, 2)                     # tp_core.F90:464-468
        else:
            # negative iord: limited slope only on rows below the van Leer
            # angle (the reference's per-row xmist(.., 2) dispatch)
            dm4 = jnp.where(cosa < COS_VAN, xmist(q, 2), xmist(q, iord))
        fx_van = mfx * (sel_reg(q) + sel_reg(dm4) * (jnp.sign(c) - c))

        al, ar, a6 = _ppm_edges(q, dm4, iord)
        alm = _rollx(al, 1)
        arm = _rollx(ar, 1)
        a6m = _rollx(a6, 1)
        fx_ppm_pos = arm + 0.5 * c * (alm - arm + a6m * (1.0 - R23 * c))
        fx_ppm_neg = al - 0.5 * c * (ar - al + a6 * (1.0 + R23 * c))
        fx_ppm = mfx * jnp.where(c > 0.0, fx_ppm_pos, fx_ppm_neg)

        upwind_row = cosa < COS_UPW
        vanleer_row = (abs(iord) == 2) | (cosa < COS_VAN)
        fx_reg = jnp.where(upwind_row, fx_upw,
                           jnp.where(vanleer_row, fx_van, fx_ppm))

    # ---------- FFSL branch (|c| may exceed 1; periodic wrap) ----------
    # With a static `band` (rows per pole that can physically reach
    # |c| >= 1 given the umax guard — see ffsl_band), the roll+select
    # chains run on the polar sub-slab only: they are the dominant op
    # count of xtp, and |c| >= 1 equatorward of the band would require
    # winds beyond the dycore's umax bound (such a state is already
    # broken; it falls back to the Eulerian branch there). `band` is
    # either an int (rows per pole, both sides) or a (south, north) tuple
    # — j-banded callers pass per-side counts for the slab edges they own;
    # (0, 0) / 0 skips the FFSL machinery entirely.
    if band is not None:
        nbs, nbn = (band, band) if isinstance(band, int) else band
        if nbs + nbn == 0:
            return fx_reg
        if nbs + nbn < jm:
            def bandsel(a):
                parts = ([a[:nbs]] if nbs else []) + \
                    ([a[jm - nbn:]] if nbn else [])
                return jnp.concatenate(parts, axis=0) if len(parts) > 1 \
                    else parts[0]

            fxb = _xtp_ffsl(bandsel(q), bandsel(c), bandsel(mfx),
                            bandsel(cosa), iord, id_, K=max_cfl_int)
            mid = jnp.zeros((jm - nbs - nbn,) + q.shape[1:], q.dtype)
            # avoid zero-size slices (Mosaic rejects 0-extent vectors)
            parts = ([fxb[:nbs]] if nbs else []) + [mid] + \
                ([fxb[nbs:]] if nbn else [])
            fx_ffsl = jnp.concatenate(parts, axis=0) if len(parts) > 1 \
                else parts[0]
            rowi = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)
            ffsl = ffsl & ((rowi < nbs) | (rowi >= jm - nbn))
        else:
            fx_ffsl = _xtp_ffsl(q, c, mfx, cosa, iord, id_, K=max_cfl_int)
    else:
        fx_ffsl = _xtp_ffsl(q, c, mfx, cosa, iord, id_, K=max_cfl_int)

    return jnp.where(ffsl, fx_ffsl, fx_reg)


def _xtp_ffsl(q, c, mfx, cosa, iord: int, id_: int, K: int):
    """FFSL E-W flux (the |c| >= 1 machinery of xtp) on a row sub-slab."""
    iu = jnp.clip(jnp.trunc(c).astype(jnp.int32), -K, K)
    rut = c - iu
    # fractional-donor offset relative to i: cell i-iu-1 (c>0) or i-iu (c<=0)
    d = jnp.where(c > 0.0, -iu - 1, -iu)

    if iord == 1:
        (qg,) = _gatherx_rel([q], d, -K - 1, K)
        f_frac = rut * qg              # static upwind fast path
    else:
        # 2nd-order slope for the FFSL branch (tp_core.F90:392-398)
        qp1, qm1 = _rollx(q, -1), _rollx(q, 1)
        tmp = 0.25 * (qp1 - qm1)
        qmax = jnp.maximum(jnp.maximum(qm1, q), qp1) - q
        qmin = q - jnp.minimum(jnp.minimum(qm1, q), qp1)
        dm2 = jnp.sign(tmp) * jnp.minimum(
            jnp.minimum(jnp.abs(tmp), qmax), qmin)

        alf, arf, a6f = _ppm_edges(q, dm2, iord)
        # one fused shift-select serves all five donor lookups (shared d)
        qg, dmg, alg, arg, a6g = _gatherx_rel([q, dm2, alf, arf, a6f],
                                              d, -K - 1, K)
        f_upw = rut * qg
        f_van = jnp.where(c > 0.0,
                          rut * (qg + dmg * (1.0 - rut)),
                          rut * (qg - dmg * (1.0 + rut)))
        f_ppm = jnp.where(
            c > 0.0,
            rut * (arg + 0.5 * rut * (alg - arg + a6g * (1.0 - R23 * rut))),
            rut * (alg - 0.5 * rut * (arg - alg + a6g * (1.0 + R23 * rut))))

        ffsl_upw = cosa < COS_UPW
        ffsl_ppm = (iord >= 3) & (cosa > COS_PPM)
        f_frac = jnp.where(ffsl_upw, f_upw,
                           jnp.where(ffsl_ppm, f_ppm, f_van))

    # integer-Courant whole-cell sums (tp_core.F90:430-440)
    sum_pos, sum_neg = _int_courant_sums(q, iu, K)
    f_int = jnp.where(c >= 1.0, sum_pos, jnp.where(c <= -1.0, -sum_neg, 0.0))

    fx_ffsl = f_frac + f_int
    if id_ != 0:
        # The FFSL sum is in Courant units (cells swept); the reference
        # multiplies it by a mass flux that the CALLER has pre-divided by
        # the Courant number for ffsl rows (upstream trac2d/cd_core:
        # xfx = mfx/sign(max(|cx|,tiny),cx)). Do that division here so
        # every caller gets the correct |c|>1 flux: without it the flux is
        # overestimated by a factor |c| — measured to drive a runaway at
        # the near-pole rows (|c| 3-8 in transient polar vortex events)
        # that destroyed every >10-day HS run regardless of filtering.
        c_safe = jnp.sign(c) * jnp.maximum(jnp.abs(c), 1e-30)
        fx_ffsl = fx_ffsl * (mfx / c_safe)
    return fx_ffsl


def ymist(q, jord: int, iv: int):
    """N-S slopes with pole mirroring (ymist, tp_core.F90:1084-1214).

    q: (jm, im). iv=0 scalar, iv=1 vector (sign flip across the pole).
    Returns dm (jm, im). Row updates are where-forms (see wset_row).
    """
    jm, im = q.shape
    im2 = im // 2
    # interior: dm[j] = 0.25 (q[j+1]-q[j-1])
    dm_int = wset_interior(jnp.zeros_like(q),
                           0.25 * (_rolly(q, -1) - _rolly(q, 1)))

    # explicit positive row indices: negative indexing lowers through
    # dynamic_slice, which Mosaic (Pallas TPU) does not implement
    q_n1, q_n2 = q[jm - 1, :], q[jm - 2, :]
    qs_mir = _rollv(q[1, :], -im2)              # q(i+im2, row 1)
    qn_mir = _rollv(q_n2, -im2)                 # q(i+im2, row jm-2)

    if iv == 0:
        tmp_s = 0.25 * (q[1, :] - qs_mir)
        qmax_s = jnp.maximum(jnp.maximum(q[1, :], q[0, :]), qs_mir) - q[0, :]
        qmin_s = q[0, :] - jnp.minimum(jnp.minimum(q[1, :], q[0, :]), qs_mir)
        tmp_n = 0.25 * (qn_mir - q_n2)
        qmax_n = jnp.maximum(jnp.maximum(qn_mir, q_n1), q_n2) - q_n1
        qmin_n = q_n1 - jnp.minimum(jnp.minimum(qn_mir, q_n1), q_n2)
        mirror_sign = -1.0
    else:
        tmp_s = 0.25 * (q[1, :] + qs_mir)
        qmax_s = jnp.maximum(jnp.maximum(q[1, :], q[0, :]), -qs_mir) - q[0, :]
        qmin_s = q[0, :] - jnp.minimum(jnp.minimum(q[1, :], q[0, :]), -qs_mir)
        tmp_n = -0.25 * (qn_mir + q_n2)
        qmax_n = jnp.maximum(jnp.maximum(-qn_mir, q_n1), q_n2) - q_n1
        qmin_n = q_n1 - jnp.minimum(jnp.minimum(-qn_mir, q_n1), q_n2)
        mirror_sign = 1.0

    dm_s = jnp.sign(tmp_s) * jnp.minimum(jnp.minimum(jnp.abs(tmp_s), qmax_s),
                                         qmin_s)
    dm_n = jnp.sign(tmp_n) * jnp.minimum(jnp.minimum(jnp.abs(tmp_n), qmax_n),
                                         qmin_n)
    # second half of each pole row mirrors the first (tp_core.F90:1149-1151)
    half = jnp.arange(im) >= im2
    dm_s = jnp.where(half, mirror_sign * _rollv(dm_s, im2), dm_s)
    dm_n = jnp.where(half, mirror_sign * _rollv(dm_n, im2), dm_n)

    dm = wset_row(wset_row(dm_int, 0, dm_s), -1, dm_n)

    if jord > 0:
        # monotonic constraint on interior rows (tp_core.F90:1200-1211)
        qm, qp = _rolly(q, 1), _rolly(q, -1)
        qmax = jnp.maximum(jnp.maximum(qm, q), qp) - q
        qmin = q - jnp.minimum(jnp.minimum(qm, q), qp)
        lim = jnp.sign(dm) * jnp.minimum(jnp.minimum(jnp.abs(dm), qmin), qmax)
        dm = wset_interior(dm, lim)
    return dm


def fyppm(c, q, dm, jord: int, iv: int):
    """N-S PPM flux (fyppm, tp_core.F90:1222-1388).

    y-edge convention: c is (jm, im), row e = Courant across the SOUTH edge
    of row e (valid e in [1, jm-1]; row 0 ignored). Returns flux (jm, im)
    with the same convention and row 0 zeroed. The north polar edge (old
    edge jm) carries no flux and has no slot — callers use
    `edge_north`-style shifts to form divergences.
    """
    jm, im = q.shape
    im2 = im // 2

    # al[j] = 0.5 (q[j-1]+q[j]) + (dm[j-1]-dm[j])/3, cell-indexed south edge
    al_full = 0.5 * (_rolly(q, 1) + q) + R3 * (_rolly(dm, 1) - dm)
    # pole mirroring (tp_core.F90:1312-1344)
    sgn = 1.0 if iv == 0 else -1.0
    al = wset_row(al_full, 0, sgn * _rollv(al_full[1, :], -im2))
    ar = _rolly(al, -1)                               # ar[j] = al[j+1]
    ar = wset_row(ar, -1, sgn * _rollv(al[jm - 1, :], -im2))

    if jord in (3, 5):
        a6 = 3.0 * (q + q - (al + ar))
    else:
        a6 = jnp.zeros_like(q)
    a6, ar, al = lmppm(dm, a6, ar, al, q, jord - 3)

    # flux at edge e from cell e-1 (c>0) or cell e (c<0)
    flux_pos = _rolly(ar, 1) + 0.5 * c * (_rolly(al, 1) - _rolly(ar, 1) +
                                          _rolly(a6, 1) * (1.0 - R23 * c))
    flux_neg = al - 0.5 * c * (ar - al + a6 * (1.0 + R23 * c))
    fe = jnp.where(c > 0.0, flux_pos, flux_neg)
    return wset_row(fe, 0, 0.0)


def ytp(q, c, ymass, jord: int, iv: int):
    """N-S flux (ytp, tp_core.F90:980-1076).

    q: (jm, im); c, ymass: (jm, im) south-edge indexed (see fyppm). Returns
    fy (jm, im) south-edge fluxes, row 0 zeroed.
    """
    jm, im = q.shape
    # upwind two-point select: edge e flux donor is row e-1 (c>0) or row e.
    # |c|<=1 is a scheme requirement (y transport is CFL-limited; the
    # reference's ytp makes the same assumption). Expressed as a select of
    # static shifts, NOT take_along_axis: dynamic gathers along a sharded
    # axis miscompile under the SPMD partitioner (per-shard index clipping).
    up = c > 0.0
    q_dn = _rolly(q, 1)                          # row e-1 at edge e

    if jord == 1:
        fe = jnp.where(up, q_dn, q)
    else:
        dm = ymist(q, jord, iv)
        if abs(jord) >= 3:
            return fyppm(c, q, dm, jord, iv) * ymass
        fe = jnp.where(up, q_dn, q) + \
            (jnp.sign(c) - c) * jnp.where(up, _rolly(dm, 1), dm)

    return wset_row(fe * ymass, 0, 0.0)


def edge_north(fy):
    """South-edge array -> north-edge array: out[j] = fy[j+1], with the
    polar north edge (no flux) zeroed. fy: (..., jm, im)."""
    return wset_row(_rolly(fy, -1), -1, 0.0)


def ycc(q, vc, ymass, jord: int, iv: int):
    """C-grid N-S flux (ycc, tp_core.F90:1544-1704).

    NORTH-edge convention (unlike ytp): fy[j] is the flux between rows j
    and j+1, donor row j (vc>0) or j+1 (vc<=0); vc/ymass share the
    convention. The slope limiter is van Leer mismatch for every jord != 1
    (ycc has no PPM branch), with pole-row dc from cross-pole mirrors —
    zeroed again when jord > 0 (monotonic). Rows 1..jm-2 of fy are set.
    iv=0 scalar (used by tpcc), iv=1 vector (cd_core's C-grid vort flux).
    """
    jm, im = q.shape
    im2 = im // 2
    rows = jnp.arange(jm)[:, None]
    up = vc > 0.0
    q_up = wset_row(_rolly(q, -1), -1, q)           # row j+1

    if jord == 1:
        fe = jnp.where(up, q, q_up)
        return jnp.where((rows >= 1) & (rows <= jm - 2), fe * ymass, 0.0)

    # van Leer mismatch, interior rows 2..jm-2 (F js3giv..jn2g1 = 3..jm-1)
    dc = jnp.where((rows >= 2) & (rows <= jm - 2),
                   0.25 * (_rolly(q, -1) - _rolly(q, 1)),
                   jnp.zeros_like(q))
    if iv == 0:                                     # scalar poles (:1624)
        dc_s = 0.25 * (q[2, :] - _rollv(q[1, :], -im2))
        dc_n = 0.25 * (_rollv(q[jm - 1, :], -im2) - q[jm - 2, :])
    else:                                           # vector poles (:1649)
        dc_s = 0.25 * (q[2, :] + _rollv(q[1, :], -im2))
        dc_n = -0.25 * (q[jm - 2, :] + _rollv(q[jm - 1, :], -im2))
    dc = wset_row(wset_row(dc, 1, dc_s), jm - 1, dc_n)
    if jord > 0:                                    # monotonic (:1671-1692)
        qm, qp = _rolly(q, 1), _rolly(q, -1)
        qmax = jnp.maximum(jnp.maximum(qm, q), qp) - q
        qmin = q - jnp.minimum(jnp.minimum(qm, q), qp)
        lim = jnp.sign(dc) * jnp.minimum(jnp.minimum(jnp.abs(dc), qmin),
                                         qmax)
        dc = jnp.where((rows >= 2) & (rows <= jm - 2), lim, dc)
        dc = wset_row(wset_row(dc, 1, 0.0), jm - 1, 0.0)

    dc_up = wset_row(_rolly(dc, -1), -1, dc)        # dc[j+1]
    slope = jnp.sign(vc) - vc
    fe = jnp.where(up, q + slope * dc, q_up + slope * dc_up)
    return jnp.where((rows >= 1) & (rows <= jm - 2), fe * ymass, 0.0)


def tpcc(va, q, crx, cry, ymass, iord: int, jord: int, cose, ffsl,
         band: int | None = None):
    """C-grid 2-D transport fluxes (tpcc, tp_core.F90:1396-1536).

    The C-grid counterpart of tp2d, consumed by the reference cd_core's
    c_sw half step for pt: inner first-order advective x-op, ycc (van
    Leer, north-edge) for fy, then the advective y-op — with the scalar
    cross-pole mirror written into q's south row and the va-upwinded
    north-pole row (:1490-1515) — and the outer xtp at `iord` for fx.
    va: (jm, im) cell-center advective y-Courant; crx ghost-free (jm, im);
    cry/ymass in ycc's north-edge convention; cose: (jm,) critical cosine
    at the xtp rows. Returns (fx, fy); fx rows 1..jm-1 and fy rows
    1..jm-2 are meaningful (row 0 zeroed).
    """
    jm, im = q.shape
    im2 = im // 2
    rows = jnp.arange(jm)[:, None]

    # inner first-order advective x-op (:1469-1485)
    wk1 = xtp(q, crx, crx, cose, ffsl, 1, 0, band=band)
    adx = q + 0.5 * (wk1 - _rollx(wk1, -1) + q * (_rollx(crx, -1) - crx))
    adx = wset_row(adx, 0, q)
    fy = ycc(adx, cry, ymass, jord, 0)

    # scalar SP mirror into the south row (:1490-1498)
    q2 = wset_row(q, 0, _rollv(q[1, :], -im2))
    # NP advective row from va (:1500-1515)
    fx1 = _rollv(q2[jm - 1, :], -im2)
    ad_n = jnp.where(va[jm - 1, :] > 0.0,
                     q2[jm - 1] + 0.5 * va[jm - 1] * (q2[jm - 2] -
                                                      q2[jm - 1]),
                     q2[jm - 1] + 0.5 * va[jm - 1] * (q2[jm - 1] - fx1))
    # interior advective y-op (:1517-1525): jp = j-1 (va>0) else j
    q_m = wset_row(_rolly(q2, 1), 0, q2[0])
    q_p = wset_row(_rolly(q2, -1), -1, q2[jm - 1])
    ady = q2 + 0.5 * va * jnp.where(va > 0.0, q_m - q2, q2 - q_p)
    ady = wset_row(wset_row(ady, jm - 1, ad_n), 0, q2[0])

    fx = xtp(ady, crx, crx, cose, ffsl, iord, 0, band=band)
    fx = jnp.where(rows >= 1, fx, 0.0)
    return fx, fy


def tp2d(va, q, crx, cry, iord: int, jord: int, xfx, yfx, cosp, ffsl,
         id_: int, band: int | None = None):
    """2-D transport on the D grid (tp2d, tp_core.F90:163-276).

    va: (jm, im) advective y-Courant at cell centers; q: (jm, im);
    crx: (jm, im) x-Courant; cry, yfx: (jm, im) south-edge y-Courant and
    background y-mass-flux (row 0 unused); xfx: (jm, im) x mass flux;
    cosp: (jm,) cos(lat); ffsl: (jm,) bool. Returns (fx, fy) with fy in the
    (jm, im) south-edge convention.
    """
    jm, im = q.shape

    # inner advective x-operator (first-order) -> adx (tp_core.F90:228-243)
    wk1 = xtp(q, crx, crx, cosp, ffsl, 1, 0, band=band)
    wk1_e = _rollx(wk1, -1)          # wk1[i+1]
    crx_e = _rollx(crx, -1)
    adx = q + 0.5 * (wk1 - wk1_e + q * (crx_e - crx))
    # poles: adx = q (tp_core.F90:247-256)
    adx = wset_row(wset_row(adx, 0, q), -1, q)

    fy = ytp(adx, cry, yfx, jord, 0)

    # inner advective y-operator (tp_core.F90:260-265):
    # wk1[j] = q[j] + 0.5 va (q[jp] - q[jp+1]); Fortran jp = int(j_F - va),
    # i.e. jp = j-1 for va>0 else j given |va|<=1 (y CFL limit). Written as
    # a select of static shifts — dynamic gathers along the (shardable) y
    # axis miscompile under the SPMD partitioner.
    q_m = wset_row(_rolly(q, 1), 0, q)       # q[j-1], row 0 -> q[0]
    q_p = wset_row(_rolly(q, -1), -1, q)     # q[j+1], row jm-1 -> q[jm-1]
    ady = q + 0.5 * va * jnp.where(va > 0.0, q_m - q, q - q_p)
    # rows 0 and jm-1 are overwritten by the polar-cap update in tp2c; the
    # reference leaves them at q via loop bounds js2g0/jn2g0
    ady = wset_row(wset_row(ady, 0, q), -1, q)

    fx = xtp(ady, crx, xfx, cosp, ffsl, iord, id_, band=band)
    return fx, fy


def tp2c(va, h, crx, cry, iord: int, jord: int, xfx, yfx, cosp, acosp, rcap,
         ffsl, band: int | None = None):
    """C-grid transport + flux divergence with polar-cap closure
    (tp2c, tp_core.F90:72-155).

    Returns (dh, fx, fy): dh = fx[i]-fx[i+1] + (fy[j]-fy[j+1])*acosp, with
    the polar rows replaced by the cap-mean of the meridional flux. fy in the
    (jm, im) south-edge convention.
    """
    jm, im = h.shape
    fx, fy = tp2d(va, h, crx, cry, iord, jord, xfx, yfx, cosp, ffsl, 0,
                  band=band)
    dh = fx - _rollx(fx, -1) + (fy - edge_north(fy)) * acosp[:, None]
    # polar caps (tp_core.F90:130-152)
    s_sum = -jnp.sum(fy[1, :]) * rcap
    n_sum = jnp.sum(fy[jm - 1, :]) * rcap
    dh = wset_row(wset_row(dh, 0, s_sum), -1, n_sum)
    return dh, fx, fy
