"""Conservative vertical PPM remapping (the kernel of te_map).

The reference's `te_map` (upstream; contract at /root/reference/fv/dyn_comp.F90:79,
2699-2740) remaps u, v, pt, tracers, and total energy from deformed Lagrangian
surfaces back to the reference hybrid coordinate with monotonic PPM of order
`kord`. The Fortran implementation (mappm) loops per column over overlapping
cells; here the remap is formulated through the *cumulative mass function*:

    M(p) = ∫_{ptop}^{p} q dp  of the piecewise-parabolic reconstruction,

evaluated at every target interface with a vectorized searchsorted + partial
parabola integral. Target cell means are then (M(pe_tgt[k+1]) - M(pe_tgt[k]))
/ dpe_tgt[k] — conservative by construction (telescoping), monotone whenever
the reconstruction is monotone, and fully batched over columns.

Shapes: pe_* are (ncol, km+1) monotone increasing interface pressures sharing
the same first and last values per column; q is (ncol, km) cell means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ppm_edges_nonuniform(q, dp, kord: int):
    """PPM edge values (al, ar, a6) on a non-uniform grid, with the same
    limiter family as tp_core (kord-3 -> lmppm lmt semantics).

    Uniform-weight 4th-order edge interpolation is replaced by the standard
    non-uniform formula; end cells use one-sided (piecewise-constant-safe)
    estimates.
    """
    ncol, km = q.shape
    # slope (van Leer limited, non-uniform-safe): average of one-sided diffs
    dq_lo = q[:, 1:] - q[:, :-1]                       # (km-1)
    dqc = jnp.zeros_like(q)
    dqc = dqc.at[:, 1:-1].set(0.5 * (dq_lo[:, 1:] + dq_lo[:, :-1]))
    # monotonic slope limit
    qmax = jnp.zeros_like(q)
    qmin = jnp.zeros_like(q)
    qmax = qmax.at[:, 1:-1].set(
        jnp.maximum(jnp.maximum(q[:, :-2], q[:, 1:-1]), q[:, 2:]) - q[:, 1:-1])
    qmin = qmin.at[:, 1:-1].set(
        q[:, 1:-1] - jnp.minimum(jnp.minimum(q[:, :-2], q[:, 1:-1]), q[:, 2:]))
    dm = jnp.sign(dqc) * jnp.minimum(jnp.minimum(jnp.abs(dqc), qmax), qmin)

    # interior edge values: weighted mean + slope correction (PPM eq. 1.6
    # reduced to the dp-weighted 2-cell form)
    w_hi = dp[:, :-1] / (dp[:, :-1] + dp[:, 1:])
    edge = q[:, :-1] + w_hi * (q[:, 1:] - q[:, :-1]) + \
        (dm[:, :-1] - dm[:, 1:]) / 3.0
    al = jnp.concatenate([q[:, :1], edge], axis=1)          # south/top edge
    ar = jnp.concatenate([edge, q[:, -1:]], axis=1)         # bottom edge

    if kord <= 2:
        # piecewise linear: a6 = 0, edges from limited slope
        al = q - dm
        ar = q + dm
        a6 = jnp.zeros_like(q)
        return al, ar, a6

    a6 = 3.0 * (q + q - (al + ar))
    # monotonic constraint (lmppm lmt=kord-3; default kord=4 -> lmt=1)
    lmt = kord - 3
    if lmt == 0:
        da1 = ar - al
        da2 = da1 ** 2
        a6da = a6 * da1
        lo = a6da < -da2
        hi = a6da > da2
        zero = dm == 0.0
        a6_lo = 3.0 * (al - q)
        ar_lo = al - a6_lo
        a6_hi = 3.0 * (ar - q)
        al_hi = ar - a6_hi
        a6 = jnp.where(zero, 0.0, jnp.where(lo, a6_lo, jnp.where(hi, a6_hi, a6)))
        ar = jnp.where(zero, q, jnp.where(lo, ar_lo, ar))
        al = jnp.where(zero, q, jnp.where(hi, al_hi, al))
    else:  # lmt >= 1: improved full constraint (tp_core lmppm lmt=1)
        da1 = dm + dm
        dl = jnp.sign(da1) * jnp.minimum(jnp.abs(da1), jnp.abs(al - q))
        dr = jnp.sign(da1) * jnp.minimum(jnp.abs(da1), jnp.abs(ar - q))
        ar = q + dr
        al = q - dl
        a6 = 3.0 * (dl - dr)
    return al, ar, a6


def _mass_at_dense(pe_src, dp, al, delta, a6, pe_tgt):
    """Cumulative PPM mass M(x) at target interfaces, densely over cells.

    Every source cell contributes dp_k * P(s_k) with
    s_k = clip((x - pe_k)/dp_k, 0, 1) and P the parabola's partial integral:
    P(0)=0 (cell entirely below x contributes nothing), P(1)=q̄_k (cell
    entirely above contributes its full mass) — so summing over ALL cells
    needs no containing-cell search. On TPU this is one fused elementwise +
    reduce over the small (n_tgt, km) plane per column: no hardware gathers
    and no (n×km)@(km) one-hot GEMVs (tiny-matmul MXU shapes measured ~10×
    slower than this form at te_map's geometry).

    al/delta/a6 may carry a leading field axis (..., ncol, km); pe_tgt is
    (ncol, n). Returns (..., ncol, n).
    """
    s = (pe_tgt[:, :, None] - pe_src[:, None, :-1]) / \
        jnp.where(dp == 0, 1e-300, dp)[:, None, :]
    s = jnp.clip(s, 0.0, 1.0)                       # (ncol, n, km)
    if al.ndim == 3:                                # (nf, ncol, km)
        al, delta, a6 = al[:, :, None], delta[:, :, None], a6[:, :, None]
        s = s[None]
    else:
        al, delta, a6 = al[:, None], delta[:, None], a6[:, None]
    # q(s') = al + s'(delta + a6(1-s'));  P(s) = ∫_0^s q ds'
    part = s * (al + s * (0.5 * (delta + a6) - a6 * s * (1.0 / 3.0)))
    return jnp.sum(dp[:, None, :] * part, axis=-1)


def ppm_remap(pe_src, q, pe_tgt, kord: int = 4):
    """Remap cell means q from source interfaces pe_src to target pe_tgt.

    Conservative: sum(q_new * dpe_tgt) == sum(q * dpe_src) when the endpoint
    interfaces coincide. Batched over leading axis.
    """
    ncol, km = q.shape
    dp = pe_src[:, 1:] - pe_src[:, :-1]
    al, ar, a6 = _ppm_edges_nonuniform(q, dp, kord)

    M_tgt = _mass_at_dense(pe_src, dp, al, ar - al, a6, pe_tgt)
    # pin the endpoints exactly: shared top/bottom interfaces carry the full
    # column mass, eliminating roundoff drift in the dense partial sums
    M_tgt = M_tgt.at[:, 0].set(0.0)
    M_tgt = M_tgt.at[:, -1].set(jnp.sum(q * dp, axis=1))
    dpe_t = pe_tgt[:, 1:] - pe_tgt[:, :-1]
    return (M_tgt[:, 1:] - M_tgt[:, :-1]) / dpe_t


def ppm_remap_multi(pe_src, qs, pe_tgt, kord: int = 4):
    """Remap several fields sharing the same interface sets in one pass.

    qs: (nf, ncol, km) -> (nf, ncol, km_t). The fractional-overlap tensor s
    is computed once and shared across fields — the per-field cost is just
    the PPM reconstruction and the fused parabola-integral reduction (this
    is what makes te_map's pt+tracers remap one fused program instead of nf
    sequential ones — SURVEY §2.3 P6's tracer batching).
    """
    nf, ncol, km = qs.shape
    dp = pe_src[:, 1:] - pe_src[:, :-1]
    al, ar, a6 = jax.vmap(lambda q: _ppm_edges_nonuniform(q, dp, kord))(qs)

    M_tgt = _mass_at_dense(pe_src, dp, al, ar - al, a6, pe_tgt)
    M_tgt = M_tgt.at[..., 0].set(0.0)
    M_tgt = M_tgt.at[..., -1].set(jnp.sum(qs * dp[None], axis=-1))
    dpe_t = (pe_tgt[:, 1:] - pe_tgt[:, :-1])[None]
    return (M_tgt[..., 1:] - M_tgt[..., :-1]) / dpe_t


def remap_state(pe_src, pe_tgt, fields: dict, kord: int = 4) -> dict:
    """Remap a dict of (ncol, km) fields from pe_src to pe_tgt."""
    names = list(fields)
    out = ppm_remap_multi(pe_src, jnp.stack([fields[n] for n in names]),
                          pe_tgt, kord)
    return {n: out[i] for i, n in enumerate(names)}
