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


def ppm_remap(pe_src, q, pe_tgt, kord: int = 4):
    """Remap cell means q from source interfaces pe_src to target pe_tgt.

    Conservative: sum(q_new * dpe_tgt) == sum(q * dpe_src) when the endpoint
    interfaces coincide. Batched over leading axis.
    """
    ncol, km = q.shape
    dp = pe_src[:, 1:] - pe_src[:, :-1]
    al, ar, a6 = _ppm_edges_nonuniform(q, dp, kord)
    delta = ar - al

    # cumulative mass at source interfaces: M[k] = sum_{k'<k} q dp
    csum = jnp.cumsum(q * dp, axis=1)
    M_src = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum], axis=1)

    def mass_at(x):
        """M(x) for target interface positions x (ncol, n).

        The containing-cell search is a comparison-count (monotone
        interfaces), and the per-cell coefficient lookups are one one-hot
        contraction over the small level axis — no hardware gathers, which
        dominate HBM traffic on TPU and miscompile under SPMD sharding.
        """
        # k = #{j : pe_src[j] <= x} - 1, clipped to valid cells
        cnt = jnp.sum(pe_src[:, None, :] <= x[:, :, None], axis=-1)
        k = jnp.clip(cnt - 1, 0, km - 1)
        onehot = (k[:, :, None] == jnp.arange(km)).astype(q.dtype)

        def at_k(a):                       # a: (ncol, km) -> (ncol, n)
            return jnp.einsum('cnk,ck->cn', onehot, a)

        pe_k = at_k(pe_src[:, :km])
        dp_k = at_k(dp)
        s = jnp.clip((x - pe_k) / jnp.where(dp_k == 0, 1e-300, dp_k), 0.0, 1.0)
        al_k, d_k, a6_k = at_k(al), at_k(delta), at_k(a6)
        # q(s') = al + s' (delta + a6 (1 - s'));  ∫_0^s q ds'
        part = al_k * s + 0.5 * (d_k + a6_k) * s ** 2 - a6_k * s ** 3 / 3.0
        return at_k(M_src[:, :km]) + dp_k * part

    M_tgt = mass_at(pe_tgt)
    # pin the endpoints exactly: shared top/bottom interfaces carry the full
    # column mass, eliminating roundoff drift from the searchsorted path
    M_tgt = M_tgt.at[:, 0].set(0.0)
    M_tgt = M_tgt.at[:, -1].set(M_src[:, -1])
    dpe_t = pe_tgt[:, 1:] - pe_tgt[:, :-1]
    return (M_tgt[:, 1:] - M_tgt[:, :-1]) / dpe_t


def ppm_remap_multi(pe_src, qs, pe_tgt, kord: int = 4):
    """Remap several fields sharing the same interface sets in one pass.

    qs: (nf, ncol, km) -> (nf, ncol, km_t). The containing-cell search and
    one-hot masks are computed once and reused across fields — the per-field
    cost is just the PPM reconstruction and a few contractions (this is what
    makes te_map's pt+tracers remap one fused program instead of nf
    sequential ones).
    """
    nf, ncol, km = qs.shape
    dp = pe_src[:, 1:] - pe_src[:, :-1]
    al, ar, a6 = jax.vmap(lambda q: _ppm_edges_nonuniform(q, dp, kord))(qs)
    delta = ar - al
    csum = jnp.cumsum(qs * dp[None], axis=-1)
    M_src = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)

    cnt = jnp.sum(pe_src[:, None, :] <= pe_tgt[:, :, None], axis=-1)
    k = jnp.clip(cnt - 1, 0, km - 1)
    onehot = (k[:, :, None] == jnp.arange(km)).astype(qs.dtype)

    def at_k(a):                           # (ncol, km) -> (ncol, n)
        return jnp.einsum('cnk,ck->cn', onehot, a)

    def at_k_f(a):                         # (nf, ncol, km) -> (nf, ncol, n)
        return jnp.einsum('cnk,fck->fcn', onehot, a)

    pe_k = at_k(pe_src[:, :km])
    dp_k = at_k(dp)
    s = jnp.clip((pe_tgt - pe_k) / jnp.where(dp_k == 0, 1e-300, dp_k),
                 0.0, 1.0)
    al_k, d_k, a6_k = at_k_f(al), at_k_f(delta), at_k_f(a6)
    part = al_k * s[None] + 0.5 * (d_k + a6_k) * s[None] ** 2 - \
        a6_k * s[None] ** 3 / 3.0
    M_tgt = at_k_f(M_src[..., :km]) + dp_k[None] * part
    M_tgt = M_tgt.at[..., 0].set(0.0)
    M_tgt = M_tgt.at[..., -1].set(M_src[..., -1])
    dpe_t = (pe_tgt[:, 1:] - pe_tgt[:, :-1])[None]
    return (M_tgt[..., 1:] - M_tgt[..., :-1]) / dpe_t


def remap_state(pe_src, pe_tgt, fields: dict, kord: int = 4) -> dict:
    """Remap a dict of (ncol, km) fields from pe_src to pe_tgt."""
    names = list(fields)
    out = ppm_remap_multi(pe_src, jnp.stack([fields[n] for n in names]),
                          pe_tgt, kord)
    return {n: out[i] for i, n in enumerate(names)}
