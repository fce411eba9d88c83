"""Fused Pallas TPU kernel for the te_map vertical remap.

One program remaps pt + all tracers (center interfaces) and u/v (their
edge-averaged interface sets) for a block of columns, in the natural
(k, columns) layout — the (km, jm, im) fields reshape to (km, ncol) for
free, so unlike the XLA path there are no (ncol, km) transposes at all.
The per-target-interface cumulative-mass evaluation is a statically
unrolled loop over the 26 target interfaces on full-lane (km, bc) slabs.

Same clip-integral formulation as ops/remap.py (docstring there); agreement
is f32 roundoff. Reference contract: te_map at /root/reference/fv/dyn_comp.F90:79,2699-2740.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def use_pallas_remap(ncol: int) -> bool:
    import os
    if os.environ.get("CAM_FORCE_XLA") == "1":
        return False          # operational kill-switch (see ops.pallas_kernels)
    try:
        return (jax.default_backend() == "tpu"
                and jax.device_count() == 1)
    except Exception:
        return False


def _above(a):
    """a(k-1) along the level axis with row 0 clamped."""
    return jnp.concatenate([a[:1], a[:-1]], axis=0)


def _below(a):
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def _ppm_edges_t(q, dp, kord: int):
    """(km, bc)-layout port of remap._ppm_edges_nonuniform (same math)."""
    km = q.shape[0]
    dq_lo = q[1:] - q[:-1]                              # (km-1, bc)
    z1 = jnp.zeros_like(q[:1])
    dqc = jnp.concatenate(
        [z1, 0.5 * (dq_lo[1:] + dq_lo[:-1]), z1], axis=0)
    qmax = jnp.concatenate(
        [z1, jnp.maximum(jnp.maximum(q[:-2], q[1:-1]), q[2:]) - q[1:-1], z1],
        axis=0)
    qmin = jnp.concatenate(
        [z1, q[1:-1] - jnp.minimum(jnp.minimum(q[:-2], q[1:-1]), q[2:]), z1],
        axis=0)
    dm = jnp.sign(dqc) * jnp.minimum(jnp.minimum(jnp.abs(dqc), qmax), qmin)

    w_hi = dp[:-1] / (dp[:-1] + dp[1:])
    edge = q[:-1] + w_hi * (q[1:] - q[:-1]) + (dm[:-1] - dm[1:]) / 3.0
    al = jnp.concatenate([q[:1], edge], axis=0)
    ar = jnp.concatenate([edge, q[-1:]], axis=0)

    if kord <= 2:
        return q - dm, q + dm, jnp.zeros_like(q)

    a6 = 3.0 * (q + q - (al + ar))
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
        a6 = jnp.where(zero, 0.0,
                       jnp.where(lo, a6_lo, jnp.where(hi, a6_hi, a6)))
        ar = jnp.where(zero, q, jnp.where(lo, ar_lo, ar))
        al = jnp.where(zero, q, jnp.where(hi, al_hi, al))
    else:
        da1 = dm + dm
        dl = jnp.sign(da1) * jnp.minimum(jnp.abs(da1), jnp.abs(al - q))
        dr = jnp.sign(da1) * jnp.minimum(jnp.abs(da1), jnp.abs(ar - q))
        ar = q + dr
        al = q - dl
        a6 = 3.0 * (dl - dr)
    return al, ar, a6


def _remap_set(pe_s, pe_t, fields, kord, km_t):
    """Remap `fields` (list of (km, bc)) from pe_s to pe_t ((km+1, bc))."""
    km = fields[0].shape[0]
    dp = pe_s[1:] - pe_s[:-1]
    dp_safe = jnp.where(dp == 0, 1e-30, dp)
    recon = [_ppm_edges_t(q, dp, kord) for q in fields]
    outs = []
    for q, (al, ar, a6) in zip(fields, recon):
        delta = ar - al
        half = 0.5 * (delta + a6)
        third = a6 * (1.0 / 3.0)
        total = jnp.sum(q * dp, axis=0)        # (bc,) full column mass
        m_rows = [jnp.zeros_like(total)]
        for kt in range(1, km_t):
            s = jnp.clip((pe_t[kt][None, :] - pe_s[:-1]) / dp_safe, 0.0, 1.0)
            part = s * (al + s * (half - third * s))
            m_rows.append(jnp.sum(dp * part, axis=0))
        m_rows.append(total)
        m = jnp.stack(m_rows, axis=0)          # (km_t+1, bc)
        outs.append((m[1:] - m[:-1]) / (pe_t[1:] - pe_t[:-1]))
    return outs


def _te_map_kernel(*refs, nf_c, kord, km, km_t):
    (pes_ref, pet_ref, pesu_ref, petu_ref, pesv_ref, petv_ref) = refs[:6]
    f_refs = refs[6:6 + nf_c]
    u_ref, v_ref = refs[6 + nf_c:8 + nf_c]
    out_refs = refs[8 + nf_c:]

    pe_s, pe_t = pes_ref[...], pet_ref[...]
    cen = _remap_set(pe_s, pe_t, [r[...] for r in f_refs], kord, km_t)
    for o, r in zip(out_refs[:nf_c], cen):
        o[...] = r
    (u_n,) = _remap_set(pesu_ref[...], petu_ref[...], [u_ref[...]],
                        kord, km_t)
    (v_n,) = _remap_set(pesv_ref[...], petv_ref[...], [v_ref[...]],
                        kord, km_t)
    out_refs[nf_c][...] = u_n
    out_refs[nf_c + 1][...] = v_n


def te_map_remap_pallas(pe_s, pe_t, pe_su, pe_tu, pe_sv, pe_tv,
                        center_fields, u, v, kord: int = 4,
                        block_cols: int = 512, interpret: bool = False):
    """Remap center_fields (list of (km, ncol)) on pe_s->pe_t and u/v on
    their edge-averaged interface sets, one fused program per column block.
    All pe_* are (km+1, ncol); returns (center_out list, u_out, v_out)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    km, ncol = u.shape
    km_t = pe_t.shape[0] - 1
    nf_c = len(center_fields)
    dtype = u.dtype
    bc = min(block_cols, max(128, (ncol // 128) * 128 or 128))
    pad = (-ncol) % bc
    ncp = ncol + pad

    def padc(a):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:, -1:], a.shape[:1] + (pad,))], axis=1)

    ins = [padc(a) for a in
           (pe_s, pe_t, pe_su, pe_tu, pe_sv, pe_tv,
            *center_fields, u, v)]

    sp_i = pl.BlockSpec((km + 1, bc), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    sp_m = pl.BlockSpec((km, bc), lambda i: (0, i), memory_space=pltpu.VMEM)
    sp_mt = pl.BlockSpec((km_t, bc), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    in_specs = [sp_i] * 6 + [sp_m] * (nf_c + 2)
    n_out = nf_c + 2
    out_shapes = tuple(jax.ShapeDtypeStruct((km_t, ncp), dtype)
                       for _ in range(n_out))

    kern = partial(_te_map_kernel, nf_c=nf_c, kord=kord, km=km, km_t=km_t)
    raw = pl.pallas_call(
        kern, grid=(ncp // bc,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=(sp_mt,) * n_out,
        interpret=interpret,
    )(*ins)
    raw = [a[:, :ncol] for a in raw]
    return raw[:nf_c], raw[nf_c], raw[nf_c + 1]
