"""Pallas TPU kernels for the FFSL stencil hot path.

The jnp formulation of the cd_core transport compiles to ~3300 XLA kernel
launches per small step (the slice+concat rolls fragment fusion); at FV
resolutions one (jm, im) level slab is ~55 KB — far under the 16 MB VMEM
budget — so an entire per-level transport pipeline fuses into ONE Pallas
program: inputs DMA'd HBM→VMEM once, all PPM reconstruction/limiting/flux
math on-core, results written back once (pallas_guide: minimize HBM traffic,
fuse elementwise chains).

The kernel bodies reuse tp_core's pure math (`tp2c`, `tp2d`, `xtp`, `ytp`)
on VMEM-resident values — identical numerics to the jnp path (measured
agreement to f32 roundoff), single fused program per level. tp_core is
Mosaic-clean by construction: static-slice rolls, no cumsum/einsum (the FFSL
integer-Courant path is roll+select chains), int32 masks reshaped before
comparison.

Dispatch: `use_pallas()` is True on a single-device TPU backend; callers
fall back to the identical jnp path on CPU (tests), and under multi-chip
SPMD sharding (a shard_map wrapper with halo exchange is future work —
the XLA path partitions as-is).

Measured at 144x96x26 f32 on one v5e chip: fused mass+pt transport
1.22 ms vs 4.86 ms jnp (4.0x), compile ~7 s.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import tp_core as tp


# Largest (jm, im) slab the fused per-level kernels accept: the tp2d body
# keeps ~100 slabs live in VMEM (measured 54 MB at 192x288 vs the 16 MB
# budget), so above this the callers fall back to the XLA path. Lifting the
# cap needs j-band blocking with halo rows (future work).
_MAX_SLAB_CELLS = 20000


def use_pallas(slab_cells: int | None = None) -> bool:
    try:
        if slab_cells is not None and slab_cells > _MAX_SLAB_CELLS:
            return False
        return (jax.default_backend() == "tpu"
                and jax.device_count() == 1)
    except Exception:
        return False


def _specs(km: int, jm: int, im: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    slab = pl.BlockSpec((1, jm, im), lambda k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, jm), lambda k: (0, 0), memory_space=pltpu.VMEM)
    full2 = pl.BlockSpec((km, jm), lambda k: (0, 0),
                         memory_space=pltpu.VMEM)
    return slab, vec, full2


# ---------------------------------------------------------------------------
# fused mass (tp2c) + scalar (tp2d) transport, one program per level
# ---------------------------------------------------------------------------

def _transport_kernel(delp_ref, pt_ref, crx_ref, cry_ref, yfx_ref, va_ref,
                      ffsl_ref, cosp_ref, acosp_ref,
                      ddp_ref, dpt_ref, mfx_ref, mfy_ref,
                      *, iord: int, jord: int, rcap: float, jm: int,
                      band: int | None = None):
    from jax.experimental import pallas as pl
    f_k = ffsl_ref[pl.program_id(0)] > 0.5   # row flags carried as f32
    cosp = cosp_ref[0]
    acosp = acosp_ref[0]
    ddp, mfx_k, mfy_k = tp.tp2c(va_ref[0], delp_ref[0], crx_ref[0],
                                cry_ref[0], iord, jord, crx_ref[0],
                                yfx_ref[0], cosp, acosp, rcap, f_k,
                                band=band)
    fx_pt, fy_pt = tp.tp2d(va_ref[0], pt_ref[0], crx_ref[0], cry_ref[0],
                           iord, jord, mfx_k, mfy_k, cosp, f_k, 1,
                           band=band)
    dpt = fx_pt - tp._rollx(fx_pt, -1) + \
        (fy_pt - tp.edge_north(fy_pt)) * acosp[:, None]
    dpt = tp.wset_row(dpt, 0, -jnp.sum(fy_pt[1, :]) * rcap)
    dpt = tp.wset_row(dpt, -1, jnp.sum(fy_pt[jm - 1, :]) * rcap)
    ddp_ref[0] = ddp
    dpt_ref[0] = dpt
    mfx_ref[0] = mfx_k
    mfy_ref[0] = mfy_k


def transport3d(delp, pt, crx, cry, yfx, va, ffsl, cosp, acosp, rcap: float,
                iord: int, jord: int, prefer_pallas: bool = True,
                band: int | None = None):
    """Mass-flux (tp2c) + mass-consistent scalar (tp2d) transport of the
    cd_core D/C steps, fused per level. Shapes (km, jm, im); cosp/acosp
    (jm,); ffsl (km, jm) bool. Returns (ddp, dpt, mfx, mfy): thickness and
    pt-mass increments (polar caps closed) and the mass fluxes."""
    km, jm, im = delp.shape

    if not (prefer_pallas and use_pallas(jm * im)):
        def level(args):
            delp_k, pt_k, crx_k, cry_k, yfx_k, va_k, ffsl_k = args
            ddp, mfx_k, mfy_k = tp.tp2c(va_k, delp_k, crx_k, cry_k, iord,
                                        jord, crx_k, yfx_k, cosp, acosp,
                                        rcap, ffsl_k, band=band)
            fx_pt, fy_pt = tp.tp2d(va_k, pt_k, crx_k, cry_k, iord, jord,
                                   mfx_k, mfy_k, cosp, ffsl_k, 1, band=band)
            dpt = fx_pt - tp._rollx(fx_pt, -1) + \
                (fy_pt - tp.edge_north(fy_pt)) * acosp[:, None]
            dpt = tp.wset_row(dpt, 0, -jnp.sum(fy_pt[1, :]) * rcap)
            dpt = tp.wset_row(dpt, -1, jnp.sum(fy_pt[jm - 1, :]) * rcap)
            return ddp, dpt, mfx_k, mfy_k

        return jax.vmap(level)((delp, pt, crx, cry, yfx, va, ffsl))

    from jax.experimental import pallas as pl
    slab, vec, full2 = _specs(km, jm, im)
    out = jax.ShapeDtypeStruct(delp.shape, delp.dtype)
    kern = partial(_transport_kernel, iord=iord, jord=jord,
                   rcap=float(rcap), jm=jm, band=band)
    return pl.pallas_call(
        kern, grid=(km,),
        out_shape=(out, out, out, out),
        in_specs=[slab] * 6 + [full2, vec, vec],
        out_specs=(slab, slab, slab, slab),
    )(delp, pt, crx, cry, yfx, va, ffsl.astype(delp.dtype),
      cosp[None].astype(delp.dtype), acosp[None].astype(delp.dtype))


# ---------------------------------------------------------------------------
# fused vorticity fluxes (ytp + xtp on absolute vorticity), per level
# ---------------------------------------------------------------------------

def _vort_kernel(zeta_ref, crx_ref, cry_ref, udt_ref, vedt_ref, ffsl_ref,
                 cosp_ref, fx_ref, fy_ref, *, iord: int, jord: int,
                 band: int | None = None):
    from jax.experimental import pallas as pl
    f_k = ffsl_ref[pl.program_id(0)] > 0.5
    fy_ref[0] = tp.ytp(zeta_ref[0], cry_ref[0], vedt_ref[0], jord, 0)
    fx_ref[0] = tp.xtp(zeta_ref[0], crx_ref[0], udt_ref[0], cosp_ref[0],
                       f_k, iord, 1, band=band)


def vort_flux3d(zeta, crx, cry, udt, vedt, ffsl, cosp, iord: int, jord: int,
                prefer_pallas: bool = True, band: int | None = None):
    """Upwind-PPM fluxes of absolute vorticity for the vector-invariant wind
    update (cd_core role): fy = ytp(ζ)·v̄dt at u points, fx = xtp(ζ)·ūdt at
    v points. Shapes (km, jm, im). Returns (fx_z, fy_z)."""
    km, jm, im = zeta.shape
    if not (prefer_pallas and use_pallas(jm * im)):
        fy = jax.vmap(lambda z, c, m: tp.ytp(z, c, m, jord, 0))(
            zeta, cry, vedt)
        fx = jax.vmap(lambda z, c, m, f: tp.xtp(z, c, m, cosp, f, iord, 1,
                                                band=band))(
            zeta, crx, udt, ffsl)
        return fx, fy

    from jax.experimental import pallas as pl
    slab, vec, full2 = _specs(km, jm, im)
    out = jax.ShapeDtypeStruct(zeta.shape, zeta.dtype)
    kern = partial(_vort_kernel, iord=iord, jord=jord, band=band)
    return pl.pallas_call(
        kern, grid=(km,),
        out_shape=(out, out),
        in_specs=[slab] * 5 + [full2, vec],
        out_specs=(slab, slab),
    )(zeta, crx, cry, udt, vedt, ffsl.astype(zeta.dtype),
      cosp[None].astype(zeta.dtype))


# ---------------------------------------------------------------------------
# tracer flux-divergence (trac2d inner), one program per (tracer, level)
# ---------------------------------------------------------------------------

def _tracer_kernel(q_ref, crx_ref, cry_ref, mfx_ref, mfy_ref, va_ref,
                   ffsl_ref, cosp_ref, acosp_ref, dqm_ref,
                   *, iord: int, jord: int, rcap: float, jm: int):
    from jax.experimental import pallas as pl
    f_k = ffsl_ref[pl.program_id(1)] > 0.5
    cosp = cosp_ref[0]
    acosp = acosp_ref[0]
    fx, fy = tp.tp2d(va_ref[0], q_ref[0, 0], crx_ref[0], cry_ref[0],
                     iord, jord, mfx_ref[0], mfy_ref[0], cosp, f_k, 1)
    dqm = fx - tp._rollx(fx, -1) + \
        (fy - tp.edge_north(fy)) * acosp[:, None]
    dqm = tp.wset_row(dqm, 0, -jnp.sum(fy[1, :]) * rcap)
    dqm = tp.wset_row(dqm, -1, jnp.sum(fy[jm - 1, :]) * rcap)
    dqm_ref[0, 0] = dqm


def tracer_div3d(q, crx, cry, mfx, mfy, va, ffsl, cosp, acosp, rcap: float,
                 iord: int, jord: int, prefer_pallas: bool = True):
    """Flux divergence of tracer mass for trac2d: q (nq, km, jm, im) mixing
    ratios, winds/fluxes (km, jm, im) shared across tracers. Returns dqm
    (nq, km, jm, im) with polar caps closed."""
    nq, km, jm, im = q.shape

    if not (prefer_pallas and use_pallas(jm * im)):
        def one(qm):
            def level(args):
                q_k, cx_k, cy_k, mfx_k, mfy_k, va_k, ffsl_k = args
                fx, fy = tp.tp2d(va_k, q_k, cx_k, cy_k, iord, jord, mfx_k,
                                 mfy_k, cosp, ffsl_k, 1)
                dqm = fx - tp._rollx(fx, -1) + \
                    (fy - tp.edge_north(fy)) * acosp[:, None]
                dqm = tp.wset_row(dqm, 0, -jnp.sum(fy[1, :]) * rcap)
                dqm = tp.wset_row(dqm, -1, jnp.sum(fy[jm - 1, :]) * rcap)
                return dqm
            return jax.vmap(level)((qm, crx, cry, mfx, mfy, va, ffsl))
        return jax.vmap(one)(q)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    q4 = pl.BlockSpec((1, 1, jm, im), lambda n, k: (n, k, 0, 0),
                      memory_space=pltpu.VMEM)
    slab = pl.BlockSpec((1, jm, im), lambda n, k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, jm), lambda n, k: (0, 0),
                       memory_space=pltpu.VMEM)
    full2 = pl.BlockSpec((km, jm), lambda n, k: (0, 0),
                         memory_space=pltpu.VMEM)
    kern = partial(_tracer_kernel, iord=iord, jord=jord, rcap=float(rcap),
                   jm=jm)
    return pl.pallas_call(
        kern, grid=(nq, km),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        in_specs=[q4, slab, slab, slab, slab, slab, full2, vec, vec],
        out_specs=q4,
    )(q, crx, cry, mfx, mfy, va, ffsl.astype(q.dtype),
      cosp[None].astype(q.dtype), acosp[None].astype(q.dtype))
