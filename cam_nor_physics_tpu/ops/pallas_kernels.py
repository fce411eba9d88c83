"""Pallas TPU kernels for the FFSL stencil hot path.

The jnp formulation of tp_core compiles to ~50 XLA kernels per x-sweep; at
FV resolutions the whole (km, jm, im) slab is ~1-6 MB — far under the 16 MB
VMEM budget — so the entire sweep fuses into ONE Pallas kernel: inputs DMA'd
HBM→VMEM once, all PPM reconstruction/limiting/flux math on-core, one result
written back. This removes the per-kernel HBM round trips that dominate the
jnp version (pallas_guide: HBM→VMEM→compute; minimize HBM traffic).

The kernel bodies reuse tp_core's pure math (`tp_core.xtp`, `tp_core.tp2d`)
on VMEM-resident values — identical numerics, single fused program. Dispatch:
`use_pallas()` is True on TPU backends; callers fall back to the jnp path on
CPU (tests) and under SPMD sharding of the slab axes.

STATUS: experimental, not wired into cd_core. The kernels lower (tp_core was
made Mosaic-clean: static-slice rolls, positive indexing, matmul prefix sums,
one-hot gathers), but Mosaic's compile time for the full 26-level fused tp2d
at 144x96 currently exceeds practical budgets; the XLA path — already within
~3x of the HBM roofline after the gather elimination — remains the default.
Revisit with per-level grid blocking (grid=(km,)) to shrink the kernel body.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import tp_core as tp


def use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _xtp_kernel(q_ref, c_ref, mfx_ref, cosa_ref, ffsl_ref, out_ref,
                *, iord: int, id_: int):
    from jax.experimental import pallas as pl
    # one grid step = one level: slabs blocked (1, jm, im); the small row
    # metadata (cosa, ffsl) ride along unblocked and are indexed per level
    q = q_ref[0]
    c = c_ref[0]
    mfx = mfx_ref[0]
    cosa = cosa_ref[0]
    ffsl = ffsl_ref[pl.program_id(0)] > 0.5    # carried as f32 for tiling
    out_ref[0] = tp.xtp(q, c, mfx, cosa, ffsl, iord, id_)


def xtp3d(q, c, mfx, cosa, ffsl, iord: int, id_: int):
    """Fused x-sweep, one Pallas program per level (grid=(km,)): the whole
    PPM reconstruction + limiting + FFSL flux for a level runs on
    VMEM-resident slabs in a single kernel.

    Pallas on TPU; jnp-vmap fallback elsewhere. `cosa` (jm,), `ffsl`
    (km, jm) bool.
    """
    if not use_pallas():
        return jax.vmap(lambda qk, ck, mk, fk:
                        tp.xtp(qk, ck, mk, cosa, fk, iord, id_))(
            q, c, mfx, ffsl)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    km, jm, im = q.shape
    kern = partial(_xtp_kernel, iord=iord, id_=id_)
    slab = pl.BlockSpec((1, jm, im), lambda k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    full2 = pl.BlockSpec((km, jm), lambda k: (0, 0),
                         memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, jm), lambda k: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(km,),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        in_specs=[slab, slab, slab, vec, full2],
        out_specs=slab,
    )(q, c, mfx, cosa[None, :], ffsl.astype(jnp.float32))


def _tp2d_kernel(va_ref, q_ref, crx_ref, cry_ref, xfx_ref, yfx_ref,
                 cosp_ref, ffsl_ref, fx_ref, fy_ref,
                 *, iord: int, jord: int, id_: int):
    va = va_ref[:]
    q = q_ref[:]
    crx = crx_ref[:]
    cry = cry_ref[:]
    xfx = xfx_ref[:]
    yfx = yfx_ref[:]
    cosp = cosp_ref[:]
    ffsl = ffsl_ref[:]

    def one(va_k, q_k, crx_k, cry_k, xfx_k, yfx_k, ffsl_k):
        return tp.tp2d(va_k, q_k, crx_k, cry_k, iord, jord, xfx_k, yfx_k,
                       cosp, ffsl_k, id_)

    fx, fy = jax.vmap(one)(va, q, crx, cry, xfx, yfx, ffsl)
    fx_ref[:] = fx
    fy_ref[:] = fy


def tp2d3d(va, q, crx, cry, iord: int, jord: int, xfx, yfx, cosp, ffsl,
           id_: int):
    """Fused whole-slab 2-D transport (inner x/y advective operators + PPM
    sweeps in one kernel). Shapes all (km, jm, im); cosp (jm,); ffsl
    (km, jm). Returns (fx, fy)."""
    if not use_pallas():
        return jax.vmap(lambda a, b, c_, d, e, f, g:
                        tp.tp2d(a, b, c_, d, iord, jord, e, f, cosp, g, id_))(
            va, q, crx, cry, xfx, yfx, ffsl)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_tp2d_kernel, iord=iord, jord=jord, id_=id_)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(va, q, crx, cry, xfx, yfx, cosp, ffsl.astype(jnp.bool_))
