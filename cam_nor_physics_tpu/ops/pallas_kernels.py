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

J-BAND BLOCKING (large grids): the tp2d body keeps ~100 intermediate slabs
live in VMEM, so one whole (jm, im) slab per program caps at
`_MAX_SLAB_CELLS` cells. Above that the slab is split into latitude bands
with `_HALO` overlap rows, one pallas_call per band (`band_plan`); halo
rows are computed redundantly and discarded. Correctness rests on two
facts, both verified by the banded-vs-XLA equivalence tests:
  (1) every j-stencil chain in tp2c/tp2d reaches at most 4 rows
      (ymist±1 -> fyppm edge reconstruction ±2 -> flux at edge e from
      e-1 -> divergence at j from edge j+1), so _HALO=5 isolates band
      interiors from any contamination; and
  (2) tp_core applies its pole semantics (cap sums, im/2 mirror rows) at
      SLAB edges — for the first/last band the slab edge IS the true pole
      (the plan never pads beyond [0, jm)), and for interior bands the
      pole-corrupted edge rows are discarded halo.
This mirrors the reference's bounded-halo latitude-strip decomposition
(/root/reference/fv/dynamics_vars.F90:161-167, ng_d = min(|jord|,3)).

Dispatch: `use_pallas()` is True on a single-device TPU backend; callers
fall back to the identical jnp path on CPU (tests), and under multi-chip
SPMD sharding (a shard_map wrapper with halo exchange rides the same
band machinery — parallel/shard_stencil.py).

Measured at 144x96x26 f32 on one v5e chip: fused mass+pt transport
1.22 ms vs 4.86 ms jnp (4.0x), compile ~7 s.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import tp_core as tp


# Largest PADDED (rows, im) slab one fused per-level program accepts: the
# tp2d body keeps O(100) intermediate slabs live in VMEM. The kernels
# request `_VMEM_LIMIT` of the v5e's 128 MB VMEM (the default scoped cap
# is 16 MB). Round-4 ran with 64000 (an early conservative measurement);
# round-5 hardware A/B showed slabs up to ~126k padded cells (f05's
# 2-band split: 197x640) compile AND execute, and fewer/larger bands win:
# f09 (192x384 = 73.7k) whole-slab is 53.5 vs 59.9 ms/step 2-banded.
# 133120 keeps f19/f09 whole-slab and f05 at 2 bands (its 197x640 =
# 126,080-cell band slabs are exactly the hardware-validated size;
# 133120 = the smallest multiple-of-8-row cap that yields the 2-band
# plan, 5.6% above what was executed) without licensing untested slabs
# far beyond the measurement. Padding: Mosaic tiles f32 slabs to
# (8, 128).
_MAX_SLAB_CELLS = 133120
_VMEM_LIMIT = 100 * 1024 * 1024

# Test hook: run pallas_call in interpret mode (CPU) so the banded
# machinery is exercised without a TPU (tests monkeypatch use_pallas too).
_INTERPRET = False

# Overlap rows per band side. The deepest j-stencil chain in the fused
# kernels (q -> ymist slopes -> fyppm edges -> edge flux e-1 -> flux
# divergence needing edge j+1) reaches 4 rows; 5 adds a safety row.
_HALO = 5


def _padded_cells(rows: int, im: int) -> int:
    """(rows, im) f32 slab footprint in tile-padded cells ((8, 128) tiles)."""
    return ((rows + 7) // 8 * 8) * ((im + 127) // 128 * 128)


def _tpu_params():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def use_pallas(slab_cells: int | None = None) -> bool:
    """True when the fused Pallas path applies. With `slab_cells`, also
    require a single whole slab to fit one program (callers that can band
    pass None and consult band_plan instead).

    CAM_FORCE_XLA=1 is the operational kill-switch: the axon tunnel has
    been observed to enter a state where Mosaic custom-call EXECUTION
    hangs while plain XLA programs run (round 3); bench.py probes for
    that in a subprocess and sets this to keep producing numbers."""
    import os
    if os.environ.get("CAM_FORCE_XLA") == "1":
        return False
    try:
        if slab_cells is not None and slab_cells > _MAX_SLAB_CELLS:
            return False
        return (jax.default_backend() == "tpu"
                and jax.device_count() == 1)
    except Exception:
        return False


def band_plan(jm: int, im: int, halo: int = _HALO,
              max_cells: int | None = None):
    """Latitude-band decomposition for the fused kernels.

    Returns None when the whole (jm, im) slab fits one program (no
    banding), a list of (lo, hi, slo, shi) band descriptors otherwise —
    interior rows [lo, hi) assembled from slab rows [slo, shi) — or []
    when banding is infeasible (im so wide that a band of useful height
    exceeds the VMEM cap; callers fall back to XLA).
    """
    if max_cells is None:
        max_cells = _MAX_SLAB_CELLS       # read at call time (test hook)
    if _padded_cells(jm, im) <= max_cells:
        return None
    im_pad = (im + 127) // 128 * 128
    maxrows = (max_cells // im_pad) // 8 * 8
    jb = maxrows - 2 * halo
    if jb < halo + 2:
        return []
    nb = -(-jm // jb)
    bounds = [round(b * jm / nb) for b in range(nb + 1)]
    return [(lo, hi, max(lo - halo, 0), min(hi + halo, jm))
            for lo, hi in zip(bounds[:-1], bounds[1:])]


def _band_ffsl(slo: int, shi: int, jm: int, nb_ffsl):
    """Translate the global FFSL polar-band restriction (tp.ffsl_band) into
    the per-band-slab (south, north) `band` tuple: the slab keeps exactly
    the rows that lie inside the global polar bands; interior bands skip
    FFSL entirely ((0, 0) -> regular branch)."""
    if nb_ffsl is None:
        return None                       # whole grid is FFSL-capable
    rows = shi - slo
    s = max(0, min(nb_ffsl - slo, rows))
    n = max(0, min(shi - (jm - nb_ffsl), rows))
    if s + n >= rows:
        return None                       # restriction saves nothing
    return (s, n)


def _run_banded(plan, call_band):
    """Run `call_band(lo, hi, slo, shi) -> tuple of (..., shi-slo, im)`
    per band and assemble interiors along the j axis."""
    parts = [call_band(*b) for b in plan]
    return tuple(
        jnp.concatenate(
            [p[i][..., lo - slo:hi - slo, :]
             for p, (lo, hi, slo, shi) in zip(parts, plan)], axis=-2)
        for i in range(len(parts[0])))


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


def _transport_call(delp, pt, crx, cry, yfx, va, ffsl, cosp, acosp,
                    rcap: float, iord: int, jord: int, band):
    from jax.experimental import pallas as pl
    km, jm, im = delp.shape
    slab, vec, full2 = _specs(km, jm, im)
    out = jax.ShapeDtypeStruct(delp.shape, delp.dtype)
    kern = partial(_transport_kernel, iord=iord, jord=jord,
                   rcap=float(rcap), jm=jm, band=band)
    return pl.pallas_call(
        kern, grid=(km,),
        out_shape=(out, out, out, out),
        in_specs=[slab] * 6 + [full2, vec, vec],
        out_specs=(slab, slab, slab, slab),
        compiler_params=_tpu_params(),
        interpret=_INTERPRET,
    )(delp, pt, crx, cry, yfx, va, ffsl.astype(delp.dtype),
      cosp[None].astype(delp.dtype), acosp[None].astype(delp.dtype))


def transport3d(delp, pt, crx, cry, yfx, va, ffsl, cosp, acosp, rcap: float,
                iord: int, jord: int, prefer_pallas: bool = True,
                band: int | None = None):
    """Mass-flux (tp2c) + mass-consistent scalar (tp2d) transport of the
    cd_core D/C steps, fused per level. Shapes (km, jm, im); cosp/acosp
    (jm,); ffsl (km, jm) bool. Returns (ddp, dpt, mfx, mfy): thickness and
    pt-mass increments (polar caps closed) and the mass fluxes."""
    km, jm, im = delp.shape
    plan = band_plan(jm, im) if (prefer_pallas and use_pallas()) else []

    if plan == []:
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

    if plan is None:
        return _transport_call(delp, pt, crx, cry, yfx, va, ffsl, cosp,
                               acosp, rcap, iord, jord, band)

    def call_band(lo, hi, slo, shi):
        sl = slice(slo, shi)
        return _transport_call(
            delp[:, sl], pt[:, sl], crx[:, sl], cry[:, sl], yfx[:, sl],
            va[:, sl], ffsl[:, sl], cosp[sl], acosp[sl], rcap, iord, jord,
            _band_ffsl(slo, shi, jm, band))

    return _run_banded(plan, call_band)


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


def _vort_call(zeta, crx, cry, udt, vedt, ffsl, cosp, iord, jord, band):
    from jax.experimental import pallas as pl
    km, jm, im = zeta.shape
    slab, vec, full2 = _specs(km, jm, im)
    out = jax.ShapeDtypeStruct(zeta.shape, zeta.dtype)
    kern = partial(_vort_kernel, iord=iord, jord=jord, band=band)
    return pl.pallas_call(
        kern, grid=(km,),
        out_shape=(out, out),
        in_specs=[slab] * 5 + [full2, vec],
        out_specs=(slab, slab),
        compiler_params=_tpu_params(),
        interpret=_INTERPRET,
    )(zeta, crx, cry, udt, vedt, ffsl.astype(zeta.dtype),
      cosp[None].astype(zeta.dtype))


def vort_flux3d(zeta, crx, cry, udt, vedt, ffsl, cosp, iord: int, jord: int,
                prefer_pallas: bool = True, band: int | None = None):
    """Upwind-PPM fluxes of absolute vorticity for the vector-invariant wind
    update (cd_core role): fy = ytp(ζ)·v̄dt at u points, fx = xtp(ζ)·ūdt at
    v points. Shapes (km, jm, im). Returns (fx_z, fy_z)."""
    km, jm, im = zeta.shape
    plan = band_plan(jm, im) if (prefer_pallas and use_pallas()) else []

    if plan == []:
        fy = jax.vmap(lambda z, c, m: tp.ytp(z, c, m, jord, 0))(
            zeta, cry, vedt)
        fx = jax.vmap(lambda z, c, m, f: tp.xtp(z, c, m, cosp, f, iord, 1,
                                                band=band))(
            zeta, crx, udt, ffsl)
        return fx, fy

    if plan is None:
        return _vort_call(zeta, crx, cry, udt, vedt, ffsl, cosp, iord, jord,
                          band)

    def call_band(lo, hi, slo, shi):
        sl = slice(slo, shi)
        return _vort_call(zeta[:, sl], crx[:, sl], cry[:, sl], udt[:, sl],
                          vedt[:, sl], ffsl[:, sl], cosp[sl], iord, jord,
                          _band_ffsl(slo, shi, jm, band))

    return _run_banded(plan, call_band)


# ---------------------------------------------------------------------------
# tracer flux-divergence (trac2d inner), one program per (tracer, level)
# ---------------------------------------------------------------------------

def _tracer_kernel(q_ref, crx_ref, cry_ref, mfx_ref, mfy_ref, va_ref,
                   ffsl_ref, cosp_ref, acosp_ref, dqm_ref,
                   *, iord: int, jord: int, rcap: float, jm: int,
                   band: int | None = None):
    from jax.experimental import pallas as pl
    f_k = ffsl_ref[pl.program_id(1)] > 0.5
    cosp = cosp_ref[0]
    acosp = acosp_ref[0]
    fx, fy = tp.tp2d(va_ref[0], q_ref[0, 0], crx_ref[0], cry_ref[0],
                     iord, jord, mfx_ref[0], mfy_ref[0], cosp, f_k, 1,
                     band=band)
    dqm = fx - tp._rollx(fx, -1) + \
        (fy - tp.edge_north(fy)) * acosp[:, None]
    dqm = tp.wset_row(dqm, 0, -jnp.sum(fy[1, :]) * rcap)
    dqm = tp.wset_row(dqm, -1, jnp.sum(fy[jm - 1, :]) * rcap)
    dqm_ref[0, 0] = dqm


def _tracer_call(q, crx, cry, mfx, mfy, va, ffsl, cosp, acosp, rcap,
                 iord, jord, band):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    nq, km, jm, im = q.shape
    q4 = pl.BlockSpec((1, 1, jm, im), lambda n, k: (n, k, 0, 0),
                      memory_space=pltpu.VMEM)
    slab = pl.BlockSpec((1, jm, im), lambda n, k: (k, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, jm), lambda n, k: (0, 0),
                       memory_space=pltpu.VMEM)
    full2 = pl.BlockSpec((km, jm), lambda n, k: (0, 0),
                         memory_space=pltpu.VMEM)
    kern = partial(_tracer_kernel, iord=iord, jord=jord, rcap=float(rcap),
                   jm=jm, band=band)
    return pl.pallas_call(
        kern, grid=(nq, km),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        in_specs=[q4, slab, slab, slab, slab, slab, full2, vec, vec],
        out_specs=q4,
        compiler_params=_tpu_params(),
        interpret=_INTERPRET,
    )(q, crx, cry, mfx, mfy, va, ffsl.astype(q.dtype),
      cosp[None].astype(q.dtype), acosp[None].astype(q.dtype))


def tracer_div3d(q, crx, cry, mfx, mfy, va, ffsl, cosp, acosp, rcap: float,
                 iord: int, jord: int, prefer_pallas: bool = True,
                 band: int | None = None):
    """Flux divergence of tracer mass for trac2d: q (nq, km, jm, im) mixing
    ratios, winds/fluxes (km, jm, im) shared across tracers. Returns dqm
    (nq, km, jm, im) with polar caps closed."""
    nq, km, jm, im = q.shape
    plan = band_plan(jm, im) if (prefer_pallas and use_pallas()) else []

    if plan == []:
        def one(qm):
            def level(args):
                q_k, cx_k, cy_k, mfx_k, mfy_k, va_k, ffsl_k = args
                fx, fy = tp.tp2d(va_k, q_k, cx_k, cy_k, iord, jord, mfx_k,
                                 mfy_k, cosp, ffsl_k, 1, band=band)
                dqm = fx - tp._rollx(fx, -1) + \
                    (fy - tp.edge_north(fy)) * acosp[:, None]
                dqm = tp.wset_row(dqm, 0, -jnp.sum(fy[1, :]) * rcap)
                dqm = tp.wset_row(dqm, -1, jnp.sum(fy[jm - 1, :]) * rcap)
                return dqm
            return jax.vmap(level)((qm, crx, cry, mfx, mfy, va, ffsl))
        return jax.vmap(one)(q)

    if plan is None:
        return (_tracer_call(q, crx, cry, mfx, mfy, va, ffsl, cosp, acosp,
                             rcap, iord, jord, band),)[0]

    def call_band(lo, hi, slo, shi):
        sl = slice(slo, shi)
        return (_tracer_call(
            q[:, :, sl], crx[:, sl], cry[:, sl], mfx[:, sl], mfy[:, sl],
            va[:, sl], ffsl[:, sl], cosp[sl], acosp[sl], rcap, iord, jord,
            _band_ffsl(slo, shi, jm, band)),)

    return _run_banded(plan, call_band)[0]
