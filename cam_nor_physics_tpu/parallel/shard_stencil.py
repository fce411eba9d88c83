"""Sharded Pallas stencils: the fused transport kernels under a y-mesh.

Under a multi-chip ('y', 'x') mesh the whole-array jnp path partitions
automatically (XLA SPMD inserts the halo collectives), but the fused Pallas
kernels (ops/pallas_kernels.py) cannot be auto-partitioned — round 1 fell
back to XLA under meshes, leaving the fast path single-chip only. This
module runs them under `shard_map`:

  1. every (km, jm, im) operand is halo-extended with `jax.lax.ppermute`
     (h = ops.pallas_kernels._HALO rows each way over the y axis — the
     TPU-native mp_send4d_ns, /root/reference/fv/dyn_comp.F90:1851-1855);
     edge devices receive zero-filled dummy halos;
  2. each device runs the same fused per-level kernels on its
     halo-augmented strip (j-banded further if the strip exceeds the VMEM
     cap) and keeps its interior rows — identical math to the single-chip
     banded path, because tp_core's j-stencils reach at most 4 rows;
  3. the pole-closure rows (cap sums, im/2 mirror ghosting — the only
     places where "middle-of-slab" semantics differ from true pole
     semantics) are recomputed globally by the jnp path on an 8-row polar
     slice and patched over rows [0, 4) and [jm-4, jm): a (km, 9, im)
     computation, negligible next to the strip kernels.

x must be unsharded (pole closures and FFSL wrap need full rows —
SURVEY §5.7); callers keep x_shards=1 (parallel/mesh.py default).

Requires a TPU backend per device; CPU-mesh tests set
ops.pallas_kernels._INTERPRET = True to run the kernels interpreted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import pallas_kernels as pk
from ..ops import tp_core as tp

# rows per pole whose outputs depend on pole semantics: the pole ROW VALUE
# itself is special (tp2d replaces adx/ady by q at rows 0 and jm-1, ymist
# mirrors dm) and the fyppm flux stencil carries it 3 edges in, so outputs
# at rows <= 3 (and >= jm-4) differ from middle-of-slab semantics.
_POLE_ROWS = 4


def use_sharded_pallas(mesh: Mesh | None) -> bool:
    """True when the shard_map Pallas path applies: a real mesh with y
    sharded, x local, and a TPU backend (or the interpret-mode test hook)."""
    if mesh is None or not isinstance(mesh, Mesh):
        return False
    if mesh.shape.get('x', 1) != 1 or mesh.shape.get('y', 1) < 2:
        return False
    if pk._INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _perms(nd: int):
    northward = [(i, i + 1) for i in range(nd - 1)]
    southward = [(i, i - 1) for i in range(1, nd)]
    return northward, southward


def _halo_axis(a, h: int, axis: int, nd: int, axis_name: str):
    """Extend `a` with h halo rows each way along `axis` via ppermute.
    Devices at the globe edges receive zero rows (their slab-edge outputs
    are either discarded halo or replaced by the polar patch)."""
    n = a.shape[axis]
    northward, southward = _perms(nd)
    last = jax.lax.slice_in_dim(a, n - h, n, axis=axis)
    first = jax.lax.slice_in_dim(a, 0, h, axis=axis)
    s_halo = jax.lax.ppermute(last, axis_name, northward)
    n_halo = jax.lax.ppermute(first, axis_name, southward)
    return jnp.concatenate([s_halo, a, n_halo], axis=axis)


def _local_banded(call_one, jl2: int, im: int):
    """Run a fused kernel on a (km, jl2, im) halo-augmented strip, j-banded
    further if the strip exceeds the VMEM cap. `call_one(slo, shi)` returns
    the slab outputs for strip rows [slo, shi)."""
    plan = pk.band_plan(jl2, im)
    if plan == []:
        raise ValueError(
            f"strip ({jl2}, {im}) cannot be banded under the VMEM cap")
    if plan is None:
        return call_one(0, jl2)
    return pk._run_banded(plan, lambda lo, hi, slo, shi: call_one(slo, shi))


def _patch_poles(outs, outs_s, outs_n, jm: int):
    """Replace rows [0, _POLE_ROWS) and [jm-_POLE_ROWS, jm) of each output
    with the jnp-path polar values (true pole semantics)."""
    pr = _POLE_ROWS
    return tuple(
        jnp.concatenate([s[..., :pr, :], o[..., pr:jm - pr, :],
                         n[..., -pr:, :]], axis=-2)
        for o, s, n in zip(outs, outs_s, outs_n))


# ---------------------------------------------------------------------------
# transport3d (mass + pt) under a mesh
# ---------------------------------------------------------------------------

def _transport_level_jnp(delp, pt, crx, cry, yfx, va, ffsl, cosp, acosp,
                         rcap, iord, jord, band=None):
    """The whole-slab jnp path of transport3d (polar-slice patch source)."""
    jm = delp.shape[-2]

    def level(args):
        delp_k, pt_k, crx_k, cry_k, yfx_k, va_k, ffsl_k = args
        ddp, mfx_k, mfy_k = tp.tp2c(va_k, delp_k, crx_k, cry_k, iord, jord,
                                    crx_k, yfx_k, cosp, acosp, rcap, ffsl_k,
                                    band=band)
        fx_pt, fy_pt = tp.tp2d(va_k, pt_k, crx_k, cry_k, iord, jord, mfx_k,
                               mfy_k, cosp, ffsl_k, 1, band=band)
        dpt = fx_pt - tp._rollx(fx_pt, -1) + \
            (fy_pt - tp.edge_north(fy_pt)) * acosp[:, None]
        dpt = tp.wset_row(dpt, 0, -jnp.sum(fy_pt[1, :]) * rcap)
        dpt = tp.wset_row(dpt, -1, jnp.sum(fy_pt[jm - 1, :]) * rcap)
        return ddp, dpt, mfx_k, mfy_k

    return jax.vmap(level)((delp, pt, crx, cry, yfx, va, ffsl))


def sharded_transport3d(mesh: Mesh, delp, pt, crx, cry, yfx, va, ffsl,
                        cosp, acosp, rcap: float, iord: int, jord: int):
    """transport3d with the fused Pallas kernels running per y-strip under
    `mesh`, plus the jnp polar patch. Same returns as transport3d."""
    km, jm, im = delp.shape
    nd = mesh.shape['y']
    h = pk._HALO
    ffsl_f = ffsl.astype(delp.dtype)

    spec3 = P(None, 'y', None)
    spec2 = P(None, 'y')
    spec1 = P('y')

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec3,) * 6 + (spec2, spec1, spec1),
             out_specs=(spec3,) * 4, check_vma=False)
    def strip(delp_l, pt_l, crx_l, cry_l, yfx_l, va_l, ffsl_l, cosp_l,
              acosp_l):
        aug = [_halo_axis(a, h, 1, nd, 'y')
               for a in (delp_l, pt_l, crx_l, cry_l, yfx_l, va_l)]
        ffsl_a = _halo_axis(ffsl_l, h, 1, nd, 'y')
        cosp_a = _halo_axis(cosp_l[None], h, 1, nd, 'y')[0]
        acosp_a = _halo_axis(acosp_l[None], h, 1, nd, 'y')[0]
        jl2 = aug[0].shape[1]

        def call_one(slo, shi):
            sl = slice(slo, shi)
            return pk._transport_call(
                *(a[:, sl] for a in aug), ffsl_a[:, sl] > 0.5,
                cosp_a[sl], acosp_a[sl], rcap, iord, jord, None)

        outs = _local_banded(call_one, jl2, im)
        return tuple(o[:, h:jl2 - h] for o in outs)

    outs = strip(delp, pt, crx, cry, yfx, va, ffsl_f, cosp, acosp)

    B = h + _POLE_ROWS
    sl_s, sl_n = slice(0, B), slice(jm - B, jm)
    args_s = (delp[:, sl_s], pt[:, sl_s], crx[:, sl_s], cry[:, sl_s],
              yfx[:, sl_s], va[:, sl_s], ffsl[:, sl_s], cosp[sl_s],
              acosp[sl_s], rcap, iord, jord)
    args_n = (delp[:, sl_n], pt[:, sl_n], crx[:, sl_n], cry[:, sl_n],
              yfx[:, sl_n], va[:, sl_n], ffsl[:, sl_n], cosp[sl_n],
              acosp[sl_n], rcap, iord, jord)
    outs_s = _transport_level_jnp(*args_s)
    outs_n = _transport_level_jnp(*args_n)
    return _patch_poles(outs, outs_s, outs_n, jm)


# ---------------------------------------------------------------------------
# vort_flux3d under a mesh
# ---------------------------------------------------------------------------

def _vort_level_jnp(zeta, crx, cry, udt, vedt, ffsl, cosp, iord, jord,
                    band=None):
    fy = jax.vmap(lambda z, c, m: tp.ytp(z, c, m, jord, 0))(zeta, cry, vedt)
    fx = jax.vmap(lambda z, c, m, f: tp.xtp(z, c, m, cosp, f, iord, 1,
                                            band=band))(zeta, crx, udt, ffsl)
    return fx, fy


def sharded_vort_flux3d(mesh: Mesh, zeta, crx, cry, udt, vedt, ffsl, cosp,
                        iord: int, jord: int):
    km, jm, im = zeta.shape
    nd = mesh.shape['y']
    h = pk._HALO
    ffsl_f = ffsl.astype(zeta.dtype)

    spec3 = P(None, 'y', None)
    spec2 = P(None, 'y')
    spec1 = P('y')

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec3,) * 5 + (spec2, spec1),
             out_specs=(spec3,) * 2, check_vma=False)
    def strip(zeta_l, crx_l, cry_l, udt_l, vedt_l, ffsl_l, cosp_l):
        aug = [_halo_axis(a, h, 1, nd, 'y')
               for a in (zeta_l, crx_l, cry_l, udt_l, vedt_l)]
        ffsl_a = _halo_axis(ffsl_l, h, 1, nd, 'y')
        cosp_a = _halo_axis(cosp_l[None], h, 1, nd, 'y')[0]
        jl2 = aug[0].shape[1]

        def call_one(slo, shi):
            sl = slice(slo, shi)
            return pk._vort_call(*(a[:, sl] for a in aug),
                                 ffsl_a[:, sl] > 0.5, cosp_a[sl],
                                 iord, jord, None)

        outs = _local_banded(call_one, jl2, im)
        return tuple(o[:, h:jl2 - h] for o in outs)

    outs = strip(zeta, crx, cry, udt, vedt, ffsl_f, cosp)

    B = h + _POLE_ROWS
    sl_s, sl_n = slice(0, B), slice(jm - B, jm)
    outs_s = _vort_level_jnp(zeta[:, sl_s], crx[:, sl_s], cry[:, sl_s],
                             udt[:, sl_s], vedt[:, sl_s], ffsl[:, sl_s],
                             cosp[sl_s], iord, jord)
    outs_n = _vort_level_jnp(zeta[:, sl_n], crx[:, sl_n], cry[:, sl_n],
                             udt[:, sl_n], vedt[:, sl_n], ffsl[:, sl_n],
                             cosp[sl_n], iord, jord)
    return _patch_poles(outs, outs_s, outs_n, jm)


# ---------------------------------------------------------------------------
# tracer_div3d under a mesh
# ---------------------------------------------------------------------------

def _tracer_level_jnp(q, crx, cry, mfx, mfy, va, ffsl, cosp, acosp, rcap,
                      iord, jord, band=None):
    jm = q.shape[-2]

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


def sharded_tracer_div3d(mesh: Mesh, q, crx, cry, mfx, mfy, va, ffsl,
                         cosp, acosp, rcap: float, iord: int, jord: int):
    nq, km, jm, im = q.shape
    nd = mesh.shape['y']
    h = pk._HALO
    ffsl_f = ffsl.astype(q.dtype)

    spec4 = P(None, None, 'y', None)
    spec3 = P(None, 'y', None)
    spec2 = P(None, 'y')
    spec1 = P('y')

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec4,) + (spec3,) * 5 + (spec2, spec1, spec1),
             out_specs=spec4, check_vma=False)
    def strip(q_l, crx_l, cry_l, mfx_l, mfy_l, va_l, ffsl_l, cosp_l,
              acosp_l):
        q_a = _halo_axis(q_l, h, 2, nd, 'y')
        aug = [_halo_axis(a, h, 1, nd, 'y')
               for a in (crx_l, cry_l, mfx_l, mfy_l, va_l)]
        ffsl_a = _halo_axis(ffsl_l, h, 1, nd, 'y')
        cosp_a = _halo_axis(cosp_l[None], h, 1, nd, 'y')[0]
        acosp_a = _halo_axis(acosp_l[None], h, 1, nd, 'y')[0]
        jl2 = q_a.shape[2]

        def call_one(slo, shi):
            sl = slice(slo, shi)
            return (pk._tracer_call(
                q_a[:, :, sl], *(a[:, sl] for a in aug),
                ffsl_a[:, sl] > 0.5, cosp_a[sl], acosp_a[sl],
                rcap, iord, jord, None),)

        out = _local_banded(call_one, jl2, im)[0]
        return out[:, :, h:jl2 - h]

    out = strip(q, crx, cry, mfx, mfy, va, ffsl_f, cosp, acosp)

    B = h + _POLE_ROWS
    sl_s, sl_n = slice(0, B), slice(jm - B, jm)
    out_s = _tracer_level_jnp(q[:, :, sl_s], crx[:, sl_s], cry[:, sl_s],
                              mfx[:, sl_s], mfy[:, sl_s], va[:, sl_s],
                              ffsl[:, sl_s], cosp[sl_s], acosp[sl_s],
                              rcap, iord, jord)
    out_n = _tracer_level_jnp(q[:, :, sl_n], crx[:, sl_n], cry[:, sl_n],
                              mfx[:, sl_n], mfy[:, sl_n], va[:, sl_n],
                              ffsl[:, sl_n], cosp[sl_n], acosp[sl_n],
                              rcap, iord, jord)
    return _patch_poles((out,), (out_s,), (out_n,), jm)[0]
