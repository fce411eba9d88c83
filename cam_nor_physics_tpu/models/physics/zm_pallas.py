"""Pallas TPU mega-kernel for the ZM deep-convection core.

The XLA path of `zm_convr` (zm_conv.py) compiles to ~6000 kernel launches
(twelve 26-level scans plus the inversion chains fragment into tiny ops);
at FV resolution the wall time is dominated by per-launch dispatch, not
compute (measured 14 ms vs < 1 ms of primitive cost). This module runs the
ENTIRE zm_convr — both buoyan_dilute passes, both cldprp passes, closure,
q1q2 — as ONE Pallas program per column block, with every level recursion
an in-kernel `fori_loop` over VMEM scratch.

Design (mirrors ops/pallas_kernels.py):
- The kernel body calls the *same* zm_conv.py code on VMEM-resident
  (block_cols, pver) arrays — identical numerics, one fused program. The
  only injected difference is the scan executor: `_PallasScan` implements
  the `scan_impl` contract (zm_conv.LAX_SCAN) as a fori_loop reading
  per-level rows from transposed (pver, bc) scratch refs and writing
  stacked outputs back — Mosaic cannot lower lax.scan with stacked ys.
- zm_conv.py itself was made Mosaic-clean: one-hot `_take_col`,
  iota-reduction first-true, triangular-matmul cumsums, no argmax/flip,
  int32 masks reshaped before comparison.
- Dispatch: single-chip TPU float32 with a static `delt` and a non-Brent
  inversion solver; anything else falls back to the identical XLA path.

Reference: /root/reference/physics/zm_conv.F90:231-1709 (zm_convr and
callees); the gathered-point scalar loops of the reference are the same
physics this kernel runs column-parallel in VMEM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...utils.config import ZMConfig
from . import zm_conv as zc


def use_pallas_zm(cfg: ZMConfig, dtype, delt) -> bool:
    import os
    if os.environ.get("CAM_FORCE_XLA") == "1":
        return False          # operational kill-switch (see ops.pallas_kernels)
    if cfg.inversion_solver == "brent":
        return False            # while_loop-based; stay on XLA
    if not isinstance(delt, (int, float)):
        return False            # delt must be trace-static for the kernel
    try:
        return (jax.default_backend() == "tpu"
                and jax.device_count() == 1
                and dtype == jnp.float32)
    except Exception:
        return False


class _PallasScan:
    """In-kernel level-axis scan executor (zm_conv.LAX_SCAN contract).

    xs arrays (bc, nk) are transposed into (nk, bc) VMEM scratch so the
    fori_loop can read/write per-level rows with a dynamic major-dim index
    (the only dynamic indexing Mosaic supports); carries stay SSA values.
    """

    def __init__(self, xs_refs, ys_refs, canon=None):
        self.xs_refs = xs_refs
        self.ys_refs = ys_refs
        self.canon = canon

    def _canonicalize(self, carry):
        """Round-trip 1-D carry leaves through a scratch row.

        Mosaic's layout inference CRASHES (layout.h join check) when a
        fori_loop carry is initialized with the degenerate rank-1 layout a
        minor-axis reduction or column slice produces (e.g. `hmn[:, 0]`):
        it cannot join with the loop-internal rank-1 layout. A VMEM
        store/load forces the canonical layout (see _RowCanon)."""
        if self.canon is None:
            return carry
        return jax.tree_util.tree_map(self.canon, carry)

    def scan(self, step, carry, xs: dict, reverse: bool = False):
        carry = self._canonicalize(carry)
        names = list(xs)
        if len(names) > len(self.xs_refs):
            raise ValueError(f"xs pool too small: {len(names)} arrays")
        first = xs[names[0]]
        bc, nk = zc._shape_cp(first)
        in_dtypes = [xs[n].dtype for n in names]
        for r, n in zip(self.xs_refs, names):
            # level-major xs are already (nk, bc) rows
            v = xs[n].astype(jnp.float32)
            r[0:nk, :] = v if zc._lm() else v.T

        ys_sd = jax.eval_shape(
            step, carry,
            {n: jax.ShapeDtypeStruct((bc,), d)
             for n, d in zip(names, in_dtypes)},
            jax.ShapeDtypeStruct((), jnp.int32))[1]
        n_ys = len(ys_sd)
        if n_ys > len(self.ys_refs):
            raise ValueError(f"ys pool too small: {n_ys} outputs")

        def body(i, cy):
            k = nk - 1 - i if reverse else i
            x = {n: self.xs_refs[j][k, :].astype(in_dtypes[j])
                 for j, n in enumerate(names)}
            cy, ys = step(cy, x, k)
            for j in range(n_ys):
                self.ys_refs[j][k, :] = ys[j].astype(jnp.float32)
            return cy

        carry = jax.lax.fori_loop(0, nk, body, carry)
        if zc._lm():
            ys_out = tuple(self.ys_refs[j][0:nk, :].astype(ys_sd[j].dtype)
                           for j in range(n_ys))
        else:
            ys_out = tuple(self.ys_refs[j][0:nk, :].T.astype(ys_sd[j].dtype)
                           for j in range(n_ys))
        return carry, ys_out


_N_XS, _N_YS = 12, 5    # pool sizes: max xs = suqu_step (12), max ys = 5
_N_SCRATCH = _N_XS + _N_YS + 1   # + the carry-canonicalization ref

# ZMConvOut fields -> (levels: 'm' = pver, 'i' = pver+1, 's' = scalar, dtype)
_OUT_LAYOUT = [
    ("qtnd", "m", jnp.float32), ("heat", "m", jnp.float32),
    ("prec", "s", jnp.float32), ("jctop", "s", jnp.int32),
    ("jcbot", "s", jnp.int32), ("cape", "s", jnp.float32),
    ("cin", "s", jnp.float32), ("mcon", "i", jnp.float32),
    ("dlf", "m", jnp.float32), ("pflx", "i", jnp.float32),
    ("cme", "m", jnp.float32), ("zdu", "m", jnp.float32),
    ("rprd", "m", jnp.float32), ("mu", "m", jnp.float32),
    ("eu", "m", jnp.float32), ("du", "m", jnp.float32),
    ("md", "m", jnp.float32), ("ed", "m", jnp.float32),
    ("dp", "m", jnp.float32), ("dsubcld", "s", jnp.float32),
    ("jt", "s", jnp.int32), ("maxg", "s", jnp.int32),
    ("ideep", "s", jnp.int32), ("eurt", "m", jnp.float32),
    ("ql", "m", jnp.float32), ("rliq", "s", jnp.float32),
    ("rice", "s", jnp.float32),
]


class _RowCanon:
    """Layout launderer: round-trips rank-1 values through scratch rows
    (cycling to limit store/load serialization). See zm_conv._CANON_HOOK."""

    def __init__(self, ref):
        self.ref = ref
        self.i = 0

    def __call__(self, v):
        if getattr(v, "ndim", None) != 1:
            return v
        r = self.i % self.ref.shape[0]
        self.i += 1
        self.ref[r, :] = v.astype(jnp.float32)
        back = self.ref[r, :]
        if v.dtype == jnp.bool_:
            return back > 0.5
        return back.astype(v.dtype)


_SCAL_IN = ["geos", "pblh", "tpert", "landfrac"]
_OUT_2D = [(n, k, d) for (n, k, d) in _OUT_LAYOUT if k != "s"]
_OUT_SC = [(n, k, d) for (n, k, d) in _OUT_LAYOUT if k == "s"]


def _kernel(cfg, msg, delt, refs):
    # 1-D (ncol,) values cannot be standalone Pallas operands (XLA tiles
    # them T(1024) vs Mosaic's T(512)) — scalars ride as ROWS of stacked
    # (n, ncol) f32 arrays; row reads/writes have the canonical layout.
    # The kernel runs zm_convr in the LEVEL-MAJOR (pver, bc) layout
    # (zm_conv._LM): columns in the minor/lane dimension give full vector
    # registers (the (bc, 26) layout padded 26 -> 128 lanes, 20% occupancy).
    n_in = 8
    ins = refs[:n_in]
    outs2d = refs[n_in:n_in + len(_OUT_2D)]
    out_sc = refs[n_in + len(_OUT_2D)]
    scratch = refs[n_in + len(_OUT_2D) + 1:]
    canon = _RowCanon(scratch[_N_XS + _N_YS])
    impl = _PallasScan(list(scratch[:_N_XS]),
                       list(scratch[_N_XS:_N_XS + _N_YS]),
                       canon=canon)
    (t, qh, pap, paph, dpp, zm_, zi_) = [r[...] for r in ins[:7]]
    scal = ins[7]
    geos, pblh, tpert, landfrac = (scal[j, :] for j in range(len(_SCAL_IN)))
    with zc.layout_ctx(level_major=True, canon=canon):
        out = zc.zm_convr(cfg, msg, t, qh, pap, paph, dpp, zm_, geos, zi_,
                          pblh, tpert, landfrac, delt, scan_impl=impl)
    for ref, (name, _, dt) in zip(outs2d, _OUT_2D):
        ref[...] = getattr(out, name).astype(dt)
    for j, (name, _, dt) in enumerate(_OUT_SC):
        out_sc[j, :] = getattr(out, name).astype(jnp.float32)


def zm_convr_pallas(cfg: ZMConfig, msg: int, t, qh, pap, paph, dpp, zm_,
                    geos, zi_, pblh, tpert, landfrac, delt,
                    block_cols: int = 512) -> "zc.ZMConvOut":
    """zm_convr as one fused Pallas program per `block_cols` column block.

    Columns are padded (edge-replicated) to a multiple of block_cols and
    sliced back; per-column physics makes the padding inert.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ncol, pver = t.shape
    bc = min(block_cols, max(128, (ncol // 128) * 128 or 128))
    pad = (-ncol) % bc

    def padc(a):
        if pad == 0:
            return a
        return jnp.concatenate([a] + [a[-1:]] * pad, axis=0) if a.ndim == 1 \
            else jnp.concatenate([a, jnp.broadcast_to(a[-1:],
                                                      (pad,) + a.shape[1:])],
                                 axis=0)

    # level-major kernel operands: (pver, ncp) with columns in the lane dim
    t_, qh_, pap_, dpp_, zmid_ = (padc(a).T for a in (t, qh, pap, dpp, zm_))
    paph_, zi2_ = (padc(a).T for a in (paph, zi_))
    geos_, pblh_, tpert_, lf_ = map(padc, (geos, pblh, tpert, landfrac))
    ncp = ncol + pad
    grid = ncp // bc

    sp_m = pl.BlockSpec((pver, bc), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    sp_i = pl.BlockSpec((pver + 1, bc), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    sp_sin = pl.BlockSpec((len(_SCAL_IN), bc), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    sp_sout = pl.BlockSpec((len(_OUT_SC), bc), lambda i: (0, i),
                           memory_space=pltpu.VMEM)

    scal2d = jnp.stack([geos_, pblh_, tpert_, lf_]).astype(jnp.float32)
    in_specs = [sp_m, sp_m, sp_m, sp_i, sp_m, sp_m, sp_i, sp_sin]
    ins = (t_, qh_, pap_, paph_, dpp_, zmid_, zi2_, scal2d)

    out_shapes, out_specs = [], []
    for _, kind, dt in _OUT_2D:
        if kind == "m":
            out_shapes.append(jax.ShapeDtypeStruct((pver, ncp), dt))
            out_specs.append(sp_m)
        else:
            out_shapes.append(jax.ShapeDtypeStruct((pver + 1, ncp), dt))
            out_specs.append(sp_i)
    out_shapes.append(jax.ShapeDtypeStruct((len(_OUT_SC), ncp), jnp.float32))
    out_specs.append(sp_sout)

    scratch = [pltpu.VMEM((pver + 1, bc), jnp.float32)
               for _ in range(_N_SCRATCH)]

    def kern(*refs):
        _kernel(cfg, msg, float(delt), refs)

    raw = pl.pallas_call(
        kern, grid=(grid,),
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )(*ins)

    vals = {}
    for (name, kind, dt), v in zip(_OUT_2D, raw[:-1]):
        vals[name] = v.T[:ncol]
    sc = raw[-1]
    for j, (name, kind, dt) in enumerate(_OUT_SC):
        v = sc[j, :ncol]
        if name == "ideep":
            v = v > 0.5
        elif dt == jnp.int32:
            v = jnp.rint(v).astype(jnp.int32)
        vals[name] = v
    return zc.ZMConvOut(**vals)


def zm_convr_dispatch(cfg: ZMConfig, msg: int, t, qh, pap, paph, dpp, zm_,
                      geos, zi_, pblh, tpert, landfrac, delt):
    """zm_convr with automatic Pallas/XLA path selection (ZMConfig.use_pallas:
    'auto' | True | False)."""
    flag = getattr(cfg, "use_pallas", False)
    if flag == "auto":
        on = use_pallas_zm(cfg, t.dtype, delt)
    else:
        on = bool(flag)
        if on and not isinstance(delt, (int, float)):
            # the kernel needs a trace-static delt (float(delt) inside
            # pallas_call would raise ConcretizationTypeError) — fall back
            # to the identical XLA path rather than erroring deep in Mosaic
            on = False
    if on:
        return zm_convr_pallas(cfg, msg, t, qh, pap, paph, dpp, zm_, geos,
                               zi_, pblh, tpert, landfrac, delt)
    return zc.zm_convr(cfg, msg, t, qh, pap, paph, dpp, zm_, geos, zi_,
                       pblh, tpert, landfrac, delt)
