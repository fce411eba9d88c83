"""Pallas TPU kernel equivalence vs the XLA (jnp) path.

The fused per-level transport/vorticity kernels (ops/pallas_kernels.py)
execute the same tp_core math on VMEM-resident slabs as the vmapped jnp
formulation; on stress fields (random near-CFL Courants activating every
FFSL branch) they agree to f32 roundoff (fma/contraction-order ULPs), and
on real dyn_run fields they measured bitwise-identical over 3 large steps. The ZM mega-kernel

These tests need a real TPU backend (Mosaic does not target CPU) and skip
elsewhere — the CPU suite covers the identical jnp fallback everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.ops import tp_core as tp
from cam_nor_physics_tpu.ops.pallas_kernels import (transport3d,
                                                    tracer_div3d, use_pallas,
                                                    vort_flux3d)

tpu = pytest.mark.skipif(jax.default_backend() != "tpu",
                         reason="Pallas TPU kernels need a TPU backend")


def _fields(im=144, jm=96, km=26, dtype=jnp.float32):
    grid = make_grid(im, jm, km)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    delp = jax.random.uniform(ks[0], (km, jm, im), dtype, 0.5, 1.5)
    pt = jax.random.uniform(ks[1], (km, jm, im), dtype, 250.0, 350.0)
    crx = jax.random.uniform(ks[2], (km, jm, im), dtype, -0.9, 0.9)
    cry = jax.random.uniform(ks[3], (km, jm, im), dtype, -0.5, 0.5)
    yfx = cry * jnp.asarray(grid.cose)[:, None]
    va = 0.5 * (cry + tp.edge_north(cry))
    ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0
    return grid, delp, pt, crx, cry, yfx, va, ffsl


@tpu
class TestPallasTransport:
    def test_transport3d_roundoff(self):
        grid, delp, pt, crx, cry, yfx, va, ffsl = _fields()
        cosp = jnp.asarray(grid.cosp)
        acosp = jnp.asarray(grid.acosp)
        args = (delp, pt, crx, cry, yfx, va, ffsl, cosp, acosp,
                grid.rcap, 4, 4)
        a = jax.jit(lambda: transport3d(*args, prefer_pallas=True))()
        b = jax.jit(lambda: transport3d(*args, prefer_pallas=False))()
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-5, atol=1e-6)

    def test_vort_flux3d_roundoff(self):
        grid, delp, pt, crx, cry, yfx, va, ffsl = _fields()
        cosp = jnp.asarray(grid.cosp)
        zeta = jax.random.normal(jax.random.PRNGKey(7), delp.shape,
                                 delp.dtype)
        args = (zeta, crx, cry, crx * 450.0, cry * 450.0, ffsl, cosp, 4, 4)
        a = jax.jit(lambda: vort_flux3d(*args, prefer_pallas=True))()
        b = jax.jit(lambda: vort_flux3d(*args, prefer_pallas=False))()
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-5, atol=1e-6)

    def test_tracer_div3d_roundoff(self):
        grid, delp, pt, crx, cry, yfx, va, ffsl = _fields()
        cosp = jnp.asarray(grid.cosp)
        acosp = jnp.asarray(grid.acosp)
        q = jax.random.uniform(jax.random.PRNGKey(9),
                               (3,) + delp.shape, delp.dtype, 0.0, 1e-2)
        args = (q, crx, cry, crx, yfx, va, ffsl, cosp, acosp,
                grid.rcap, 4, 4)
        a = jax.jit(lambda: tracer_div3d(*args, prefer_pallas=True))()
        b = jax.jit(lambda: tracer_div3d(*args, prefer_pallas=False))()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-8)

    def test_slab_cap_falls_back(self):
        # single slabs beyond the VMEM cap must report unusable (callers
        # consult band_plan instead of falling back blindly)
        from cam_nor_physics_tpu.ops.pallas_kernels import _MAX_SLAB_CELLS
        assert use_pallas(_MAX_SLAB_CELLS + 1) is False


@tpu
class TestBandedWrappers:
    """J-banded dispatch equivalence, CPU-runnable: interpret-mode
    pallas_call with a monkeypatched VMEM cap forcing >= 2 bands. Verifies
    halo isolation (interior bands) and pole anchoring (edge bands) of the
    band plan against the whole-slab XLA path in f64."""

    def _patched(self, monkeypatch):
        from cam_nor_physics_tpu.ops import pallas_kernels as pk
        monkeypatch.setattr(pk, "_INTERPRET",
                            jax.default_backend() != "tpu")
        monkeypatch.setattr(pk, "use_pallas", lambda *a: True)
        monkeypatch.setattr(pk, "_MAX_SLAB_CELLS", 4000)
        return pk

    def test_band_plan_shapes(self):
        from cam_nor_physics_tpu.ops.pallas_kernels import _HALO, band_plan
        plan = band_plan(192, 288, max_cells=20000)
        assert plan[0][2] == 0 and plan[-1][3] == 192   # poles at slab edges
        for lo, hi, slo, shi in plan:
            assert slo <= max(lo - _HALO, 0) and shi >= min(hi + _HALO, 192)
        assert [p[0] for p in plan] + [192] == \
            [0] + [p[1] for p in plan]                   # seamless cover
        assert band_plan(96, 144) is None    # fits the default cap whole
        assert band_plan(128, 4000, max_cells=20000) == []

    @pytest.mark.parametrize("ffsl_band", [None, 7])
    def test_transport3d_banded(self, monkeypatch, ffsl_band):
        pk = self._patched(monkeypatch)
        grid, delp, pt, crx, cry, yfx, va, ffsl = _fields(im=72, jm=46,
                                                          km=4)
        if jax.config.jax_enable_x64:
            delp, pt, crx, cry, yfx, va = (a.astype(jnp.float64)
                                           for a in (delp, pt, crx, cry,
                                                     yfx, va))
        # activate FFSL rows near both poles
        crx = crx.at[:, :3].mul(3.0).at[:, -3:].mul(3.0)
        ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0
        cosp = jnp.asarray(grid.cosp, delp.dtype)
        acosp = jnp.asarray(grid.acosp, delp.dtype)
        args = (delp, pt, crx, cry, yfx, va, ffsl, cosp, acosp,
                grid.rcap, 4, 4)
        assert pk.band_plan(46, 72) is not None
        a = pk.transport3d(*args, prefer_pallas=True, band=ffsl_band)
        b = pk.transport3d(*args, prefer_pallas=False, band=ffsl_band)
        tol = dict(rtol=1e-12, atol=1e-12) if jax.config.jax_enable_x64 \
            else dict(rtol=2e-5, atol=1e-5)
        for n, (x, y) in zip(("ddp", "dpt", "mfx", "mfy"), zip(a, b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       err_msg=n, **tol)

    def test_tracer_div3d_banded(self, monkeypatch):
        pk = self._patched(monkeypatch)
        grid, delp, pt, crx, cry, yfx, va, ffsl = _fields(im=72, jm=46,
                                                          km=4)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        crx = crx.astype(dtype)
        cry, yfx, va = (a.astype(dtype) for a in (cry, yfx, va))
        ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0
        q = jax.random.uniform(jax.random.PRNGKey(9),
                               (3,) + delp.shape, dtype, 0.0, 1e-2)
        cosp = jnp.asarray(grid.cosp, dtype)
        acosp = jnp.asarray(grid.acosp, dtype)
        args = (q, crx, cry, crx, yfx, va, ffsl, cosp, acosp,
                grid.rcap, 4, 4)
        a = pk.tracer_div3d(*args, prefer_pallas=True, band=7)
        b = pk.tracer_div3d(*args, prefer_pallas=False, band=7)
        tol = dict(rtol=1e-12, atol=1e-14) if jax.config.jax_enable_x64 \
            else dict(rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)

    def test_vort_flux3d_banded(self, monkeypatch):
        pk = self._patched(monkeypatch)
        grid, delp, pt, crx, cry, yfx, va, ffsl = _fields(im=72, jm=46,
                                                          km=4)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        crx, cry = crx.astype(dtype), cry.astype(dtype)
        ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0
        zeta = jax.random.normal(jax.random.PRNGKey(7), delp.shape, dtype)
        cosp = jnp.asarray(grid.cosp, dtype)
        args = (zeta, crx, cry, crx * 450.0, cry * 450.0, ffsl, cosp, 4, 4)
        a = pk.vort_flux3d(*args, prefer_pallas=True, band=7)
        b = pk.vort_flux3d(*args, prefer_pallas=False, band=7)
        tol = dict(rtol=1e-12, atol=1e-12) if jax.config.jax_enable_x64 \
            else dict(rtol=2e-5, atol=1e-6)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), **tol)
