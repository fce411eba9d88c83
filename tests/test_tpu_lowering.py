"""Mosaic lowering smoke for EVERY Pallas kernel family (TPU-gated).

The round-2 regression (BENCH_r02 rc=1) shipped because the CPU suite runs
all Pallas kernels with interpret=True, which never exercises Mosaic
lowering — a TPU-only BlockSpec violation then surfaces first inside the
production step. These tests call `.lower()` with interpret=False on the
real backend for each kernel family; lowering alone (no compile/execute)
is where Mosaic validates block shapes, so this is a seconds-fast gate.

Run with CAM_TPU_TESTS=1 on the bench chip before every snapshot (see
tools/tpu_smoke.sh).
"""

import jax
import jax.numpy as jnp
import pytest

tpu = pytest.mark.skipif(jax.default_backend() != "tpu",
                         reason="Mosaic lowering needs a TPU backend")

IM, JM, KM = 144, 96, 26


def _grid():
    from cam_nor_physics_tpu.models.fv.grid import make_grid
    return make_grid(IM, JM, KM)


def _slab(k, shape=None, lo=0.5, hi=1.5):
    shape = shape or (KM, JM, IM)
    return jax.random.uniform(jax.random.PRNGKey(k), shape, jnp.float32,
                              lo, hi)


@tpu
class TestMosaicLowering:
    def test_fused_cd_step(self):
        """K1..K4 of cd_pallas — the round-2 failure site."""
        from cam_nor_physics_tpu.models.fv.cd_pallas import (
            cd_step_fused, fused_lowering_ok, use_fused_cd)
        from cam_nor_physics_tpu.models.fv.dyn_comp import DynState
        grid = _grid()
        state = DynState(u=_slab(0, lo=-30, hi=30), v=_slab(1, lo=-30, hi=30),
                         pt=_slab(2, lo=250, hi=350), delp=_slab(3, lo=30,
                                                                 hi=50),
                         q=_slab(4, (2, KM, JM, IM), 0.0, 1e-2))
        phis = jnp.zeros((JM, IM), jnp.float32)
        assert use_fused_cd(grid, True, True, "upwind", "dft", False)
        taper = jnp.linspace(0.2, 0.0, KM, dtype=jnp.float32)
        # both taper and no-taper operand layouts must lower
        for div_taper in (None, taper):
            assert fused_lowering_ok(state, grid, 2.0, phis, 225.0, 4, 4,
                                     0.005, True, "upwind", 0.0, True, 0.0,
                                     div_taper), \
                "fused cd_step no longer lowers on TPU"
            jax.jit(lambda s, g, p: cd_step_fused(
                s, g, 2.0, p, 225.0, 4, 4, 0.005, True, "upwind", 0.0,
                div2_on=True, div4_coef_nd=2.5e-3 if div_taper is None
                else 0.0, div_taper=div_taper)).lower(state, grid, phis)

    def test_transport_kernels(self):
        from cam_nor_physics_tpu.ops import tp_core as tp
        from cam_nor_physics_tpu.ops.pallas_kernels import (transport3d,
                                                            tracer_div3d,
                                                            vort_flux3d)
        grid = _grid()
        delp, pt = _slab(0, lo=30, hi=50), _slab(1, lo=250, hi=350)
        crx, cry = _slab(2, lo=-0.9, hi=0.9), _slab(3, lo=-0.5, hi=0.5)
        yfx = cry * jnp.asarray(grid.cose)[:, None]
        va = 0.5 * (cry + tp.edge_north(cry))
        ffsl = jnp.max(jnp.abs(crx), axis=-1) > 1.0
        cosp = jnp.asarray(grid.cosp)
        acosp = jnp.asarray(grid.acosp)
        jax.jit(lambda *a: transport3d(*a, rcap=grid.rcap, iord=4, jord=4,
                                       prefer_pallas=True)).lower(
            delp, pt, crx, cry, yfx, va, ffsl, cosp, acosp)
        jax.jit(lambda *a: vort_flux3d(*a, iord=4, jord=4,
                                       prefer_pallas=True)).lower(
            delp, crx, cry, crx, cry, ffsl, cosp)
        jax.jit(lambda *a: tracer_div3d(*a, rcap=grid.rcap, iord=4, jord=4,
                                        prefer_pallas=True)).lower(
            jnp.stack([pt, pt]), delp, crx, cry, yfx, va, ffsl, cosp, acosp)

    def test_remap_kernel(self):
        from cam_nor_physics_tpu.ops.remap_pallas import (
            te_map_remap_pallas, use_pallas_remap)
        ncol = JM * IM
        assert use_pallas_remap(ncol)
        pe = jnp.cumsum(_slab(0, (KM + 1, ncol), 1.0, 2.0), axis=0)
        pt = _slab(1, (KM, ncol), 250.0, 350.0)
        u = _slab(2, (KM, ncol), -30.0, 30.0)
        jax.jit(lambda pe_, pt_, u_: te_map_remap_pallas(
            pe_, pe_, pe_, pe_, pe_, pe_, [pt_], u_, u_, 4)).lower(pe, pt, u)

    def test_zm_tail_kernel(self):
        from cam_nor_physics_tpu.models.physics.zm_tail_pallas import (
            zm_tail_pallas)
        from cam_nor_physics_tpu.utils.config import ZMConfig
        ncol, pver = 512, KM
        f = lambda k, lo, hi, shape=(ncol, pver): _slab(k, shape, lo, hi)
        cfg = ZMConfig()
        jti = jnp.full((ncol,), 5, jnp.int32)
        mxi = jnp.full((ncol,), pver - 2, jnp.int32)
        jax.jit(lambda t, q, pm, pd, u, v, tr, cld, mu, md, du, eu, ed, dp:
                zm_tail_pallas(cfg, t, q, pm, pd, u, v, tr, cld, mu, md, du,
                               eu, ed, dp, jti, mxi,
                               f(20, 0, 1e-7), jnp.zeros((ncol,)),
                               jnp.ones((ncol,)), 1800.0)).lower(
            f(0, 250, 320), f(1, 1e-6, 1e-2), f(2, 100e2, 1000e2),
            f(3, 10e2, 50e2), f(4, -30, 30), f(5, -30, 30),
            f(6, 0, 1e-5, (ncol, pver, 2)), f(7, 0, 0.3),
            f(8, 0, 0.02), f(9, -0.01, 0), f(10, 0, 1e-4), f(11, 0, 1e-4),
            f(12, 0, 1e-4), f(13, 5, 40))
