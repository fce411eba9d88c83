"""Fused-Pallas cd_step (models/fv/cd_pallas.py) equivalence vs the XLA path.

In f64 (CPU, interpret mode) the two paths agree to ~1e-12 relative — the
formulas are identical and the in-kernel DFT-matmul polar filter equals the
rfft filter analytically. In f32 the comparison floor is set by roundoff
amplification through the hydrostatic PGF cancellation (~1e-3 on winds after
one step), which is why the f32 check lives in the TPU-gated suite with
loose wind tolerances (tests/test_pallas_kernels.py pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.fv.cd_core import cd_step
from cam_nor_physics_tpu.models.fv.cd_pallas import cd_step_fused
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients


def _setup(dtype, im=72, jm=46, km=10):
    grid = make_grid(im, jm, km)
    coord = hybrid_coefficients(km)
    phis = jnp.zeros((jm, im), dtype)
    state = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)
    for _ in range(3):
        state, _ = cd_step(state, grid, coord.ptop, phis, 450.0,
                           c_sw_pgf=True, del2_velocity=6e5,
                           use_pallas=False)
    return grid, coord, phis, state


class TestFusedCdStep:
    @pytest.mark.parametrize("dyn_filter", [False, True])
    def test_matches_xla_f64(self, dyn_filter):
        if not jax.config.jax_enable_x64:
            pytest.skip("f64 comparison needs x64")
        dtype = jnp.float64
        grid, coord, phis, state = _setup(dtype)
        ref, dref = cd_step(state, grid, coord.ptop, phis, 450.0,
                            c_sw_pgf=True, dyn_filter=dyn_filter,
                            del2_velocity=6e5, use_pallas=False)
        new, dnew = cd_step_fused(state, grid, coord.ptop, phis, 450.0,
                                  4, 4, 0.08, dyn_filter, "centered", 6e5,
                                  interpret=jax.default_backend() != "tpu")
        # tolerance: the fused path integrates pressure/geopotential with a
        # sequential in-kernel carry (== cumsum([ptop; delp]) association)
        # while the XLA path computes ptop + cumsum(delp); the ~1e-13 f64
        # pkz difference amplifies to ~1e-9 through the PGF's neighbor
        # cancellation in one step (both are valid discretizations; real
        # kernel bugs show up at >1e-3)
        for n in ("u", "v", "pt", "delp"):
            a = np.asarray(getattr(new, n))
            b = np.asarray(getattr(ref, n))
            np.testing.assert_allclose(a, b, rtol=1e-7,
                                       atol=1e-7 * np.abs(b).max())
        for n in ("cx", "cy", "mfx", "mfy", "pe", "pkz", "wz"):
            a, b = np.asarray(dnew[n]), np.asarray(dref[n])
            np.testing.assert_allclose(a, b, rtol=1e-7,
                                       atol=1e-7 * max(np.abs(b).max(),
                                                        1e-12))

    def test_mass_conserved(self):
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        grid, coord, phis, state = _setup(dtype)
        new, _ = cd_step_fused(state, grid, coord.ptop, phis, 450.0,
                               4, 4, 0.08, True, "centered", 6e5,
                               interpret=jax.default_backend() != "tpu")
        w = np.asarray(grid.cosp).copy()
        w[0] = w[-1] = float(grid.acap) / grid.im
        m0 = (np.asarray(state.delp) * w[:, None]).sum()
        m1 = (np.asarray(new.delp) * w[:, None]).sum()
        assert abs(m1 - m0) / m0 < 5e-6


class TestBandedFusedCdStep:
    """J-banded fused path (band_plan forces 3 bands on the small test
    grid) must match the unbanded XLA cd_step: verifies halo isolation of
    the band interiors and pole anchoring at slab edges."""

    def test_banded_matches_xla_f64(self, monkeypatch):
        if not jax.config.jax_enable_x64:
            pytest.skip("f64 comparison needs x64")
        from cam_nor_physics_tpu.ops import pallas_kernels as pk
        dtype = jnp.float64
        grid, coord, phis, state = _setup(dtype)
        # 46x72 slab padded = 48*128 = 6144 cells; cap 4000 -> banded
        monkeypatch.setattr(pk, "_MAX_SLAB_CELLS", 4000)
        plan = pk.band_plan(grid.jm, grid.im)
        assert plan is not None and len(plan) >= 2, plan
        ref, dref = cd_step(state, grid, coord.ptop, phis, 450.0,
                            c_sw_pgf=True, dyn_filter=True,
                            del2_velocity=6e5, use_pallas=False)
        new, dnew = cd_step_fused(state, grid, coord.ptop, phis, 450.0,
                                  4, 4, 0.08, True, "centered", 6e5,
                                  interpret=jax.default_backend() != "tpu")
        # carry-vs-cumsum association tolerance — see TestFusedCdStep note
        for n in ("u", "v", "pt", "delp"):
            a = np.asarray(getattr(new, n))
            b = np.asarray(getattr(ref, n))
            np.testing.assert_allclose(a, b, rtol=1e-7,
                                       atol=1e-7 * np.abs(b).max(),
                                       err_msg=n)
        for n in ("cx", "cy", "mfx", "mfy"):
            a, b = np.asarray(dnew[n]), np.asarray(dref[n])
            np.testing.assert_allclose(a, b, rtol=1e-7,
                                       atol=1e-7 * max(np.abs(b).max(),
                                                        1e-12), err_msg=n)
