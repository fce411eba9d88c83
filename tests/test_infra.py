"""Infrastructure tests: history registry/accumulation/NetCDF writer,
checkpoint round trip, phase timer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.utils.checkpoint import (read_meta,
                                                  restore_checkpoint,
                                                  save_checkpoint)
from cam_nor_physics_tpu.utils.history import (HistoryRegistry,
                                               default_registry_atm,
                                               history_resolve, outfld,
                                               outfld_many,
                                               write_history_netcdf)
from cam_nor_physics_tpu.utils.timing import PhaseTimer


class TestHistory:
    def test_accumulate_and_average(self):
        reg = default_registry_atm()
        buf = reg.buffer(10, 4)
        buf = outfld(buf, "T", jnp.full((10, 4), 280.0))
        buf = outfld(buf, "T", jnp.full((10, 4), 290.0))
        buf = outfld(buf, "NOT_DECLARED", jnp.zeros((10,)))  # silently ignored
        vals = history_resolve(reg, buf)
        np.testing.assert_allclose(vals["T"], 285.0)

    def test_outfld_is_jit_safe(self):
        reg = default_registry_atm()
        buf = reg.buffer(10, 4)

        @jax.jit
        def step(buf):
            return outfld_many(buf, {"T": jnp.full((10, 4), 300.0),
                                     "PS": jnp.full((10,), 1e5)})

        buf = step(buf)
        vals = history_resolve(reg, buf)
        np.testing.assert_allclose(vals["T"], 300.0)
        np.testing.assert_allclose(vals["PS"], 1e5)

    def test_duplicate_addfld_rejected(self):
        reg = HistoryRegistry()
        reg.addfld("X", "1", "x")
        with pytest.raises(ValueError):
            reg.addfld("X", "1", "x again")

    def test_netcdf_writer(self, tmp_path):
        reg = default_registry_atm()
        jm, im, pver = 8, 12, 4
        buf = reg.buffer(jm * im, pver)
        buf = outfld(buf, "T", jnp.full((jm * im, pver), 285.0))
        buf = outfld(buf, "PS", jnp.full((jm * im,), 1.0e5))
        path = str(tmp_path / "h0.nc")
        lats = np.linspace(-np.pi / 2, np.pi / 2, jm)
        lons = np.linspace(-np.pi, np.pi, im, endpoint=False)
        write_history_netcdf(path, reg, buf, lats, lons, pver, 2.0)
        from scipy.io import netcdf_file
        with netcdf_file(path, "r") as nc:
            assert nc.variables["T"].shape == (1, pver, jm, im)
            np.testing.assert_allclose(nc.variables["PS"][0], 1e5)


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        state = {"a": jnp.arange(6.0).reshape(2, 3),
                 "b": (jnp.zeros((4,)), jnp.ones((2, 2), jnp.int32))}
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, {"nstep": 7})
        template = jax.tree.map(jnp.zeros_like, state)
        restored = restore_checkpoint(path, template)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert read_meta(path)["nstep"] == 7

    def test_shape_mismatch_rejected(self, tmp_path):
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, {"a": jnp.zeros((3,))})
        with pytest.raises(ValueError):
            restore_checkpoint(path, {"a": jnp.zeros((4,))})


class TestTimer:
    def test_regions_accumulate(self):
        t = PhaseTimer()
        f = jax.jit(lambda x: x * 2)
        for _ in range(3):
            t.timed("double", f, jnp.ones((8,)))
        assert t.counts["double"] == 3
        assert "double" in t.table()


class TestCheckTracers:
    def test_mass_bookkeeping(self):
        from cam_nor_physics_tpu.models.physics.check_tracers import (
            check_tracers_chng, check_tracers_init)
        from cam_nor_physics_tpu.models.physics.state import \
            make_state_from_profiles
        from cam_nor_physics_tpu.utils import constants as c
        ncol, pver, pcnst = 3, 6, 2
        pint = jnp.broadcast_to(jnp.linspace(1e4, 1e5, pver + 1),
                                (ncol, pver + 1))
        q = jnp.full((ncol, pver, pcnst), 1e-4)
        st = make_state_from_profiles(pint, jnp.full((ncol, pver), 270.0),
                                      jnp.zeros((ncol, pver)),
                                      jnp.zeros((ncol, pver)), q,
                                      jnp.zeros((ncol,)))
        tr = check_tracers_init(st)
        # unchanged state -> zero residual
        tr, resid = check_tracers_chng(st, tr)
        np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-18)
        # add surface flux over dt; change q consistently
        dt, flux = 1800.0, 2e-7
        dq = flux * dt * c.GRAVIT / np.asarray(st.pdel[:, -1])
        st2 = st.replace(q=st.q.at[:, -1, 0].add(jnp.asarray(dq)))
        cflx = jnp.zeros((ncol, pcnst)).at[:, 0].set(flux)
        tr, resid = check_tracers_chng(st2, tr, cflx, dt)
        np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-12)
