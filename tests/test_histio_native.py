"""Native async history writer: build, round trip, async semantics."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.utils.history import default_registry_atm, outfld
from cam_nor_physics_tpu.utils.histio_native import (AsyncHistoryWriter,
                                                     build_native)


@pytest.fixture(scope="module")
def writer_setup():
    reg = default_registry_atm()
    jm, im, pver = 8, 12, 4
    lats = np.linspace(-np.pi / 2, np.pi / 2, jm)
    lons = np.linspace(-np.pi, np.pi, im, endpoint=False)
    return reg, lats, lons, jm, im, pver


def _fill(reg, jm, im, pver):
    buf = reg.buffer(jm * im, pver)
    buf = outfld(buf, "T", jnp.full((jm * im, pver), 285.0))
    buf = outfld(buf, "PS", jnp.arange(jm * im, dtype=jnp.float64))
    return buf


class TestNativeHistIO:
    def test_builds(self):
        assert build_native()

    def test_round_trip_native(self, writer_setup, tmp_path):
        reg, lats, lons, jm, im, pver = writer_setup
        w = AsyncHistoryWriter(reg, lats, lons, pver)
        assert w.native
        buf = _fill(reg, jm, im, pver)
        p = str(tmp_path / "h0.nc")
        w.write(p, buf, 3.25)
        w.flush()
        from scipy.io import netcdf_file
        with netcdf_file(p, "r") as nc:
            assert nc.variables["T"].shape == (1, pver, jm, im)
            np.testing.assert_allclose(float(nc.variables["T"][0].mean()),
                                       285.0, rtol=1e-6)
            np.testing.assert_allclose(nc.variables["PS"][0].ravel(),
                                       np.arange(jm * im), rtol=1e-6)
            np.testing.assert_allclose(float(nc.variables["time"][0]), 3.25)
        w.close()

    def test_many_async_writes_all_land(self, writer_setup, tmp_path):
        reg, lats, lons, jm, im, pver = writer_setup
        w = AsyncHistoryWriter(reg, lats, lons, pver)
        buf = _fill(reg, jm, im, pver)
        paths = [str(tmp_path / f"h{i}.nc") for i in range(8)]
        for i, p in enumerate(paths):
            w.write(p, buf, float(i))
        w.flush()
        assert w.pending() == 0
        for p in paths:
            assert os.path.getsize(p) > 0
        w.close()

    def test_fallback_matches_scipy_path(self, writer_setup, tmp_path):
        reg, lats, lons, jm, im, pver = writer_setup
        w = AsyncHistoryWriter(reg, lats, lons, pver, try_native=False)
        assert not w.native
        buf = _fill(reg, jm, im, pver)
        p = str(tmp_path / "h0.nc")
        w.write(p, buf, 1.0)
        from scipy.io import netcdf_file
        with netcdf_file(p, "r") as nc:
            assert nc.variables["T"].shape == (1, pver, jm, im)


class TestStaggeredAndFlags:
    """Staggered-grid fields (US/VS, dyn_comp.F90:676-684 addflds), X/M
    avgflags, and multi-tape buffers."""

    def _reg(self):
        from cam_nor_physics_tpu.utils.history import HistoryRegistry
        r = HistoryRegistry()
        r.addfld("US", "m/s", "Zonal wind, staggered",
                 gridname="fv_u_stagger")
        r.addfld("VS", "m/s", "Meridional wind, staggered",
                 gridname="fv_v_stagger")
        r.addfld("TMX", "K", "Max temperature", avgflag="X")
        r.addfld("TMN", "K", "Min temperature", avgflag="M")
        r.addfld("T", "K", "Temperature")
        for n in ("US", "VS", "TMX", "TMN", "T"):
            r.add_default(n)
        r.add_default("T", tape=1)
        return r

    def test_staggered_round_trip_both_writers(self, tmp_path):
        reg = self._reg()
        jm, im, pver = 8, 12, 4
        lats = np.linspace(-np.pi / 2, np.pi / 2, jm)
        lons = np.linspace(-np.pi, np.pi, im, endpoint=False)
        buf = reg.buffer(jm * im, pver, jm=jm, im=im)
        us = np.arange(pver * (jm - 1) * im, dtype=float).reshape(
            pver, jm - 1, im)
        vs = np.ones((pver, jm, im))
        buf = outfld(buf, "US", jnp.asarray(us), reg)
        buf = outfld(buf, "VS", jnp.asarray(vs), reg)
        from scipy.io import netcdf_file
        for native in (True, False):
            w = AsyncHistoryWriter(reg, lats, lons, pver, try_native=native)
            p = str(tmp_path / f"hs_{int(native)}.nc")
            w.write(p, buf, 0.5)
            w.flush()
            w.close()
            with netcdf_file(p, "r") as nc:
                assert nc.variables["US"].shape == (1, pver, jm - 1, im)
                assert nc.variables["VS"].shape == (1, pver, jm, im)
                np.testing.assert_allclose(nc.variables["US"][0], us,
                                           rtol=1e-6)
                slat = nc.variables["slat"][:]
                assert len(slat) == jm - 1
                np.testing.assert_allclose(
                    slat, np.degrees(0.5 * (lats[:-1] + lats[1:])),
                    rtol=1e-6)
                np.testing.assert_allclose(
                    nc.variables["slon"][:],
                    np.degrees(lons - 0.5 * (lons[1] - lons[0])), atol=1e-6)

    def test_max_min_avgflags(self):
        from cam_nor_physics_tpu.utils.history import history_resolve
        reg = self._reg()
        jm, im, pver = 4, 6, 3
        buf = reg.buffer(jm * im, pver, jm=jm, im=im)
        for val in (280.0, 295.0, 260.0):
            t = jnp.full((jm * im, pver), val)
            buf = outfld(buf, "TMX", t, reg)
            buf = outfld(buf, "TMN", t, reg)
            buf = outfld(buf, "T", t, reg)
        out = history_resolve(reg, buf)
        np.testing.assert_allclose(out["TMX"], 295.0)
        np.testing.assert_allclose(out["TMN"], 260.0)
        np.testing.assert_allclose(out["T"], (280.0 + 295.0 + 260.0) / 3)

    def test_multi_tape_buffers_are_independent(self):
        reg = self._reg()
        jm, im, pver = 4, 6, 3
        b0 = reg.buffer(jm * im, pver, tape=0, jm=jm, im=im)
        b1 = reg.buffer(jm * im, pver, tape=1, jm=jm, im=im)
        assert set(b1) == {"T"}
        assert "US" in b0 and "TMX" in b0
