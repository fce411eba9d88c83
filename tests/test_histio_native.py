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
