"""Coupled-run history tape breadth (VERDICT r2 item 5 done-criterion):
drive the full driver for several steps and read back a CAM-convention h0
NetCDF tape carrying the AMWG core set (>= 100 fields), with a per-field
value spot-check of a representative subset.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.io import netcdf_file

from cam_nor_physics_tpu.driver import run
from cam_nor_physics_tpu.models.atm_comp import AtmModel, atm_init
from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.utils.config import FVConfig

IM, JM, KM = 32, 16, 6


@pytest.fixture(scope="module")
def tape(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hist"))
    model = AtmModel.create(IM, JM, KM, dt=1800.0,
                            fv_cfg=FVConfig(nsplit=2, nspltrac=1))
    dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                            nq=model.registry.pcnst)
    dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4))
    state0 = atm_init(model, dyn0, jnp.zeros((JM, IM)))
    ncol = JM * IM
    cam_in = CamIn.zeros(ncol, model.registry.pcnst).replace(
        shf=jnp.full((ncol,), 5.0), lhf=jnp.full((ncol,), 20.0),
        landfrac=jnp.full((ncol,), 0.3))
    run(model, state0, cam_in, 4, out_dir=out, hist_every=4, check_every=0)
    import glob
    paths = sorted(glob.glob(out + "/h0.*.nc"))
    assert paths, "driver wrote no h0 tape"
    return paths[-1]


def test_amwg_field_count(tape):
    with netcdf_file(tape, "r", mmap=False) as nc:
        names = [n for n in nc.variables
                 if n not in ("time", "lat", "lon", "slat", "slon", "lev",
                              "ilev")]
        assert len(names) >= 100, \
            f"h0 carries {len(names)} fields, expected >= 100"


def test_representative_values(tape):
    with netcdf_file(tape, "r", mmap=False) as nc:
        def get(n):
            return np.array(nc.variables[n][:], np.float64)

        t = get("T")
        assert t.shape[-3:] == (KM, JM, IM)
        assert np.isfinite(t).all() and (150 < t).all() and (t < 350).all()
        ps = get("PS")
        assert (5e4 < ps).all() and (ps < 1.2e5).all()
        # layer masses integrate to surface pressure
        pdel = get("PDEL")
        np.testing.assert_allclose(pdel.sum(axis=-3) + get("PINT")[:, 0],
                                   ps, rtol=1e-5)
        # slices agree with in-range physics
        t850 = get("T850")
        assert (200 < t850).all() and (t850 < 330).all()
        # moments consistent: UU >= U^2 is false pointwise, but UU >= 0
        assert (get("UU") >= 0).all() and (get("VV") >= 0).all()
        # RH in percent; the uniform synthetic q supersaturates the cold HS
        # top layers, so only positivity + the warm lower troposphere are
        # bounded
        rh = get("RELHUM")
        assert np.isfinite(rh).all() and (rh >= 0).all()
        assert (rh[..., -1, :, :] < 130).all()
        # surface fluxes pass through from cam_in
        np.testing.assert_allclose(get("SHFLX"), 5.0, rtol=1e-6)
        np.testing.assert_allclose(get("LHFLX"), 20.0, rtol=1e-6)
        np.testing.assert_allclose(get("LANDFRAC"), 0.3, rtol=1e-6)
        # before/after-physics snapshots bracket the tendency identity;
        # atol covers f32 rounding of the T snapshots (eps(300 K)/dt ~ 2e-8
        # per sample) on these ~1e-6 K/s tendencies
        pttend = get("PTTEND")
        tbp, tap = get("TBP"), get("TAP")
        np.testing.assert_allclose(pttend, (tap - tbp) / 1800.0,
                                   rtol=1e-4, atol=2e-7)
