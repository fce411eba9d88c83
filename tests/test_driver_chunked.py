"""Chunked driver loop (run(..., chunk=K)): lax.scan over K coupled steps
per dispatch must reproduce the step-by-step loop — state AND history
tapes. The scan body is the same traced atm_step, but XLA fuses the scan
body slightly differently than the standalone step, so equality is to
f64 roundoff (~1 ulp on <1% of elements per few steps), not bitwise."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Big-compile tests: serialized onto one xdist worker (--dist loadgroup) so
# concurrent XLA CPU compiles don't abort under memory pressure (observed
# 'Fatal Python error: Aborted' inside backend_compile_and_load when four
# workers compiled coupled-step graphs simultaneously).
pytestmark = pytest.mark.xdist_group("heavy")

from cam_nor_physics_tpu.driver import run
from cam_nor_physics_tpu.models.atm_comp import AtmModel, atm_init
from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.utils.config import FVConfig


@pytest.fixture(scope="module")
def setup():
    model = AtmModel.create(32, 16, 6, dt=1800.0,
                            fv_cfg=FVConfig(nsplit=2, nspltrac=1))
    dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                            nq=model.registry.pcnst)
    dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4))
    state0 = atm_init(model, dyn0, jnp.zeros((16, 32)))
    ncol = 16 * 32
    cam_in = CamIn.zeros(ncol, model.registry.pcnst)
    cam_in = cam_in.replace(shf=jnp.full((ncol,), 5.0))
    return model, state0, cam_in


def _assert_tree_equal(a, b, rtol=1e-12, atol=1e-15):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_chunked_state_matches(setup, tmp_path):
    model, state0, cam_in = setup
    ref, _ = run(model, state0, cam_in, 6, out_dir=str(tmp_path / "a"),
                 check_every=0)
    chk, _ = run(model, state0, cam_in, 6, out_dir=str(tmp_path / "b"),
                 check_every=0, chunk=3)
    assert int(chk.nstep) == int(ref.nstep) == 6
    _assert_tree_equal(ref, chk)


def test_chunked_partial_tail(setup, tmp_path):
    """nsteps not a multiple of chunk: the tail chunk is shorter."""
    model, state0, cam_in = setup
    ref, _ = run(model, state0, cam_in, 5, out_dir=str(tmp_path / "a"),
                 check_every=0)
    chk, _ = run(model, state0, cam_in, 5, out_dir=str(tmp_path / "b"),
                 check_every=0, chunk=4)
    _assert_tree_equal(ref, chk)


def test_chunked_history_tapes_match(setup, tmp_path):
    """History accumulated INSIDE the scan matches the per-step loop's
    tape. Read with scipy.io.netcdf_file — the writer's own backend, so
    the test always executes (netCDF4 is not installed here and an
    importorskip silently skipped the only coverage of in-scan history).

    Equality is NOT bitwise in general: the scan body fuses differently
    than the standalone step, so derived diagnostics (notably the p-level
    slices, whose bracketing-index selection can flip on a 1-ulp pmid
    difference) re-round differently when the payload is computed in f32.
    Under this suite's f64-compute + f32-tape configuration the measured
    difference is exactly zero; the tolerances below (1e-4 relative plus a
    per-field scale-relative atol guard for near-zero elements) are the
    f32 re-fusion envelope, not a bitwise claim."""
    from scipy.io import netcdf_file

    model, state0, cam_in = setup
    run(model, state0, cam_in, 4, out_dir=str(tmp_path / "a"),
        hist_every=4, check_every=0)
    run(model, state0, cam_in, 4, out_dir=str(tmp_path / "b"),
        hist_every=4, check_every=0, chunk=2)
    fa = sorted(glob.glob(str(tmp_path / "a" / "h0.*.nc")))
    fb = sorted(glob.glob(str(tmp_path / "b" / "h0.*.nc")))
    assert len(fa) == len(fb) == 1
    with netcdf_file(fa[0], mmap=False) as da, \
            netcdf_file(fb[0], mmap=False) as db:
        assert set(da.variables) == set(db.variables)
        checked = 0
        for name in da.variables:
            va = np.asarray(da.variables[name].data, dtype=np.float64)
            vb = np.asarray(db.variables[name].data, dtype=np.float64)
            scale = np.abs(va).max() if va.size else 0.0
            np.testing.assert_allclose(
                va, vb, rtol=1e-4, atol=1e-5 * max(scale, 1e-30),
                err_msg=name)
            checked += 1
        assert checked > 100


def test_chunked_cadence_validation(setup, tmp_path):
    model, state0, cam_in = setup
    with pytest.raises(ValueError, match="multiple of chunk"):
        run(model, state0, cam_in, 4, out_dir=str(tmp_path / "x"),
            hist_every=3, check_every=0, chunk=2)
    with pytest.raises(ValueError, match="multiple of chunk"):
        run(model, state0, cam_in, 4, out_dir=str(tmp_path / "y"),
            ckpt_every=3, check_every=0, chunk=2)


def test_chunked_sentinel_abort(setup, tmp_path):
    """Blow-up inside a chunk produces the structured abort record at the
    chunk boundary, and the per-step flags accumulated inside the scan
    localize the EXACT diverging step (round-4 VERDICT #10): the NaN is in
    the initial state, so step 1 is the first failing step, even though
    detection happens at the check boundary (step 2)."""
    import json

    from cam_nor_physics_tpu.driver import BlowupError

    model, state0, cam_in = setup
    bad = state0.replace(dyn=state0.dyn.replace(
        u=state0.dyn.u.at[0, 4, 4].set(jnp.nan)))
    with pytest.raises(BlowupError):
        run(model, bad, cam_in, 4, out_dir=str(tmp_path / "z"),
            check_every=2, chunk=2)
    with open(str(tmp_path / "z" / "ABORT.json")) as f:
        rec = json.load(f)
    assert rec["exact"] is True
    assert rec["failed_step"] == 1          # exact first diverging step
    assert rec["detected_step"] == 2        # the check boundary that fired
    assert rec["failed_within"] == [0, 1]


def test_chunked_sentinel_abort_midrun(setup, tmp_path):
    """Exact localization when the divergence starts mid-run: healthy steps
    1..2 pass a clean check (clearing the flag backlog), then a NaN forced
    into the state before the next chunk is localized to step 3 while
    detection is at boundary 4."""
    import json

    from cam_nor_physics_tpu import driver as drv

    model, state0, cam_in = setup
    # run 2 clean steps, then poison the state and continue chunked
    mid, _ = run(model, state0, cam_in, 2, out_dir=str(tmp_path / "m"),
                 check_every=2, chunk=2)
    bad = mid.replace(dyn=mid.dyn.replace(
        u=mid.dyn.u.at[0, 4, 4].set(jnp.nan)))
    with pytest.raises(drv.BlowupError):
        run(model, bad, cam_in, 2, out_dir=str(tmp_path / "z2"),
            check_every=2, chunk=2)
    with open(str(tmp_path / "z2" / "ABORT.json")) as f:
        rec = json.load(f)
    assert rec["exact"] is True
    # run() counts its own steps from 1; the first step of this resumed run
    # is the first failing one
    assert rec["failed_step"] == 1
    assert rec["detected_step"] == 2
