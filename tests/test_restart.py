"""Checkpoint/restart equivalence: a restored run must continue bitwise
identically to the uninterrupted one (the CAM restart contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.atm_comp import AtmModel, atm_init, atm_step
from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.utils.checkpoint import (restore_checkpoint,
                                                  save_checkpoint)
from cam_nor_physics_tpu.utils.config import FVConfig


def test_restart_bitwise_continuation(tmp_path):
    model = AtmModel.create(32, 16, 6, dt=1800.0,
                            fv_cfg=FVConfig(nsplit=2, nspltrac=1))
    dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                            nq=model.registry.pcnst)
    dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4))
    state = atm_init(model, dyn0, jnp.zeros((16, 32)))
    ncol = 16 * 32
    cam_in = CamIn.zeros(ncol, model.registry.pcnst)
    cam_in = cam_in.replace(shf=jnp.full((ncol,), 5.0))

    step0 = jax.jit(lambda s: atm_step(model, s, cam_in, first_step=True))
    stepn = jax.jit(lambda s: atm_step(model, s, cam_in))

    # uninterrupted: 4 steps
    s = state
    s, _, _ = step0(s)
    s, _, _ = stepn(s)
    save_checkpoint(str(tmp_path / "ck"), s, {"nstep": int(s.nstep)})
    s, _, _ = stepn(s)
    s, _, _ = stepn(s)
    ref = s

    # restored: load at step 2, run the same 2 more steps
    template = jax.tree.map(jnp.zeros_like, ref)
    r = restore_checkpoint(str(tmp_path / "ck"), template)
    r, _, _ = stepn(r)
    r, _, _ = stepn(r)

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_driver_loop_resume(tmp_path):
    """run() -> checkpoint -> fresh run(resume_from=...) continues bitwise
    identically to the uninterrupted driver loop (the full-driver restart
    story, SURVEY §5.3/5.4: recovery = restart from checkpoint)."""
    from cam_nor_physics_tpu.driver import latest_checkpoint, run

    model = AtmModel.create(32, 16, 6, dt=1800.0,
                            fv_cfg=FVConfig(nsplit=2, nspltrac=1))
    dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                            nq=model.registry.pcnst)
    dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4))
    state0 = atm_init(model, dyn0, jnp.zeros((16, 32)))
    ncol = 16 * 32
    cam_in = CamIn.zeros(ncol, model.registry.pcnst)
    cam_in = cam_in.replace(shf=jnp.full((ncol,), 5.0))

    # uninterrupted 4-step run
    ref, _ = run(model, state0, cam_in, 4, out_dir=str(tmp_path / "a"),
                 check_every=0)

    # interrupted: 2 steps with a checkpoint, then resume for 2 more
    mid, _ = run(model, state0, cam_in, 2, out_dir=str(tmp_path / "b"),
                 ckpt_every=2, check_every=0)
    ck = latest_checkpoint(str(tmp_path / "b"))
    assert ck is not None
    template = jax.tree.map(jnp.zeros_like, mid)
    res, _ = run(model, template, cam_in, 2, out_dir=str(tmp_path / "b"),
                 resume_from=ck, check_every=0)

    assert int(res.nstep) == int(ref.nstep)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_injected_nan_structured_abort_and_recovery(tmp_path):
    """Guard-rail subsystem (SURVEY §5.3; umax/NaN sentinels replacing the
    reference's endrun at dyn_comp.F90:996-997): an injected NaN mid-run
    aborts cleanly with an ABORT.json pointing at the last good checkpoint,
    and a restart from that checkpoint continues the integration."""
    import json

    from cam_nor_physics_tpu.driver import BlowupError, run

    model = AtmModel.create(32, 16, 6, dt=1800.0,
                            fv_cfg=FVConfig(nsplit=2, nspltrac=1))
    dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                            nq=model.registry.pcnst)
    dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4))
    state0 = atm_init(model, dyn0, jnp.zeros((16, 32)))
    ncol = 16 * 32
    cam_in = CamIn.zeros(ncol, model.registry.pcnst)
    cam_in = cam_in.replace(shf=jnp.full((ncol,), 5.0))

    out = str(tmp_path / "abort")
    # 2 healthy steps leave a good checkpoint behind
    mid, _ = run(model, state0, cam_in, 2, out_dir=out, ckpt_every=2,
                 check_every=0)

    # poison the state (a physics blow-up feeding back into the dycore)
    bad = mid.replace(dyn=mid.dyn.replace(
        u=mid.dyn.u.at[0, 3, 3].set(jnp.nan)))
    with pytest.raises(BlowupError, match="non-finite"):
        run(model, bad, cam_in, 2, out_dir=out, check_every=1)

    rec = json.load(open(f"{out}/ABORT.json"))
    assert "non-finite" in rec["reason"]
    assert rec["last_good_checkpoint"] is not None
    assert rec["last_good_checkpoint"].endswith("ckpt_000002")

    # recovery: restart from the recorded last-good checkpoint
    template = jax.tree.map(jnp.zeros_like, mid)
    res, _ = run(model, template, cam_in, 2, out_dir=out,
                 resume_from=rec["last_good_checkpoint"], check_every=1)
    assert int(res.nstep) == 4
    assert bool(jnp.isfinite(res.dyn.u).all())


def test_umax_guard_trips():
    """The |u| wind bound sentinel (UMAX_GUARD, dyn_comp.F90:996-997 umax
    contract): a state with super-bound winds trips the guard; a sane one
    passes."""
    from cam_nor_physics_tpu.driver import (BlowupError, UMAX_GUARD,
                                            _check_state)

    model = AtmModel.create(32, 16, 6, dt=1800.0,
                            fv_cfg=FVConfig(nsplit=2, nspltrac=1))
    dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                            nq=model.registry.pcnst)
    dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4))
    good = atm_init(model, dyn0, jnp.zeros((16, 32)))
    _check_state(good, 1)     # no raise
    bad = good.replace(dyn=good.dyn.replace(
        u=good.dyn.u.at[0, 3, 3].set(UMAX_GUARD + 200.0)))
    with pytest.raises(BlowupError, match="exceeds"):
        _check_state(bad, 1)
