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
