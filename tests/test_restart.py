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
