"""Thickness-floor activation telemetry (VERDICT r2 item 9).

The 0.05·dp floors in the C/D transport steps and trac2d are guard rails
with no reference counterpart (VALIDATION.md deviation list); a silently
active floor would corrupt mass/tracer fields while per-step conservation
tests still pass. dyn_run counts activations post hoc
(dyn_comp.py::_floor_count); healthy trajectories must count ZERO.
"""

import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
from cam_nor_physics_tpu.models.fv.grid import make_grid
from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
from cam_nor_physics_tpu.utils.config import FVConfig

IM, JM, KM = 48, 32, 8


def _setup():
    grid = make_grid(IM, JM, KM)
    coord = hybrid_coefficients(KM)
    state = hs_initial_state(grid, coord, pert=1.0, dtype=jnp.float64)
    phis = jnp.zeros((JM, IM), jnp.float64)
    return grid, coord, state, phis


def test_healthy_run_no_floor_activations():
    grid, coord, state, phis = _setup()
    cfg = FVConfig()
    total = 0
    for _ in range(5):
        state, diags = dyn_run(state, grid, coord, phis, cfg, 900.0,
                               return_diags=True)
        total += int(diags["floor_activations"])
    assert total == 0, f"{total} floor activations on a healthy trajectory"
    assert np.isfinite(np.asarray(state.delp)).all()


def test_violent_state_detected():
    """Positive control: a strongly convergent 1500 m/s zonal flow drains
    layers (div·dt > 1) within one un-subcycled large step; the counter
    must fire (it is what makes the zero-assertions above meaningful)."""
    grid, coord, state, phis = _setup()
    lat_shape = jnp.sin(jnp.linspace(0, np.pi, JM))[None, :, None]
    x = jnp.linspace(0, 2 * np.pi, IM, endpoint=False)[None, None, :]
    u = 1500.0 * jnp.sin(4.0 * x) * lat_shape
    state = state.replace(u=jnp.broadcast_to(u, state.u.shape)
                          .astype(state.u.dtype))
    cfg = FVConfig(nsplit=1, nspltrac=1)   # no subcycling: div·dt >> 1
    _, diags = dyn_run(state, grid, coord, phis, cfg, 1800.0,
                       return_diags=True)
    assert int(diags["floor_activations"]) > 0
