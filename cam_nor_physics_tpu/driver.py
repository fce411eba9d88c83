"""Run driver — the `cam` main-program equivalent.

Wires the coupled step (models/atm_comp.py) to the operational subsystems:
history tapes (utils/history.py + the native async writer), checkpoints
(utils/checkpoint.py), phase timing (utils/timing.py), and blow-up sentinels
(SURVEY §5.3: NaN/umax guards instead of the reference's endrun aborts).

`run(...)` integrates nsteps, emitting history every `hist_every` steps and a
checkpoint every `ckpt_every`, and returns the final state plus the timing
table. It is a host-side loop around one jitted step — the idiomatic JAX
driver shape (step compiled once; IO and control on host between steps).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .models.atm_comp import AtmModel, AtmState, atm_init, atm_step
from .models.coupling.camsrfexch import CamIn
from .models.physics.cam_diagnostics import (diag_export, diag_phys_writeout,
                                             diag_register, diag_surf)
from .utils.checkpoint import save_checkpoint
from .utils.history import default_registry_atm, outfld_many
from .utils.histio_native import AsyncHistoryWriter
from .utils.timing import PhaseTimer

UMAX_GUARD = 300.0        # m/s wind sanity bound (dyn_comp.F90:996-997)


class BlowupError(RuntimeError):
    """Model state failed the finite/range sentinels (the structured
    replacement for the reference's collective endrun abort)."""


def _check_state(state: AtmState, nstep: int) -> None:
    u = state.dyn.u
    if not bool(jnp.isfinite(u).all() & jnp.isfinite(state.dyn.pt).all()):
        raise BlowupError(f"non-finite dycore state at step {nstep}")
    umax = float(jnp.abs(u).max())
    if umax > UMAX_GUARD:
        raise BlowupError(f"|u|max={umax:.1f} m/s exceeds {UMAX_GUARD} "
                          f"at step {nstep}")


def run(model: AtmModel, state: AtmState, cam_in: CamIn, nsteps: int,
        out_dir: str = "output", hist_every: int = 0, ckpt_every: int = 0,
        check_every: int = 10):
    """Integrate nsteps; returns (state, timer)."""
    os.makedirs(out_dir, exist_ok=True)
    timer = PhaseTimer()

    reg = default_registry_atm()
    diag_register(reg)
    for name in ["OMEGA", "RELHUM", "TMQ", "PRECT", "TS"]:
        reg.add_default(name)
    writer = AsyncHistoryWriter(
        reg, model.grid.lats, model.grid.lons, model.grid.km)
    ncol = model.grid.jm * model.grid.im
    hbuf = reg.buffer(ncol, model.grid.km, state.phys.t.dtype)

    step_first = jax.jit(lambda s, ci: atm_step(model, s, ci,
                                                first_step=True))
    step_rest = jax.jit(lambda s, ci: atm_step(model, s, ci))

    tapes = 0
    for i in range(nsteps):
        fn = step_first if int(state.nstep) == 0 and i == 0 else step_rest
        state, cam_out, diags = timer.timed("atm_step", fn, state, cam_in)

        if hist_every:
            payload = dict(diags)
            payload.update(diag_phys_writeout(state.phys))
            payload.update(diag_surf(cam_in, cam_out))
            payload.update(diag_export(cam_out))
            hbuf = timer.timed("outfld", lambda b: outfld_many(b, payload),
                               hbuf)
            if (i + 1) % hist_every == 0:
                days = float(state.nstep) * model.dt / 86400.0
                with timer.region("history_write"):
                    writer.write(os.path.join(out_dir, f"h0.{tapes:04d}.nc"),
                                 hbuf, days)
                tapes += 1
                hbuf = reg.buffer(ncol, model.grid.km, state.phys.t.dtype)

        if ckpt_every and (i + 1) % ckpt_every == 0:
            with timer.region("checkpoint"):
                save_checkpoint(os.path.join(out_dir, f"ckpt_{i + 1:06d}"),
                                state, {"nstep": int(state.nstep)})

        if check_every and (i + 1) % check_every == 0:
            with timer.region("sentinels"):
                _check_state(state, i + 1)

    writer.flush()
    writer.close()
    return state, timer


def run_coupled(model: AtmModel, state: AtmState, sst, nsteps: int,
                slab_ocean: bool = False, h_mix: float = 30.0, q_flux=None,
                out_dir: str = "output", hist_every: int = 0,
                ckpt_every: int = 0, check_every: int = 10):
    """Integrate nsteps with an interactive surface: bulk aerodynamic fluxes
    computed from the evolving state each step (the data-ocean coupler role),
    and — with ``slab_ocean=True`` — a prognostic mixed-layer SST closing the
    surface energy budget. Returns (state, sst, timer).

    This is the standalone-aquaplanet driver shape: the reference gets
    cam_in from the NorESM coupler; here the coupler IS the jitted step.
    """
    from .models.coupling.surface_fluxes import (bulk_surface_fluxes,
                                                 slab_ocean_step)

    os.makedirs(out_dir, exist_ok=True)
    timer = PhaseTimer()

    reg = default_registry_atm()
    diag_register(reg)
    for name in ["OMEGA", "RELHUM", "TMQ", "PRECT", "TS", "SST"]:
        reg.add_default(name)
    writer = AsyncHistoryWriter(
        reg, model.grid.lats, model.grid.lons, model.grid.km)
    ncol = model.grid.jm * model.grid.im
    hbuf = reg.buffer(ncol, model.grid.km, state.phys.t.dtype)

    def _step(s, sst, first):
        cam_in = bulk_surface_fluxes(s.phys, sst, model.registry.pcnst)
        s2, cam_out, diags = atm_step(model, s, cam_in, first_step=first)
        if slab_ocean:
            sst = slab_ocean_step(sst, cam_in, cam_out, model.dt,
                                  h_mix=h_mix, q_flux=q_flux)
        return s2, sst, cam_in, cam_out, diags

    step_first = jax.jit(lambda s, t: _step(s, t, True))
    step_rest = jax.jit(lambda s, t: _step(s, t, False))

    tapes = 0
    for i in range(nsteps):
        fn = step_first if int(state.nstep) == 0 and i == 0 else step_rest
        state, sst, cam_in, cam_out, diags = timer.timed(
            "atm_step", fn, state, sst)

        if hist_every:
            payload = dict(diags)
            payload.update(diag_phys_writeout(state.phys))
            payload.update(diag_surf(cam_in, cam_out))
            payload.update(diag_export(cam_out))
            payload["SST"] = sst
            hbuf = timer.timed("outfld", lambda b: outfld_many(b, payload),
                               hbuf)
            if (i + 1) % hist_every == 0:
                days = float(state.nstep) * model.dt / 86400.0
                with timer.region("history_write"):
                    writer.write(os.path.join(out_dir, f"h0.{tapes:04d}.nc"),
                                 hbuf, days)
                tapes += 1
                hbuf = reg.buffer(ncol, model.grid.km, state.phys.t.dtype)

        if ckpt_every and (i + 1) % ckpt_every == 0:
            with timer.region("checkpoint"):
                save_checkpoint(os.path.join(out_dir, f"ckpt_{i + 1:06d}"),
                                (state, sst), {"nstep": int(state.nstep)})

        if check_every and (i + 1) % check_every == 0:
            with timer.region("sentinels"):
                _check_state(state, i + 1)

    writer.flush()
    writer.close()
    return state, sst, timer


def quick_run(im=48, jm=24, km=10, nsteps=4, **kwargs):
    """Small end-to-end run (developer smoke / example)."""
    from .models.fv.held_suarez import hs_initial_state
    model = AtmModel.create(im, jm, km)
    dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                            nq=model.registry.pcnst)
    dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-4).at[0].set(
        3e-3 * (dyn0.delp / dyn0.delp.max())))
    state = atm_init(model, dyn0, jnp.zeros((jm, im)))
    cam_in = CamIn.zeros(jm * im, model.registry.pcnst)
    cam_in = cam_in.replace(landfrac=jnp.full((jm * im,), 0.3))
    return run(model, state, cam_in, nsteps, **kwargs)


if __name__ == "__main__":
    state, timer = quick_run(hist_every=2, ckpt_every=4)
    print(timer.table())
