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
from .models.physics.cam_diagnostics import (diag_cloud, diag_export,
                                             diag_phys_writeout,
                                             diag_register, diag_surf)
from .utils.ckptio_native import AsyncCheckpointWriter
from .utils.history import default_registry_atm, outfld_many
from .utils.timing import PhaseTimer

UMAX_GUARD = 300.0        # m/s wind sanity bound (dyn_comp.F90:996-997)


def _grid_area(grid, dtype):
    """Per-column cell area (m2), flattened (jm*im,) — GRIDAREA payload."""
    from .utils import constants as c
    cosp = np.asarray(grid.cosp)
    area = (c.REARTH ** 2 * grid.dl * grid.dp) * np.maximum(cosp, 0.0)
    return jnp.asarray(np.broadcast_to(area[:, None],
                                       (grid.jm, grid.im)).reshape(-1),
                       dtype)


class BlowupError(RuntimeError):
    """Model state failed the finite/range sentinels (the structured
    replacement for the reference's collective endrun abort)."""


class _HistoryTapes:
    """Per-tape accumulation buffers + writer (cam_history tape set).

    `every` is the reference's per-tape write frequency: an int applies to
    tape 0 (h0); a dict {tape: every} drives several tapes with independent
    cadences (e.g. {0: 4, 1: 240} for 2-hourly h0 + monthly-mean h1), each
    over the fields add_default-ed to that tape."""

    def __init__(self, reg, model, dtype, every, out_dir):
        from .utils.histio_native import AsyncHistoryWriter
        self.reg = reg
        self.out_dir = out_dir
        self.every = ({0: every} if isinstance(every, int) else dict(every))
        self.every = {t: e for t, e in self.every.items() if e}
        self.grid = model.grid
        self.dtype = dtype
        self.writer = AsyncHistoryWriter(
            reg, model.grid.lats, model.grid.lons, model.grid.km)
        self.bufs = {t: self._fresh(t) for t in self.every}
        self.counts = {t: 0 for t in self.every}

    def _fresh(self, tape):
        g = self.grid
        return self.reg.buffer(g.jm * g.im, g.km, self.dtype, tape=tape,
                               jm=g.jm, im=g.im)

    def accumulate(self, payload):
        for t in self.bufs:
            self.bufs[t] = outfld_many(self.bufs[t], payload, self.reg)

    def maybe_write(self, istep, time_days):
        for t, every in self.every.items():
            if istep % every == 0:
                path = os.path.join(
                    self.out_dir, f"h{t}.{self.counts[t]:04d}.nc")
                self.writer.write(path, self.bufs[t], time_days)
                self.counts[t] += 1
                self.bufs[t] = self._fresh(t)

    def close(self):
        self.writer.flush()
        self.writer.close()


def _dyn_payload(state: AtmState) -> dict:
    """Staggered-grid prognostic winds (the reference's US/VS addflds on
    the FV u/v staggers, dyn_comp.F90:676-684). u rows 1..jm-1 are the
    physical interior interfaces (row 0 is the unused south-pole edge)."""
    return {"US": state.dyn.u[:, 1:, :], "VS": state.dyn.v}


def _step_payload(state: AtmState, cam_in: CamIn, cam_out, diags: dict,
                  area) -> dict:
    """The per-step outfld batch (pure jnp — safe inside jit/scan)."""
    payload = dict(diags)
    payload.update(diag_phys_writeout(state.phys, nstep=state.nstep,
                                      area=area))
    payload.update(diag_surf(cam_in, cam_out))
    payload.update(diag_export(cam_out))
    payload.update(_dyn_payload(state))
    payload.update(diag_cloud(state.pbuf.get("CLD"), state.phys.pmid))
    if "PRECC" in payload:
        payload["PRECCMX"] = payload["PRECC"]
    return payload


def _check_state(state: AtmState, nstep: int) -> None:
    u = state.dyn.u
    if not bool(jnp.isfinite(u).all() & jnp.isfinite(state.dyn.pt).all()):
        raise BlowupError(f"non-finite dycore state at step {nstep}")
    umax = float(jnp.abs(u).max())
    if umax > UMAX_GUARD:
        raise BlowupError(f"|u|max={umax:.1f} m/s exceeds {UMAX_GUARD} "
                          f"at step {nstep}")


def _state_ok(state: AtmState) -> jnp.ndarray:
    """Scalar bool: the same predicate as _check_state, as a jit-safe
    expression — accumulated per step inside the chunk scan so ABORT.json
    can report the EXACT diverging step (round-4 VERDICT #10), not just
    the chunk-boundary bound. An isfinite+max reduction over u/pt per
    step; negligible next to the step itself."""
    u = state.dyn.u
    return (jnp.isfinite(u).all() & jnp.isfinite(state.dyn.pt).all()
            & (jnp.abs(u).max() <= UMAX_GUARD))


def latest_checkpoint(out_dir: str) -> str | None:
    """Most recent `ckpt_*` directory under out_dir (restart discovery)."""
    import glob
    paths = sorted(glob.glob(os.path.join(out_dir, "ckpt_*")))
    return paths[-1] if paths else None


def _structured_abort(out_dir: str, err: BlowupError, nstep: int,
                      hist, ckpt_writer, last_ok: int = 0,
                      exact_step: int | None = None) -> None:
    """Structured abort record (the endrun replacement, SURVEY §5.3): flush
    IO workers so no tape/checkpoint is truncated, then write ABORT.json
    with the failure reason and a pointer to the last good checkpoint —
    the recovery contract is restart-from-checkpoint (SURVEY §5.4).

    `detected_step` is the check boundary at which the sentinels fired
    (sentinels run every `check_every` steps; in the chunked loop at chunk
    boundaries, so detection can slip to ceil(check_every/chunk)*chunk).
    `failed_step` is the EXACT first diverging step when per-step flags
    are available (the chunked loop accumulates _state_ok inside the scan
    — round-4 VERDICT #10); otherwise it equals `detected_step`.
    `failed_within` bounds the divergence: (last step that passed, first
    failing step]. Restart tooling should resume from
    `last_good_checkpoint` and treat every step after `failed_within[0]`
    as suspect."""
    import json
    if hist:
        hist.close()
    if ckpt_writer:
        ckpt_writer.flush()
        ckpt_writer.close()
    record = {"reason": str(err),
              "failed_step": nstep if exact_step is None else exact_step,
              "detected_step": nstep,
              "exact": exact_step is not None,
              "failed_within": ([last_ok, nstep] if exact_step is None
                                else [exact_step - 1, exact_step]),
              "last_good_checkpoint": latest_checkpoint(out_dir)}
    with open(os.path.join(out_dir, "ABORT.json"), "w") as f:
        json.dump(record, f, indent=1)


def run(model: AtmModel, state: AtmState, cam_in: CamIn, nsteps: int,
        out_dir: str = "output", hist_every: int = 0, ckpt_every: int = 0,
        check_every: int = 10, resume_from: str | None = None,
        chunk: int = 1):
    """Integrate nsteps; returns (state, timer).

    `resume_from`: a checkpoint directory written by a previous run(); the
    passed `state` serves as the shape/dtype template (the reference's
    restart-compatibility contract: same grid, same constituent set) and the
    run continues from the stored step counter — bitwise identically to the
    uninterrupted run (tests/test_restart.py).

    `chunk`: steps per device dispatch. chunk=1 is the host-loop shape
    (one jitted step per dispatch, IO/sentinels between steps); chunk>1
    runs `lax.scan` over `chunk` coupled steps per dispatch with history
    accumulation INSIDE the scan (the outfld sums are jit-safe pytrees),
    so the host round-trip cost is paid once per chunk instead of once
    per step. The scan body is the same traced atm_step; XLA's fusion
    across the scan differs from the standalone step by ~1 ulp on the
    STATE. Derived history diagnostics can differ by more in f32 (the
    p-level slice index selection flips on 1-ulp pmid differences);
    tests/test_driver_chunked.py pins the f32 re-fusion envelope.
    History/checkpoint cadences must be multiples of chunk; sentinel
    checks run at chunk boundaries (detection can therefore lag the
    diverging step — ABORT.json records the bounding failed_within
    interval)."""
    os.makedirs(out_dir, exist_ok=True)
    timer = PhaseTimer()
    if resume_from is not None:
        from .utils.checkpoint import restore_checkpoint
        state = restore_checkpoint(resume_from, state)

    reg = default_registry_atm()
    diag_register(reg)
    from .models.physics.cam_diagnostics import amwg_core_fields
    for name in amwg_core_fields() + ["US", "VS", "PRECCMX"]:
        if name in reg.fields:
            reg.add_default(name)
    hist = _HistoryTapes(reg, model, state.phys.t.dtype, hist_every,
                         out_dir) if hist_every else None
    ckpt_writer = AsyncCheckpointWriter() if ckpt_every else None

    if chunk > 1:
        return _run_chunked(model, state, cam_in, nsteps, chunk, hist,
                            ckpt_writer, out_dir, ckpt_every, check_every,
                            timer)

    # model rides as a pytree ARGUMENT (closure grid tables would embed as
    # executable constants and disable the axon fast execution path).
    # Steady-state calls donate the state buffers (s(n) is dead once s(n+1)
    # exists — XLA reuses the HBM in place); the first call does NOT donate,
    # so the caller's initial state stays valid (restart tests reuse it).
    # Donation is skipped on runtimes that reject donated executables
    # (the axon tunnel — utils/runtime.donation_ok).
    from .utils.runtime import donation_ok
    step_jit = jax.jit(atm_step, static_argnames=("first_step",))
    step_don = jax.jit(atm_step, static_argnames=("first_step",),
                       donate_argnums=(1,)) if donation_ok() else step_jit
    step_first = lambda s, ci: step_jit(model, s, ci, first_step=True)
    step_nodon = lambda s, ci: step_jit(model, s, ci)
    step_rest = lambda s, ci: step_don(model, s, ci)

    last_ok = 0
    for i in range(nsteps):
        if i == 0:      # never donate the caller's (or freshly restored) state
            fn = step_first if int(state.nstep) == 0 else step_nodon
        else:
            fn = step_rest
        state, cam_out, diags = timer.timed("atm_step", fn, state, cam_in)

        if hist:
            payload = _step_payload(state, cam_in, cam_out, diags,
                                    _grid_area(model.grid,
                                               state.phys.t.dtype))
            timer.timed("outfld", hist.accumulate, payload)
            with timer.region("history_write"):
                hist.maybe_write(i + 1,
                                 float(state.nstep) * model.dt / 86400.0)

        if ckpt_every and (i + 1) % ckpt_every == 0:
            with timer.region("checkpoint"):
                ckpt_writer.write(
                    os.path.join(out_dir, f"ckpt_{i + 1:06d}"),
                    state, {"nstep": int(state.nstep)})

        if check_every and (i + 1) % check_every == 0:
            with timer.region("sentinels"):
                try:
                    _check_state(state, i + 1)
                    last_ok = i + 1
                except BlowupError as err:
                    _structured_abort(out_dir, err, i + 1, hist, ckpt_writer,
                                      last_ok=last_ok)
                    raise

    if hist:
        hist.close()
    if ckpt_writer:
        ckpt_writer.flush()
        ckpt_writer.close()
    return state, timer


def _run_chunked(model: AtmModel, state: AtmState, cam_in: CamIn,
                 nsteps: int, chunk: int, hist, ckpt_writer, out_dir: str,
                 ckpt_every: int, check_every: int, timer: PhaseTimer):
    """run() body for chunk>1: lax.scan over `chunk` coupled steps per
    dispatch, history accumulated on-device inside the scan.

    One dispatch integrates a whole chunk, so the tunnel/host round-trip
    cost (measured ~40% of the per-step wall time at 1.9° on the axon
    tunnel) is amortized 1/chunk. The scan body is the SAME traced
    atm_step as the chunk=1 loop; state trajectories agree to roundoff
    (XLA fuses the scan body marginally differently — ~1 ulp; derived
    f32 history diagnostics can differ more,
    tests/test_driver_chunked.py). The reference's analogue is its
    nsplit-deep sub-cycling inside one dyn_run call without returning to
    the coupler (dyn_comp.F90:1497-1524)."""
    from .utils.runtime import donation_ok

    if hist:
        for t, every in hist.every.items():
            if every % chunk:
                raise ValueError(
                    f"hist_every[{t}]={every} must be a multiple of "
                    f"chunk={chunk}")
    if ckpt_every and ckpt_every % chunk:
        raise ValueError(f"ckpt_every={ckpt_every} must be a multiple of "
                         f"chunk={chunk}")

    area = _grid_area(model.grid, state.phys.t.dtype)
    accumulate = hist is not None
    reg = hist.reg if hist else None

    def chunk_fn(model, st, bufs, cam_in, n):
        def body(carry, _):
            st, bufs = carry
            st2, cam_out, diags = atm_step(model, st, cam_in)
            if accumulate:
                payload = _step_payload(st2, cam_in, cam_out, diags, area)
                bufs = {t: outfld_many(b, payload, reg)
                        for t, b in bufs.items()}
            # per-step sentinel flag (VERDICT #10): rides out as a (n,)
            # bool so a boundary failure can be localized to the exact step
            return (st2, bufs), _state_ok(st2)

        (st, bufs), oks = jax.lax.scan(body, (st, bufs), None, length=n)
        return st, bufs, oks

    jfn = jax.jit(chunk_fn, static_argnames=("n",))
    jdon = (jax.jit(chunk_fn, static_argnames=("n",), donate_argnums=(1, 2))
            if donation_ok() else jfn)
    step_jit = jax.jit(atm_step, static_argnames=("first_step",))

    bufs = {t: b for t, b in hist.bufs.items()} if hist else {}
    i = 0
    check_eff = (-(-check_every // chunk) * chunk) if check_every else 0
    last_ok = 0
    # per-step sentinel flags accumulated since the last clean check:
    # [(first_step_of_batch, (n,) bool device array)] — fetched ONLY when a
    # boundary check fails, to localize the exact diverging step
    pending_flags = []

    def _exact_failed_step():
        for start, oks in pending_flags:
            bad = np.flatnonzero(~np.asarray(oks))
            if bad.size:
                return start + int(bad[0])
        return None

    def boundary(i):
        nonlocal bufs, last_ok, pending_flags
        if hist:
            hist.bufs = bufs
            with timer.region("history_write"):
                hist.maybe_write(i, float(state.nstep) * model.dt / 86400.0)
            bufs = hist.bufs
        if ckpt_every and i % ckpt_every == 0:
            with timer.region("checkpoint"):
                ckpt_writer.write(os.path.join(out_dir, f"ckpt_{i:06d}"),
                                  state, {"nstep": int(state.nstep)})
        if check_eff and i % check_eff == 0:
            with timer.region("sentinels"):
                try:
                    _check_state(state, i)
                    last_ok = i
                    pending_flags = []
                except BlowupError as err:
                    # detection is at the chunk boundary; the per-step
                    # flags localize the exact diverging step
                    _structured_abort(out_dir, err, i, hist, ckpt_writer,
                                      last_ok=last_ok,
                                      exact_step=_exact_failed_step())
                    raise

    if int(state.nstep) == 0 and nsteps > 0:
        # nstep==0 disables the energy fixer (physpkg.F90:2899) — a
        # different trace, so the first step runs solo outside the scan
        state, cam_out, diags = timer.timed(
            "atm_step", step_jit, model, state, cam_in, first_step=True)
        if hist:
            payload = _step_payload(state, cam_in, cam_out, diags, area)
            bufs = {t: outfld_many(b, payload, reg)
                    for t, b in bufs.items()}
        if check_eff:
            pending_flags.append((1, _state_ok(state)[None]))
        i = 1
        boundary(i)

    donate = False     # never donate the caller's (or restored) buffers
    while i < nsteps:
        n = min(chunk - (i % chunk), nsteps - i)
        fn = jdon if donate else jfn
        state, bufs, oks = timer.timed("atm_step", fn, model, state, bufs,
                                       cam_in, n=n)
        donate = True
        if check_eff:      # no sentinel boundaries -> nothing consumes them
            pending_flags.append((i + 1, oks))
        i += n
        boundary(i)

    if hist:
        hist.bufs = bufs
        hist.close()
    if ckpt_writer:
        ckpt_writer.flush()
        ckpt_writer.close()
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
    for name in ["OMEGA", "RELHUM", "TMQ", "PRECT", "TS", "SST", "US", "VS",
                 "PRECCMX", "T850", "U250", "Z500", "VT", "VU",
                 "CLDTOT", "CLDLOW", "CLDHGH"]:
        reg.add_default(name)
    hist = _HistoryTapes(reg, model, state.phys.t.dtype, hist_every,
                         out_dir) if hist_every else None

    def _step(model, s, sst, first):
        cam_in = bulk_surface_fluxes(s.phys, sst, model.registry.pcnst)
        s2, cam_out, diags = atm_step(model, s, cam_in, first_step=first)
        if slab_ocean:
            sst = slab_ocean_step(sst, cam_in, cam_out, model.dt,
                                  h_mix=h_mix, q_flux=q_flux)
        return s2, sst, cam_in, cam_out, diags

    ckpt_writer = AsyncCheckpointWriter() if ckpt_every else None
    # model as pytree argument — see run() note; steady-state calls donate
    # state+sst (in-place HBM reuse), i==0 never donates the caller's arrays
    from .utils.runtime import donation_ok
    _step_jit = jax.jit(_step, static_argnames=("first",))
    _step_don = jax.jit(_step, static_argnames=("first",),
                        donate_argnums=(1, 2)) if donation_ok() else _step_jit
    step_first = lambda s, t: _step_jit(model, s, t, first=True)
    step_nodon = lambda s, t: _step_jit(model, s, t, first=False)
    step_rest = lambda s, t: _step_don(model, s, t, first=False)

    last_ok = 0
    for i in range(nsteps):
        if i == 0:
            fn = step_first if int(state.nstep) == 0 else step_nodon
        else:
            fn = step_rest
        state, sst, cam_in, cam_out, diags = timer.timed(
            "atm_step", fn, state, sst)

        if hist:
            payload = dict(diags)
            payload.update(diag_phys_writeout(
                state.phys, nstep=state.nstep,
                area=_grid_area(model.grid, state.phys.t.dtype)))
            payload.update(diag_surf(cam_in, cam_out))
            payload.update(diag_export(cam_out))
            payload.update(_dyn_payload(state))
            payload.update(diag_cloud(state.pbuf.get("CLD"),
                                      state.phys.pmid))
            payload["SST"] = sst
            if "PRECC" in payload:
                payload["PRECCMX"] = payload["PRECC"]
            timer.timed("outfld", hist.accumulate, payload)
            with timer.region("history_write"):
                hist.maybe_write(i + 1,
                                 float(state.nstep) * model.dt / 86400.0)

        if ckpt_every and (i + 1) % ckpt_every == 0:
            with timer.region("checkpoint"):
                ckpt_writer.write(
                    os.path.join(out_dir, f"ckpt_{i + 1:06d}"),
                    (state, sst), {"nstep": int(state.nstep)})

        if check_every and (i + 1) % check_every == 0:
            with timer.region("sentinels"):
                try:
                    _check_state(state, i + 1)
                    last_ok = i + 1
                except BlowupError as err:
                    _structured_abort(out_dir, err, i + 1, hist, ckpt_writer,
                                      last_ok=last_ok)
                    raise

    if hist:
        hist.close()
    if ckpt_writer:
        ckpt_writer.flush()
        ckpt_writer.close()
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
