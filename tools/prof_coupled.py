"""Per-phase profile of the FULL coupled atm_step (round-4 VERDICT #1).

Times, on the live device, the config-4b coupled step (aquaplanet surface +
gray radiation + ZM + FV) and its phases, mirroring the reference's t_startf
regions (physpkg.F90:1145 'bc_physics', :1163 'ac_physics'; dyn timers in
dyn_comp.F90):

    bc_physics   = phys_run1  (tphysbc: fixer, dadadj, ZM, aero, export)
    ac_physics   = phys_run2  (tphysac: vdiff, macmic, ZM2, rad, dme)
    p_d_coupling / dyn / d_p_coupling
    diag_payload = full-step time minus prognostic-only step time (the cost
                   of materializing the ~200-field history payload)

Usage: python tools/prof_coupled.py [im jm km]   (default 144 96 26 = f19)
Env: PROF_ZM_PALLAS=0 to disable the ZM mega-kernel (default on, matching
bench.py's documented performance configuration); PROF_ITERS=N.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def time_rep(fn, args, iters=10, passes=3):
    """Repeated-application timing (same inputs; no donation/chaining —
    phase attribution only, the headline uses bench.py's chained loop)."""
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    im, jm, km = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else \
        (144, 96, 26)
    iters = int(os.environ.get("PROF_ITERS", "10"))
    dtype = jnp.float32

    from cam_nor_physics_tpu.models.atm_comp import (AtmModel, atm_init,
                                                     atm_step)
    from cam_nor_physics_tpu.models.coupling.dp_coupling import (
        d_p_coupling, p_d_coupling)
    from cam_nor_physics_tpu.models.coupling.surface_fluxes import (
        aquaplanet_sst, bulk_surface_fluxes)
    from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
    from cam_nor_physics_tpu.models.fv.held_suarez import hs_initial_state
    from cam_nor_physics_tpu.models.physics.physpkg import (phys_run1,
                                                            phys_run2)
    from cam_nor_physics_tpu.utils.config import PhysConfig, ZMConfig

    zm_pallas = os.environ.get("PROF_ZM_PALLAS", "1") == "1"
    model = AtmModel.create(
        im, jm, km, dt=1800.0,
        phys_cfg=PhysConfig(radiation_scheme="gray"),
        zm_cfg=ZMConfig(use_pallas="auto" if zm_pallas else False))
    dyn0 = hs_initial_state(model.grid, model.coord, pert=1.0,
                            nq=model.registry.pcnst, dtype=dtype)
    dyn0 = dyn0.replace(q=jnp.full_like(dyn0.q, 1e-6).at[0].set(
        1e-2 * (dyn0.delp / dyn0.delp.max()) ** 2))
    state = atm_init(model, dyn0, jnp.zeros((jm, im), dtype))
    sst = aquaplanet_sst(state.phys.lat)

    def coupled(model, s, first=False):
        cam_in = bulk_surface_fluxes(s.phys, sst, model.registry.pcnst)
        return atm_step(model, s, cam_in, first_step=first)

    step0 = jax.jit(lambda m, s: coupled(m, s, True))
    stepn = jax.jit(coupled)

    # prognostic-only step: diags dropped -> XLA DCEs the diagnostics
    # payload; this is "history off"
    def prog_only(m, s):
        new, cam_out, _ = coupled(m, s)
        return new, cam_out

    stepp = jax.jit(prog_only)

    t0 = time.perf_counter()
    state, cam_out, diags = step0(model, state)
    _fetch(state)
    print(f"first-step compile+run: {time.perf_counter()-t0:.1f}s "
          f"({len(diags)} diag fields)", file=sys.stderr)
    for _ in range(2):
        state, cam_out, diags = stepn(model, state)
    _fetch(state)

    res = {"grid": f"{im}x{jm}x{km}",
           "device": jax.devices()[0].platform,
           "zm_pallas": zm_pallas, "iters": iters}

    t_full = time_rep(lambda m, s: stepn(m, s)[0], (model, state), iters)
    res["full_ms"] = t_full * 1e3
    t_prog = time_rep(lambda m, s: stepp(m, s)[0], (model, state), iters)
    res["prog_only_ms"] = t_prog * 1e3
    res["diag_payload_ms"] = (t_full - t_prog) * 1e3

    # ---- phases ----
    cam_in = bulk_surface_fluxes(state.phys, sst, model.registry.pcnst)
    f_p1 = jax.jit(lambda m, s, pb, ci: phys_run1(
        m.phys_cfg, m.zm_cfg, m.registry, s, pb, ci, m.dt, nstep=1))
    o1 = f_p1(model, state.phys, state.pbuf, cam_in)
    f_p2 = jax.jit(lambda m, s, pb, ci: phys_run2(
        m.phys_cfg, m.registry, s, pb, ci, m.dt))
    o2 = f_p2(model, o1.state, o1.pbuf, cam_in)
    f_pd = jax.jit(lambda m, d, ps: p_d_coupling(
        d, ps, m.grid, m.coord.ptop, m.dt, m.registry))
    dyn1 = f_pd(model, state.dyn, o2.state)
    f_dyn = jax.jit(lambda m, d, phis: dyn_run(
        d, m.grid, m.coord, phis, m.fv_cfg, m.dt,
        filter_impl=m.filter_impl, return_diags=True))
    dyn2, ddiags = f_dyn(model, dyn1, state.phis)
    f_dp = jax.jit(lambda m, d, phis, om: d_p_coupling(
        d, m.grid, phis, m.coord.ptop, m.registry, omega=om))
    _ = f_dp(model, dyn2, state.phis, ddiags["omega"])

    res["bc_physics_ms"] = time_rep(
        lambda *a: f_p1(*a).state, (model, state.phys, state.pbuf, cam_in),
        iters) * 1e3
    res["ac_physics_ms"] = time_rep(
        lambda *a: f_p2(*a).state, (model, o1.state, o1.pbuf, cam_in),
        iters) * 1e3
    res["p_d_coupling_ms"] = time_rep(
        lambda *a: f_pd(*a).u, (model, state.dyn, o2.state), iters) * 1e3
    res["dyn_ms"] = time_rep(
        lambda *a: f_dyn(*a)[0].u, (model, dyn1, state.phis), iters) * 1e3
    res["d_p_coupling_ms"] = time_rep(
        lambda *a: f_dp(*a).t, (model, dyn2, state.phis, ddiags["omega"]),
        iters) * 1e3
    res["phase_sum_ms"] = sum(res[k] for k in
                              ("bc_physics_ms", "ac_physics_ms",
                               "p_d_coupling_ms", "dyn_ms",
                               "d_p_coupling_ms"))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
