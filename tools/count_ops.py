"""Count top-level ops in the compiled bench-step executables.

Under the axon tunnel each executed XLA thunk costs ~1.5-5 us of dispatch,
so entry-computation op count (plus while-body counts, which re-dispatch per
iteration) is the proxy for the dispatch floor of a step."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def count(label, fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    comps = re.findall(r"^(ENTRY %|%)([\w.\-]+)", txt, re.M)
    # count instruction lines per computation
    lines = txt.splitlines()
    counts = {}
    cur = None
    for ln in lines:
        m = re.match(r"^(ENTRY )?%?([\w.\-]+) \(", ln)
        if m:
            cur = ("ENTRY " if m.group(1) else "") + m.group(2)
            counts[cur] = 0
        elif cur and re.match(r"^  (ROOT )?[%\w]", ln) and "= " in ln:
            counts[cur] += 1
    entry = {k: v for k, v in counts.items() if k.startswith("ENTRY")}
    whiles = len(re.findall(r" = while\(", txt))
    fusions = len(re.findall(r" = fusion\(", txt))
    total_entry = sum(entry.values())
    body = sorted(((v, k) for k, v in counts.items() if "body" in k),
                  reverse=True)[:6]
    print(f"{label}: entry_ops={total_entry} while={whiles} "
          f"fusion_total={fusions}")
    for v, k in body:
        print(f"    {k}: {v}")


def main():
    dtype = jnp.float32
    im, jm, km = 144, 96, 26

    from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
    from cam_nor_physics_tpu.models.fv.grid import make_grid
    from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                           hs_initial_state)
    from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
    from cam_nor_physics_tpu.utils.config import FVConfig, ZMConfig

    grid = make_grid(im, jm, km)
    coord = hybrid_coefficients(km)
    phis = jnp.zeros((jm, im), dtype)
    cfg = FVConfig()
    dt = 1800.0

    def dyn_step_g(state, grid, coord, phis):
        state = dyn_run(state, grid, coord, phis, cfg, dt)
        return hs_forcing(state, grid, coord.ptop, dt)

    state = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)
    count("dyn_step", dyn_step_g, state, grid, coord, phis)

    from cam_nor_physics_tpu.models.physics.constituents import \
        default_registry
    from cam_nor_physics_tpu.models.physics.physics_buffer import (
        pbuf_register, zm_pbuf_specs)
    from cam_nor_physics_tpu.models.physics.state import \
        make_state_from_profiles
    from cam_nor_physics_tpu.models.physics.zm_conv_intr import zm_conv_tend
    from cam_nor_physics_tpu.models.physics.zm_conv import zm_convr

    ncol, pver = jm * im, km
    reg = default_registry()
    eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
    pint = jnp.asarray(
        np.broadcast_to(eta[None, :] * 1.0e5, (ncol, pver + 1)), dtype)
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0).at[:, -1].add(2.0)
    q0 = (0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6).at[:, -3:].multiply(1.15)
    q = jnp.zeros((ncol, pver, reg.pcnst), dtype).at[:, :, 0].set(q0)
    pstate = make_state_from_profiles(
        pint, t, jnp.zeros((ncol, pver), dtype),
        jnp.zeros((ncol, pver), dtype), q, jnp.zeros((ncol,), dtype))
    pbuf = pbuf_register(zm_pbuf_specs(ncol, pver), dtype).set(
        "CLD", jnp.full((ncol, pver), 0.1, dtype))
    zcfg = ZMConfig()
    pblh = jnp.full((ncol,), 800.0, dtype)
    tpert = jnp.full((ncol,), 0.3, dtype)
    landfrac = jnp.ones((ncol,), dtype)

    def zm_step_g(s, pb, pblh, tpert, landfrac):
        o = zm_conv_tend(zcfg, reg, s, pb, pblh, tpert, landfrac, 1800.0)
        return o.state1, o.pbuf

    count("zm_tend", zm_step_g, pstate, pbuf, pblh, tpert, landfrac)

    def zmcore(s, pblh, tpert, landfrac):
        return zm_convr(zcfg, 0, s.t, s.q[:, :, 0], s.pmid, s.pint, s.pdel,
                        s.zm, s.phis, s.zi, pblh, tpert, landfrac, 900.0)

    count("zm_convr", zmcore, pstate, pblh, tpert, landfrac)


if __name__ == "__main__":
    main()
