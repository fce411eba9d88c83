"""List non-scalar constants embedded in a jitted executable's HLO.

Under the axon TPU tunnel, ANY array-shaped constant in an executable
disables the fast repeat-execution path: a 200-op graph with one 32-byte
constant costs ~0.9 ms/call vs 0.04 ms/call without (measured 2026-08-18).
Hot-path jits must therefore take every array as an argument. This module
finds offenders.

Usage as a library:
    from tools.find_constants import array_constants
    consts = array_constants(fn, *args)   # list of (shape, dtype, size)
"""

import re

import jax


def array_constants(fn, *args, **kwargs):
    """Return [(shape_str, bytes)] for every non-scalar constant in the
    OPTIMIZED HLO of jit(fn)(*args)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    hlo = lowered.compile().as_text()
    out = []
    # optimized HLO spells them 'constant(...)' with a shaped result
    for m in re.finditer(r"(\S+?)\s*=\s*([a-z0-9]+)\[([\d,]+)\][^=]*constant\(",
                         hlo):
        dims = [int(d) for d in m.group(3).split(",") if d]
        n = 1
        for d in dims:
            n *= d
        if n > 1:
            out.append((f"{m.group(2)}[{m.group(3)}]", n))
    return out


def report(name, fn, *args, **kwargs):
    cs = array_constants(fn, *args, **kwargs)
    total = sum(n for _, n in cs)
    print(f"{name}: {len(cs)} array constants, {total} elements total")
    from collections import Counter
    for sig, cnt in Counter(s for s, _ in cs).most_common(20):
        print(f"   {cnt:4d} x {sig}")
    return cs


if __name__ == "__main__":
    import numpy as np
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, "/root/repo")

    from cam_nor_physics_tpu.models.fv.dyn_comp import dyn_run
    from cam_nor_physics_tpu.models.fv.grid import make_grid
    from cam_nor_physics_tpu.models.fv.held_suarez import (hs_forcing,
                                                           hs_initial_state)
    from cam_nor_physics_tpu.models.fv.vertical import hybrid_coefficients
    from cam_nor_physics_tpu.utils.config import FVConfig, ZMConfig

    dtype = jnp.float32
    im, jm, km = 144, 96, 26
    grid = make_grid(im, jm, km)
    coord = hybrid_coefficients(km)
    phis = jnp.zeros((jm, im), dtype)
    cfg = FVConfig()
    dt = 1800.0
    state = hs_initial_state(grid, coord, pert=1.0, dtype=dtype)

    def dyn_step(s):
        s = dyn_run(s, grid, coord, phis, cfg, dt)
        return hs_forcing(s, grid, coord.ptop, dt)

    report("dyn_step (closure grid)", dyn_step, state)

    from cam_nor_physics_tpu.models.physics.constituents import \
        default_registry
    from cam_nor_physics_tpu.models.physics.physics_buffer import (
        pbuf_register, zm_pbuf_specs)
    from cam_nor_physics_tpu.models.physics.state import \
        make_state_from_profiles
    from cam_nor_physics_tpu.models.physics.zm_conv_intr import zm_conv_tend

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

    def zm_step(s, pb, pblh, tpert, landfrac):
        o = zm_conv_tend(zcfg, reg, s, pb, pblh, tpert, landfrac, dt)
        return o.state1, o.pbuf

    report("zm_step (args)", zm_step, pstate, pbuf, pblh, tpert, landfrac)
