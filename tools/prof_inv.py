"""Time the enthalpy inversion solvers at the ZM batch shape (TPU).

Secant ("newton", 8 f-evals) vs analytic-derivative Newton ("newton_exact",
5 f+df evals) vs Brent (reference method, while_loop). The winner becomes
ZMConfig.inversion_solver's default.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cam_nor_physics_tpu.ops.thermo import enthalpy, ienthalpy

dtype = jnp.float32
ncol, pver = 96 * 144, 26
rng = np.random.default_rng(0)
t_true = jnp.asarray(rng.uniform(200.0, 310.0, (ncol, pver)), dtype)
p = jnp.asarray(rng.uniform(100.0, 1000.0, (ncol, pver)), dtype)
qt = jnp.asarray(rng.uniform(1e-5, 0.02, (ncol, pver)), dtype)
z = jnp.asarray(rng.uniform(0.0, 15000.0, (ncol, pver)), dtype)
guess = t_true + jnp.asarray(rng.uniform(-8.0, 8.0, (ncol, pver)), dtype)
h = enthalpy(t_true, p, qt, z)


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:16s} {(time.perf_counter() - t0) / iters * 1e3:8.3f} ms",
          file=sys.stderr)
    sys.stderr.flush()
    return out


for solver in ("newton", "newton_exact"):
    f = jax.jit(lambda h, g, s=solver: ienthalpy(h, p, qt, z, g, solver=s))
    t, _, conv = timeit(f"ienthalpy[{solver}]", f, h, guess)
    err = float(jnp.nanmax(jnp.abs(t - t_true)))
    print(f"  max err {err:.2e} K, conv {float(jnp.mean(conv)):.4f}",
          file=sys.stderr)
