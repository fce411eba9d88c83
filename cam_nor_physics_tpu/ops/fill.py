"""Negative-tracer repair: qneg3/qneg4 and vertical borrowing filler.

Equivalents of upstream `qneg_module` and `fill_module` (contracts at
/root/reference/fv/dp_coupling.F90:642-649, /root/reference/physics/physpkg.F90:1647,
/root/reference/fv/dyn_comp.F90:2385 `fill` flag). The reference logs worst
offenders; here the repair is pure and the diagnostics are returned so callers
can log/monitor (blow-up sentinel policy, SURVEY §5.3).
"""

from __future__ import annotations

import jax.numpy as jnp

_UNROLL = True   # trace-time toggle (see dyn_comp._UNROLL note)


def qneg3(q, qmin=0.0):
    """Clamp below-minimum mixing ratios to qmin (qneg3 semantics).

    Returns (q_fixed, worst, nfix): the repaired field, the most negative
    offense, and the offense count — the reference's log payload.
    """
    bad = q < qmin
    worst = jnp.min(jnp.where(bad, q, jnp.inf))
    nfix = jnp.sum(bad)
    return jnp.where(bad, qmin, q), worst, nfix


def qneg4(cflx, qbot, pdel_bot, dt, gravit):
    """Surface-flux limiter (qneg4 semantics, physpkg.F90:1647): prevent a
    negative surface constituent flux from driving the lowest-layer mixing
    ratio negative over dt. Returns the limited flux."""
    max_removal = qbot * pdel_bot / (gravit * dt)
    return jnp.maximum(cflx, -max_removal)


def fillz(q, dp):
    """Vertical borrowing filler (fill_module's fillz equivalent): repair
    negative cell values by borrowing mass-weighted amounts from the cell
    below, sweeping top-down, then clamp any residual at the bottom.

    q: (..., km); dp: (..., km) layer thickness. Conserves sum(q*dp) unless
    the column is net-negative, in which case mass is created at the bottom
    clamp; `residual` returns that created mass (sum(q_new*dp) - residual ==
    sum(q*dp) exactly).
    """
    import jax

    km = q.shape[-1]

    def step(carry, x):
        debt = carry                      # mass owed from above (q*dp units)
        q_k, dp_k = x
        avail = q_k * dp_k - debt
        q_new = jnp.maximum(avail, 0.0) / dp_k
        new_debt = jnp.maximum(-avail, 0.0)
        return new_debt, q_new

    xs = (jnp.moveaxis(q, -1, 0), jnp.moveaxis(dp, -1, 0))
    debt0 = jnp.zeros(q.shape[:-1], q.dtype)
    residual, q_new = jax.lax.scan(step, debt0, xs, unroll=_UNROLL)
    return jnp.moveaxis(q_new, 0, -1), residual
