"""Dry adiabatic adjustment (dadadj_tend equivalent).

The reference calls upstream `dadadj_tend` from tphysbc
(/root/reference/physics/physpkg.F90:2786-2806) right after the energy fixer:
unstable stratification (potential temperature decreasing with height) in the
top `nlvdry` layers is removed by pairwise enthalpy-conserving mixing of T
(and mass-proportional mixing of water vapor), sweeping until stable.

TPU formulation: a fixed-count `lax.scan` of whole-column sweeps (masked
where already stable) instead of the reference's per-column iterate-until-
converged loop — branch-free over the column batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import constants as c


def dadadj(t, q, pmid, pdel, nlvdry: int = 3, niter: int = 15):
    """Adjust T and qv in the top `nlvdry` layer interfaces.

    t, q: (ncol, pver); pmid, pdel: (ncol, pver). Returns (t_adj, q_adj).
    Layer k is above layer k+1. A pair (k, k+1) is unstable when
    theta[k] < theta[k+1]; mixing sets a common theta conserving
    cp·integral(T dp) and mixes qv mass-proportionally.
    """
    pver = t.shape[-1]
    nlvdry = min(nlvdry, pver - 1)
    exn = (pmid / 1.0e5) ** c.CAPPA          # Exner-like factor (theta = T/exn)

    def sweep(carry, _):
        t_c, q_c = carry

        def mix_pair(k, tq):
            t_k, q_k = tq
            th_up = t_k[:, k] / exn[:, k]
            th_dn = t_k[:, k + 1] / exn[:, k + 1]
            unstable = th_up < th_dn
            w_up, w_dn = pdel[:, k], pdel[:, k + 1]
            # enthalpy-conserving common theta
            th_star = (w_up * t_k[:, k] + w_dn * t_k[:, k + 1]) / \
                (w_up * exn[:, k] + w_dn * exn[:, k + 1])
            q_star = (w_up * q_k[:, k] + w_dn * q_k[:, k + 1]) / (w_up + w_dn)
            t_new_up = jnp.where(unstable, th_star * exn[:, k], t_k[:, k])
            t_new_dn = jnp.where(unstable, th_star * exn[:, k + 1],
                                 t_k[:, k + 1])
            q_new_up = jnp.where(unstable, q_star, q_k[:, k])
            q_new_dn = jnp.where(unstable, q_star, q_k[:, k + 1])
            t_k = t_k.at[:, k].set(t_new_up).at[:, k + 1].set(t_new_dn)
            q_k = q_k.at[:, k].set(q_new_up).at[:, k + 1].set(q_new_dn)
            return t_k, q_k

        for k in range(nlvdry):              # static loop over pair offsets
            t_c, q_c = mix_pair(k, (t_c, q_c))
        return (t_c, q_c), None

    (t_adj, q_adj), _ = jax.lax.scan(sweep, (t, q), None, length=niter)
    return t_adj, q_adj


def dadadj_tend(state, dt: float, nlvdry: int = 3, niter: int = 15):
    """ptend-style output: (ds/dt heating, dq/dt) from the adjustment
    (dadadj_tend contract at physpkg.F90:2786)."""
    t_adj, q_adj = dadadj(state.t, state.q[:, :, 0], state.pmid, state.pdel,
                          nlvdry, niter)
    tend_s = c.CPAIR * (t_adj - state.t) / dt
    tend_q = (q_adj - state.q[:, :, 0]) / dt
    return tend_s, tend_q
