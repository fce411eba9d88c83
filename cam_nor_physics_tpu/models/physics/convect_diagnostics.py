"""Merged convection diagnostics — convect_diagnostics equivalent.

Re-implementation of /root/reference/physics/convect_diagnostics.F90 (251
lines): combines deep + shallow convection outputs. With CLUBB as the shallow
scheme (the only configuration the reference accepts, :78-80), the shallow
terms are zeroed (:185-196) and the merged fields reduce to the deep-scheme
values — kept explicit here so a future non-CLUBB shallow scheme slots in.
"""

from __future__ import annotations

import jax.numpy as jnp

from .physics_buffer import PhysicsBuffer


def convect_diagnostics_calc(state, pbuf: PhysicsBuffer,
                             cmfmc_sh=None, rprd_sh=None) -> dict:
    """Merged CMFMC, cloud top/bottom levels + pressures, total rain
    production (convect_diagnostics_calc, :115-237). Returns the outfld
    payload dict {name: (ncol,...) array}.
    """
    cmfmc_dp = pbuf.get("CMFMC_DP")          # (ncol, pver+1) kg/m2/s
    rprd_dp = pbuf.get("RPRDDP")             # (ncol, pver)
    if cmfmc_sh is None:
        cmfmc_sh = jnp.zeros_like(cmfmc_dp)  # CLUBB shallow => zero (:185)
    if rprd_sh is None:
        rprd_sh = jnp.zeros_like(rprd_dp)

    cmfmc = cmfmc_dp + cmfmc_sh
    pver = state.pver
    active = cmfmc[:, 1:] > 1.0e-12          # interfaces below the top

    lev = jnp.arange(pver)[None, :]
    # highest active interface -> cloud top; lowest -> cloud bottom
    cldtop = jnp.min(jnp.where(active, lev, pver - 1), axis=-1)
    cldbot = jnp.max(jnp.where(active, lev, 0), axis=-1)
    pcldtop = jnp.take_along_axis(state.pmid, cldtop[:, None], axis=-1)[:, 0]
    pcldbot = jnp.take_along_axis(state.pmid, cldbot[:, None], axis=-1)[:, 0]

    return {
        "CMFMC": cmfmc,
        "CLDTOP": cldtop.astype(state.t.dtype),
        "CLDBOT": cldbot.astype(state.t.dtype),
        "PCLDTOP": pcldtop,
        "PCLDBOT": pcldbot,
        "RPRDTOT": rprd_dp + rprd_sh,
    }
