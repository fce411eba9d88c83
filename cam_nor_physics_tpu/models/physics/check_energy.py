"""Column energy/water conservation bookkeeping — upstream `check_energy` equivalent.

The reference wraps every parameterization with check_energy_chng and runs a
global check_energy_gmean each step (/root/reference/physics/physpkg.F90:1115,
2726-2781, 2867; contract pinned in SURVEY §2.2). These checks are the
reference's de-facto test suite, so they are first-class here.

Total energy formulation (constant-cp, moist-pressure-coordinate hydrostatic
energy — the enthalpy form, in which the column potential energy is carried by
cp*T plus the surface term, so a pure heating Q changes te by exactly Q*dt):
    te = Σ_k pdel/g [ cp T + (u²+v²)/2 + (Lv+Li) qv + Li ql ] + phis (ps-ptop)/g
    tw = Σ_k pdel/g [ qv + ql + qi ]
with s the dry static energy (cp T + g z + phis). Expected change over a step
equals dt * (net boundary fluxes); the residual is returned, never aborted on —
callers feed it to blow-up sentinels / tests.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ...utils import constants as c
from .constituents import ConstituentRegistry
from .state import PhysicsState


@struct.dataclass
class EnergyDiag:
    """Residuals from one check_energy_chng call (per column)."""

    te: jnp.ndarray          # new total energy
    tw: jnp.ndarray          # new total water
    te_err: jnp.ndarray      # te - (te_cur + dt*expected_flux)
    tw_err: jnp.ndarray


def column_energy(state: PhysicsState, registry: ConstituentRegistry):
    """(te, tw) vertical integrals per column."""
    w = state.pdel / c.GRAVIT
    ke = 0.5 * (state.u ** 2 + state.v ** 2)
    qv = state.q[:, :, 0]
    ixliq = registry.index("CLDLIQ")
    ixice = registry.index("CLDICE")
    ql = state.q[:, :, ixliq] if ixliq > 0 else jnp.zeros_like(qv)
    qi = state.q[:, :, ixice] if ixice > 0 else jnp.zeros_like(qv)
    te = (jnp.sum(w * (c.CPAIR * state.t + ke + (c.LATVAP + c.LATICE) * qv
                       + c.LATICE * ql), axis=-1)
          + state.phis * (state.pint[:, -1] - state.pint[:, 0]) / c.GRAVIT)
    tw = jnp.sum(w * (qv + ql + qi), axis=-1)
    return te, tw


def check_energy_timestep_init(state: PhysicsState,
                               registry: ConstituentRegistry) -> PhysicsState:
    """Set te_ini/tw_ini at the start of the physics step
    (check_energy_timestep_init, called from d_p_coupling dp_coupling.F90:655)."""
    te, tw = column_energy(state, registry)
    return state.replace(te_ini=te, te_cur=te, tw_ini=tw, tw_cur=tw)


def check_energy_chng(state: PhysicsState, registry: ConstituentRegistry,
                      dt: float,
                      flx_vap=None, flx_cnd=None, flx_ice=None, flx_sen=None,
                      ) -> tuple[PhysicsState, EnergyDiag]:
    """Verify energy/water change matches boundary fluxes and update te_cur/tw_cur
    (check_energy_chng equivalent; call pattern physpkg.F90:2867 etc.).

    flx_vap: water vapor flux in (kg/m2/s); flx_cnd: TOTAL condensate flux
    out (m/s liquid-water-equivalent — rain INCLUDING snow, plus every
    reserved/detrained condensate stream); flx_ice: the frozen SUBSET of
    flx_cnd (snow + detrained ice); flx_sen: sensible heat flux in (W/m2).
    """
    ncol = state.ncol
    zero = jnp.zeros((ncol,), dtype=state.t.dtype)
    flx_vap = zero if flx_vap is None else flx_vap
    flx_cnd = zero if flx_cnd is None else flx_cnd
    flx_ice = zero if flx_ice is None else flx_ice
    flx_sen = zero if flx_sen is None else flx_sen

    te, tw = column_energy(state, registry)
    # expected changes from boundary fluxes over dt (CAM check_energy
    # convention): total energy counts (latvap+latice) per unit vapor, so
    # condensate leaving as LIQUID debits the un-released latice while ice
    # leaving debits nothing (its latice was released in the column when
    # it froze/deposited) — hence the (flx_cnd - flx_ice) factor. flx_cnd
    # is the TOTAL condensate flux out (prec includes snow; rliq includes
    # the detrained-ice stream), so water debits flx_cnd alone.
    te_xpd = state.te_cur + dt * (
        flx_sen
        + (c.LATVAP + c.LATICE) * flx_vap
        - (c.LATICE * c.RHOH2O) * (flx_cnd - flx_ice))
    tw_xpd = state.tw_cur + dt * (
        flx_vap - c.RHOH2O * flx_cnd)
    diag = EnergyDiag(te=te, tw=tw, te_err=te - te_xpd, tw_err=tw - tw_xpd)
    return state.replace(te_cur=te, tw_cur=tw), diag


def check_energy_fix(state: PhysicsState, registry: ConstituentRegistry,
                     teout_prev=None):
    """GLOBAL energy fixer: uniform heating closing the dycore's global
    energy error (check_energy_fix, applied at the top of tphysbc,
    physpkg.F90:2726-2781; the global mean comes from check_energy_gmean at
    phys_run1 entry).

    The deficit is the GLOBAL-MEAN difference between the energy exported at
    the end of the previous physics step (teout) and the current energy —
    per-column differences are the dycore's legitimate energy transport and
    MUST NOT be touched (a column-local fixer cancels advective energy flux
    and runs away; measured: aquaplanet tmax 494 K by step 60). The uniform
    heating is applied per unit mass so its global integral equals the
    deficit. Under pjit the means are global (psum inserted automatically).

    Returns (ncol, pver) heating in J/kg (caller divides by dt).
    `teout_prev` None -> zero.
    """
    if teout_prev is None:
        return jnp.zeros_like(state.t)
    te, _ = column_energy(state, registry)
    w = jnp.maximum(jnp.cos(state.lat), 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-30)
    deficit_glob = jnp.sum(w * (teout_prev - te)) / wsum        # J/m2
    mass_glob = jnp.sum(w * (state.pint[:, -1] - state.pint[:, 0])) / \
        (wsum * c.GRAVIT)                                        # kg/m2
    heat = deficit_glob / jnp.maximum(mass_glob, 1e-30)          # J/kg
    return jnp.broadcast_to(heat, state.t.shape)


def check_energy_gmean(state: PhysicsState, registry: ConstituentRegistry,
                       area_weights=None):
    """Area-weighted global-mean total energy (check_energy_gmean role,
    physpkg.F90:1115, called at the top of phys_run1).

    Under pjit the column batch is global-logical, so the weighted mean IS
    the global mean — the SPMD partitioner inserts the psum (deterministic
    on TPU; the reference needs reprosum for the same property).
    """
    te, _ = column_energy(state, registry)
    if area_weights is None:
        area_weights = jnp.cos(state.lat)
    w = jnp.maximum(area_weights, 0.0)
    return jnp.sum(w * te) / jnp.maximum(jnp.sum(w), 1e-30)
