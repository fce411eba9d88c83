"""Top-level atmosphere component — cam_comp equivalent.

The reference's upstream driver calls, per timestep (sequence inferred in
SURVEY §1 from the tphysbc/tphysac split and dp_coupling's copy directions):

    phys_run1 -> surface coupler -> phys_run2 -> p_d_coupling -> dyn_run
    -> d_p_coupling

This module provides that loop as one jittable step over the coupled state
(dycore state + physics export + physics buffer), plus initialization from a
dycore initial condition. The surface coupler is an injection point: `cam_in`
is an input each step (prescribed-surface / data-ocean mode), matching the
reference's surface-exchange contract (camsrfexch).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import struct

from ..utils.config import FVConfig, PhysConfig, ZMConfig
from .coupling.camsrfexch import CamIn, CamOut
from .coupling.dp_coupling import (d_p_coupling, d_p_coupling_diags,
                                   p_d_coupling)
from .fv.cd_core import DynState
from .fv.dyn_comp import dyn_run
from .fv.grid import FVGrid, make_grid
from .fv.vertical import HybridCoord, hybrid_coefficients
from .physics.constituents import ConstituentRegistry, default_registry
from .physics.physics_buffer import PhysicsBuffer, pbuf_register
from .physics.physpkg import (PhysRunOut, phys_run1, phys_run2,
                              physpkg_pbuf_specs)
from .physics.state import PhysicsState


@dataclass(frozen=True)
class AtmModel:
    """Model description (grids, configs, registry) — dyn_init/phys_init
    role. Registered as a JAX pytree (grid/coord tables are leaves; configs
    and registry are static aux) so jitted steps can take the model as an
    ARGUMENT: closure-captured grid tables become executable constants,
    which disable the axon runtime's fast execution path (see FVGrid)."""

    grid: FVGrid
    coord: HybridCoord
    registry: ConstituentRegistry
    fv_cfg: FVConfig
    phys_cfg: PhysConfig
    zm_cfg: ZMConfig
    dt: float                      # coupling (large) timestep (s)
    # polar filter implementation: "fft" (default) or "matmul" (circulant,
    # MXU path; required for sharded runs on CPU backends whose SPMD FFT
    # has layout restrictions — see grid.py)
    filter_impl: str = "fft"

    @classmethod
    def create(cls, im: int, jm: int, km: int, dt: float = 1800.0,
               registry: ConstituentRegistry | None = None,
               fv_cfg: FVConfig | None = None,
               phys_cfg: PhysConfig | None = None,
               zm_cfg: ZMConfig | None = None,
               filter_impl: str = "fft") -> "AtmModel":
        return cls(grid=make_grid(im, jm, km),
                   coord=hybrid_coefficients(km),
                   registry=registry or default_registry(),
                   fv_cfg=fv_cfg or FVConfig(),
                   phys_cfg=phys_cfg or PhysConfig(),
                   zm_cfg=zm_cfg or ZMConfig(), dt=dt,
                   filter_impl=filter_impl)


def _register_atmmodel_pytree() -> None:
    import jax

    def flatten(m):
        return (m.grid, m.coord), \
            (m.registry, m.fv_cfg, m.phys_cfg, m.zm_cfg, m.dt, m.filter_impl)

    def unflatten(aux, children):
        registry, fv_cfg, phys_cfg, zm_cfg, dt, filter_impl = aux
        return AtmModel(grid=children[0], coord=children[1],
                        registry=registry, fv_cfg=fv_cfg, phys_cfg=phys_cfg,
                        zm_cfg=zm_cfg, dt=dt, filter_impl=filter_impl)

    jax.tree_util.register_pytree_node(AtmModel, flatten, unflatten)


_register_atmmodel_pytree()


@struct.dataclass
class AtmState:
    """Coupled prognostic + persistent state: the checkpoint payload
    (SURVEY §5.4 — dycore state, 'global' pbuf fields, step counter)."""

    dyn: DynState
    phys: PhysicsState            # physics export of the current step
    pbuf: PhysicsBuffer
    phis: jnp.ndarray             # (jm, im) surface geopotential
    nstep: jnp.ndarray            # scalar int32 step counter


def atm_init(model: AtmModel, dyn_state: DynState, phis) -> AtmState:
    """Build the coupled state from a dycore IC (dyn_init + first
    d_p_coupling; read_inidat analytic-IC role, dyn_comp.F90:2889-3081)."""
    ncol = model.grid.jm * model.grid.im
    pbuf = pbuf_register(
        physpkg_pbuf_specs(ncol, model.grid.km,
                           pcnst=model.registry.pcnst),
        dyn_state.delp.dtype)
    pbuf = pbuf.update(
        CLD=jnp.full((ncol, model.grid.km), 0.1, dyn_state.delp.dtype),
        PBLH=jnp.full((ncol,), 500.0, dyn_state.delp.dtype))
    phys = d_p_coupling(dyn_state, model.grid, phis, model.coord.ptop,
                        model.registry)
    return AtmState(dyn=dyn_state, phys=phys, pbuf=pbuf, phis=phis,
                    nstep=jnp.zeros((), jnp.int32))


def atm_step(model: AtmModel, state: AtmState, cam_in: CamIn,
             first_step: bool = False
             ) -> tuple[AtmState, CamOut, dict]:
    """One coupled timestep (cam_comp run sequence, SURVEY §1).

    `first_step=True` disables the energy fixer (no TEOUT yet), matching the
    reference's nstep==0 branch (physpkg.F90:2899). Returns the new state,
    the surface export, and the merged diagnostics dict.
    """
    g, coord, reg = model.grid, model.coord, model.registry

    # pre-coupler physics on the current export
    o1: PhysRunOut = phys_run1(model.phys_cfg, model.zm_cfg, reg,
                               state.phys, state.pbuf, cam_in, model.dt,
                               nstep=0 if first_step else 1)
    # (surface coupler runs here in the host model — cam_in is its product)
    o2: PhysRunOut = phys_run2(model.phys_cfg, reg, o1.state, o1.pbuf,
                               cam_in, model.dt)

    # physics -> dycore, large dynamics step, dycore -> physics
    dyn = p_d_coupling(state.dyn, o2.state, g, coord.ptop, model.dt, reg)
    dyn, dyn_diags = dyn_run(dyn, g, coord, state.phis, model.fv_cfg,
                             model.dt, filter_impl=model.filter_impl,
                             return_diags=True)
    phys = d_p_coupling(dyn, g, state.phis, coord.ptop, reg,
                        omega=dyn_diags["omega"])

    diags = dict(o1.diagnostics)
    diags.update(o2.diagnostics)
    pbuf = o2.pbuf

    # before/after-physics snapshots + total physics tendencies (the
    # TBP/TAP families, cam_diagnostics.F90:246-298, 2696)
    from .physics.cam_diagnostics import (constituent_burdens,
                                          diag_conv_tidal,
                                          diag_phys_tend_writeout,
                                          tidal_coeffs)
    diags.update(diag_phys_tend_writeout(state.phys, o2.state, model.dt,
                                         cnst_names=reg.names))
    # per-constituent column burdens (constituent_burden_comp role)
    diags.update(constituent_burdens(o2.state, reg.names))

    # migrating-tide products (diag_conv's tidal_diag block,
    # cam_diagnostics.F90:2156-2161): DTCOND x local-solar-time harmonics;
    # lon/time live at this level (grid + step counter)
    if "DTCOND" in diags:
        time_days = (state.nstep.astype(diags["DTCOND"].dtype) + 1.0) * \
            (model.dt / 86400.0)
        coeffs = tidal_coeffs(jnp.asarray(g.lons), time_days,
                              diags["DTCOND"].dtype)
        diags.update(diag_conv_tidal(diags["DTCOND"], coeffs))

    # diagnostic side of d_p_coupling (dp_coupling.F90:274-320): GW
    # frontogenesis sources + QBO zonal mean into the pbuf, TEM circulation
    # diagnostics into the history payload
    pc = model.phys_cfg
    cdiag = d_p_coupling_diags(
        dyn, g, coord.ptop, omega=dyn_diags["omega"],
        use_gw_front=pc.use_gw_front, qbo_use_forcing=pc.qbo_use_forcing,
        do_circulation_diags=pc.do_circulation_diags)
    ctem = cdiag.pop("ctem", None)
    if cdiag:
        pbuf = pbuf.update(**cdiag)
    if ctem is not None:
        diags.update(ctem)
    if model.fv_cfg.am_diag:
        diags.update({k: v for k, v in dyn_diags.items()
                      if k.startswith("AM_")})

    new = AtmState(dyn=dyn, phys=phys, pbuf=pbuf, phis=state.phis,
                   nstep=state.nstep + 1)
    return new, o2.cam_out, diags
