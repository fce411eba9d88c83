"""Single-column model mode — SCAM equivalent.

The reference treats single-column mode as the de-facto physics unit-test
harness (SURVEY §4): `single_column`/`scm_crm_mode` short-circuit the dycore
(/root/reference/physics/physpkg.F90:28, 1167, 1221-1228) and the physics is
driven by prescribed large-scale forcing (IOP soundings).

`scam_run` steps the full tphysbc/tphysac sequence on a 1..N-column state
with prescribed advective tendencies applied between physics calls — the
BFB_CAM_SCAM_IOP-style workflow, batched (many independent columns at once is
the natural TPU formulation of an IOP ensemble).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils.config import PhysConfig, ZMConfig
from .coupling.camsrfexch import CamIn
from .physics.constituents import ConstituentRegistry
from .physics.physics_buffer import PhysicsBuffer, pbuf_register
from .physics.physpkg import phys_run1, phys_run2, physpkg_pbuf_specs
from .physics.state import PhysicsState


@struct.dataclass
class ScamForcing:
    """Prescribed large-scale forcing per step (IOP role): advective
    tendencies of T and q, and vertical velocity."""

    dtdt_ls: jnp.ndarray       # (ncol, pver) K/s
    dqdt_ls: jnp.ndarray       # (ncol, pver) kg/kg/s
    omega: jnp.ndarray         # (ncol, pver) Pa/s

    @classmethod
    def zeros(cls, ncol: int, pver: int, dtype=jnp.float64) -> "ScamForcing":
        z = jnp.zeros((ncol, pver), dtype)
        return cls(dtdt_ls=z, dqdt_ls=z, omega=z)


def scam_init_pbuf(ncol: int, pver: int, dtype=jnp.float64) -> PhysicsBuffer:
    pbuf = pbuf_register(physpkg_pbuf_specs(ncol, pver), dtype)
    return pbuf.update(CLD=jnp.full((ncol, pver), 0.1, dtype),
                       PBLH=jnp.full((ncol,), 500.0, dtype))


def scam_step(phys_cfg: PhysConfig, zm_cfg: ZMConfig,
              registry: ConstituentRegistry, state: PhysicsState,
              pbuf: PhysicsBuffer, cam_in: CamIn, forcing: ScamForcing,
              ztodt: float, nstep: int = 0):
    """One SCAM step: large-scale forcing -> tphysbc -> tphysac.

    Returns (state, pbuf, cam_out, diags)."""
    # prescribed large-scale advective tendencies (the dycore surrogate)
    state = state.replace(
        t=state.t + ztodt * forcing.dtdt_ls,
        q=state.q.at[:, :, 0].add(ztodt * forcing.dqdt_ls),
        omega=forcing.omega)

    o1 = phys_run1(phys_cfg, zm_cfg, registry, state, pbuf, cam_in, ztodt,
                   nstep=nstep)
    o2 = phys_run2(phys_cfg, registry, o1.state, o1.pbuf, cam_in, ztodt)
    diags = dict(o1.diagnostics)
    diags.update(o2.diagnostics)
    return o2.state, o2.pbuf, o2.cam_out, diags


def scam_run(phys_cfg: PhysConfig, zm_cfg: ZMConfig,
             registry: ConstituentRegistry, state: PhysicsState,
             cam_in: CamIn, forcing: ScamForcing, ztodt: float,
             nsteps: int):
    """Run nsteps of single-column physics with fixed forcing, jitted as one
    scan (the IOP integration loop)."""
    pbuf = scam_init_pbuf(state.ncol, state.pver, state.t.dtype)

    def step(carry, i):
        st, pb = carry
        st, pb, cam_out, _ = scam_step(phys_cfg, zm_cfg, registry, st, pb,
                                       cam_in, forcing, ztodt,
                                       nstep=1)
        return (st, pb), (cam_out.precc, st.t[:, -1])

    # first step without the energy fixer (no TEOUT yet)
    state, pbuf, cam_out, _ = scam_step(phys_cfg, zm_cfg, registry, state,
                                        pbuf, cam_in, forcing, ztodt,
                                        nstep=0)
    (state, pbuf), (precc, tbot) = jax.lax.scan(
        step, (state, pbuf), jnp.arange(nsteps - 1)) if nsteps > 1 else \
        ((state, pbuf), (cam_out.precc[None], state.t[None, :, -1]))
    return state, pbuf, dict(precc=precc, tbot=tbot)
