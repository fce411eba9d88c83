"""Aerosol-optics integration: AOD diagnostics through tphysbc."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
from cam_nor_physics_tpu.models.physics.constituents import (Constituent,
                                                             default_registry)
from cam_nor_physics_tpu.models.physics.modal_aer_opt import (
    AeroMode, make_synthetic_table)
from cam_nor_physics_tpu.models.physics.physics_buffer import pbuf_register
from cam_nor_physics_tpu.models.physics.physpkg import (phys_run1,
                                                        physpkg_pbuf_specs)
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles
from cam_nor_physics_tpu.utils.config import PhysConfig, ZMConfig


def test_aod_diagnostics_emitted_through_tphysbc():
    reg = default_registry()
    for nm in ("so4_a1", "pom_a1"):
        reg = reg.add(Constituent(name=nm, longname=nm, qmin=0.0,
                                  mixtype="wet"))
    pcnst = reg.pcnst
    ncol, pver = 6, 26
    eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
    pint = jnp.asarray(eta[None, :] * 1.0e5 * np.ones((ncol, 1)))
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0).at[:, -1].add(2.0)
    q0 = 0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6
    q = jnp.zeros((ncol, pver, pcnst)).at[:, :, 0].set(q0)
    q = q.at[:, :, reg.index("so4_a1")].set(2e-9)
    q = q.at[:, :, reg.index("pom_a1")].set(1e-9)
    st = make_state_from_profiles(
        pint, t, jnp.zeros((ncol, pver)), jnp.zeros((ncol, pver)), q,
        jnp.zeros((ncol,)))
    mode = AeroMode(name="accum", species_names=("so4_a1", "pom_a1"),
                    species_density=(1770.0, 1000.0),
                    species_refindex_sw=(complex(1.43, 1e-8),
                                         complex(1.55, 5e-3)),
                    species_refindex_lw=(complex(1.35, 0.2),
                                         complex(1.5, 0.1)),
                    table=make_synthetic_table())
    pcfg = PhysConfig(aero_modes=(mode,))
    pbuf = pbuf_register(physpkg_pbuf_specs(ncol, pver))
    # DGNUMWET/QAERWAT are filled internally by the calcsize + wateruptake
    # pipeline (physpkg.F90:2906-2913), not seeded here
    pbuf = pbuf.update(CLD=jnp.full((ncol, pver), 0.1),
                       PBLH=jnp.full((ncol,), 800.0),
                       TPERT=jnp.full((ncol,), 0.3))
    cam_in = CamIn.zeros(ncol, pcnst).replace(landfrac=jnp.ones((ncol,)))
    o1 = jax.jit(lambda s, pb: phys_run1(pcfg, ZMConfig(), reg, s, pb,
                                         cam_in, 1800.0, nstep=0))(st, pbuf)
    aod = np.asarray(o1.diagnostics["AODVIS_accum"])
    assert (aod > 0).all() and np.isfinite(aod).all()
    assert "BURDEN_accum" in o1.diagnostics
    # off when use_oslo_aero (the physpkg branch, physpkg.F90:2914-2920)
    pcfg_oslo = PhysConfig(aero_modes=(mode,), use_oslo_aero=True)
    o2 = phys_run1(pcfg_oslo, ZMConfig(), reg, st, pbuf, cam_in, 1800.0,
                   nstep=0)
    assert "AODVIS_accum" not in o2.diagnostics
