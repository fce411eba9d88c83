"""Physics driver tests: tphysbc/tphysac sequencing, energy fixer behavior,
dry adjustment, dme adjustment, surface-flux application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Big-compile tests: serialized onto one xdist worker (--dist loadgroup) so
# concurrent XLA CPU compiles don't abort under memory pressure (observed
# 'Fatal Python error: Aborted' inside backend_compile_and_load when four
# workers compiled coupled-step graphs simultaneously).
pytestmark = pytest.mark.xdist_group("heavy")

from cam_nor_physics_tpu.models.coupling.camsrfexch import CamIn
from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.models.physics.dadadj import dadadj
from cam_nor_physics_tpu.models.physics.physics_buffer import pbuf_register
from cam_nor_physics_tpu.models.physics.physpkg import (phys_run1, phys_run2,
                                                        physpkg_pbuf_specs)
from cam_nor_physics_tpu.models.physics.state import (make_state_from_profiles,
                                                      physics_dme_adjust)
from cam_nor_physics_tpu.utils import constants as c
from cam_nor_physics_tpu.utils.config import PhysConfig, ZMConfig


@pytest.fixture(scope="module")
def setup():
    ncol, pver = 8, 26
    reg = default_registry()
    pcnst = reg.pcnst
    eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
    pint = jnp.asarray(eta[None, :] * 1.0e5 * np.ones((ncol, 1)))
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0).at[:, -1].add(2.0)
    q0 = (0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6)
    q0 = q0.at[:, -3:].multiply(1.15)
    q = jnp.zeros((ncol, pver, pcnst)).at[:, :, 0].set(q0)
    q = q.at[:, :, 1:].set(1e-8)
    st = make_state_from_profiles(pint, t, jnp.zeros((ncol, pver)),
                                  jnp.zeros((ncol, pver)), q,
                                  jnp.zeros((ncol,)))
    pbuf = pbuf_register(physpkg_pbuf_specs(ncol, pver))
    pbuf = pbuf.update(CLD=jnp.full((ncol, pver), 0.1),
                       PBLH=jnp.full((ncol,), 800.0),
                       TPERT=jnp.full((ncol,), 0.3))
    cam_in = CamIn.zeros(ncol, pcnst)
    cam_in = cam_in.replace(shf=jnp.full((ncol,), 20.0),
                            landfrac=jnp.ones((ncol,)),
                            cflx=cam_in.cflx.at[:, 0].set(5e-5))
    return reg, st, pbuf, cam_in, PhysConfig(), ZMConfig()


def full_step(setup, nstep):
    reg, st, pbuf, cam_in, pcfg, zcfg = setup
    o1 = phys_run1(pcfg, zcfg, reg, st, pbuf, cam_in, 1800.0, nstep=nstep)
    o2 = phys_run2(pcfg, reg, o1.state, o1.pbuf, cam_in, 1800.0)
    return o1, o2


class TestPhyspkg:
    def test_two_steps_finite(self, setup):
        reg, st, pbuf, cam_in, pcfg, zcfg = setup
        o1, o2 = full_step(setup, 0)
        for leaf in jax.tree.leaves(o2.state):
            assert bool(jnp.isfinite(leaf).all())
        # TEOUT was written and is a plausible column energy
        assert float(o2.pbuf.get("TEOUT").min()) > 1e8

    def test_deep_convection_ran(self, setup):
        o1, _ = full_step(setup, 0)
        assert float(o1.cam_out.precc.max()) > 0.0
        assert float(o1.diagnostics["CAPE"].max()) > 0.0
        assert "CMFMC" in o1.diagnostics

    def test_water_and_energy_budget(self, setup):
        """tphysbc total water change == -precip over dt (no other sinks);
        precip carries latent heating accounted by check_energy."""
        reg, st, pbuf, cam_in, pcfg, zcfg = setup
        o1, _ = full_step(setup, 0)
        dt = 1800.0
        tw0 = np.asarray(st.q[:, :, 0] * st.pdel).sum(axis=1) / c.GRAVIT
        s1 = o1.state
        tw1 = np.asarray(s1.q[:, :, 0] * s1.pdel).sum(axis=1) / c.GRAVIT
        prec = np.asarray(o1.cam_out.precc)    # total (snow is a subset)
        # rliq is reserved (handed to the stratiform scheme), counts as water
        rliq = np.asarray(o1.pbuf.get("RLIQBC"))
        np.testing.assert_allclose(tw1 - tw0,
                                   -(prec + rliq) * dt * c.RHOH2O,
                                   rtol=1e-9, atol=1e-10)

    def test_energy_fixer_closes_deficit(self, setup):
        """With a TEOUT below current energy, the fixer must remove energy so
        the new column energy matches TEOUT."""
        reg, st, pbuf, cam_in, pcfg, zcfg = setup
        from cam_nor_physics_tpu.models.physics.check_energy import \
            column_energy
        te0, _ = column_energy(st, reg)
        target = te0 - 5.0e5          # J/m2 deficit
        pbuf2 = pbuf.set("TEOUT", target).set(
            "TEOUT_VALID", jnp.ones((1,), target.dtype))
        o1 = phys_run1(pcfg, zcfg, reg, st, pbuf2, cam_in, 1800.0, nstep=1)
        err = np.abs(np.asarray(o1.diagnostics["EFIX"]) * 1800.0 - (-5.0e5))
        assert float(err.max()) < 1.0

    def test_surface_fluxes_warm_and_moisten(self, setup):
        reg, st, pbuf, cam_in, pcfg, zcfg = setup
        o1 = phys_run1(pcfg, zcfg, reg, st, pbuf, cam_in, 1800.0, nstep=0)
        base = phys_run2(pcfg, reg, o1.state, o1.pbuf,
                         CamIn.zeros(st.ncol, st.pcnst), 1800.0)
        flux = phys_run2(pcfg, reg, o1.state, o1.pbuf, cam_in, 1800.0)
        # sensible heat warms the lowest layer relative to the no-flux run
        dT = np.asarray(flux.state.t[:, -1] - base.state.t[:, -1])
        assert (dT > 0).all()
        dq = np.asarray(flux.state.q[:, -1, 0] - base.state.q[:, -1, 0])
        assert (dq > 0).all()


class TestDadadj:
    def test_removes_instability(self):
        ncol, pver = 4, 10
        pmid = jnp.broadcast_to(jnp.linspace(2e3, 9.8e4, pver), (ncol, pver))
        pdel = jnp.full((ncol, pver), 1e4)
        # unstable top: theta increasing downward in the top 3 layers
        t = jnp.broadcast_to(jnp.linspace(200.0, 280.0, pver), (ncol, pver))
        exn = (pmid / 1e5) ** c.CAPPA
        th = t / exn
        th = th.at[:, 0].set(th[:, 1] - 10.0)     # top colder than below
        t_unst = th * exn
        q = jnp.full((ncol, pver), 1e-5)
        t_adj, q_adj = dadadj(t_unst, q, pmid, pdel, nlvdry=3)
        th_adj = t_adj / exn
        assert float((th_adj[:, 0] - th_adj[:, 1]).min()) >= -1e-9
        # enthalpy conserved in the adjusted region
        np.testing.assert_allclose(
            np.asarray((t_adj * pdel).sum(axis=1)),
            np.asarray((t_unst * pdel).sum(axis=1)), rtol=1e-12)


class TestDmeAdjust:
    def test_dry_mass_preserved(self, setup):
        reg, st, pbuf, cam_in, pcfg, zcfg = setup
        qini = st.q[:, :, 0]
        # physics added vapor
        st2 = st.replace(q=st.q.at[:, :, 0].multiply(1.1))
        adj = physics_dme_adjust(st2, qini, reg)
        # per-layer dry mass pdel*(1-qv) unchanged vs before physics
        dry0 = np.asarray(st.pdel * (1.0 - st.q[:, :, 0]))
        dry1 = np.asarray(adj.pdel * (1.0 - adj.q[:, :, 0]))
        np.testing.assert_allclose(dry1, dry0, rtol=1e-9)

    def test_energy_conserving_variant(self, setup):
        reg, st, pbuf, cam_in, pcfg, zcfg = setup
        qini = st.q[:, :, 0]
        st2 = st.replace(q=st.q.at[:, :, 0].multiply(1.05))
        adj = physics_dme_adjust(st2, qini, reg, variant="tht")
        e_pre = np.asarray((st2.pdel * (c.CPAIR * st2.t + (c.LATVAP + c.LATICE)
                                        * st2.q[:, :, 0])).sum(axis=1))
        e_post = np.asarray((adj.pdel * (c.CPAIR * adj.t + (c.LATVAP + c.LATICE)
                                         * adj.q[:, :, 0])).sum(axis=1))
        np.testing.assert_allclose(e_post, e_pre, rtol=1e-12)
