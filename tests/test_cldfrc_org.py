"""Cloud fraction diagnostic and ZM organization tracer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics.cloud_fraction import (cldfrc,
                                                               cldfrc_sundqvist)
from cam_nor_physics_tpu.models.physics.constituents import (Constituent,
                                                             default_registry)
from cam_nor_physics_tpu.models.physics.state import make_state_from_profiles


def _state(rh_target=0.95):
    ncol, pver = 4, 10
    pint = jnp.broadcast_to(jnp.linspace(1e4, 1e5, pver + 1),
                            (ncol, pver + 1))
    t = jnp.full((ncol, pver), 280.0)
    from cam_nor_physics_tpu.ops.saturation import qsat
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    _, qs = qsat(t, pmid)
    q = (rh_target * qs)[:, :, None]
    return make_state_from_profiles(pint, t, jnp.zeros((ncol, pver)),
                                    jnp.zeros((ncol, pver)), q,
                                    jnp.zeros((ncol,)))


class TestCldfrc:
    def test_sundqvist_limits(self):
        assert float(cldfrc_sundqvist(jnp.asarray(1.0), 0.9)) == 1.0
        assert float(cldfrc_sundqvist(jnp.asarray(0.5), 0.9)) == 0.0
        mid = float(cldfrc_sundqvist(jnp.asarray(0.95), 0.9))
        assert 0.0 < mid < 1.0

    def test_moist_cloudier_than_dry(self):
        c_moist = np.asarray(cldfrc(_state(0.97)))
        c_dry = np.asarray(cldfrc(_state(0.40)))
        assert c_moist.mean() > c_dry.mean()
        np.testing.assert_allclose(c_dry, 0.0, atol=1e-12)

    def test_convective_fraction_adds(self):
        st = _state(0.40)
        cmfmc = jnp.full((4, 11), 0.02)
        c = np.asarray(cldfrc(st, cmfmc))
        assert (c > 0.0).all() and (c <= 1.0).all()


class TestZMOrg:
    def test_org_tracer_sourced_and_feeds_back(self):
        from cam_nor_physics_tpu.models.physics.physics_buffer import (
            pbuf_register, zm_pbuf_specs)
        from cam_nor_physics_tpu.models.physics.zm_conv_intr import \
            zm_conv_tend
        from cam_nor_physics_tpu.utils.config import ZMConfig

        reg = default_registry().add(
            Constituent(name="ZM_ORG", longname="ZM organization",
                        qmin=0.0, mixtype="dry"))
        pcnst = reg.pcnst
        ncol, pver = 4, 26
        eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
        pint = jnp.asarray(eta[None, :] * 1.0e5 * np.ones((ncol, 1)))
        pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
        t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0)
        t = t.at[:, -1].add(2.0)
        q0 = 0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6
        q = jnp.zeros((ncol, pver, pcnst)).at[:, :, 0].set(q0)
        st = make_state_from_profiles(
            pint, t, jnp.zeros((ncol, pver)), jnp.zeros((ncol, pver)), q,
            jnp.zeros((ncol,)))
        pbuf = pbuf_register(zm_pbuf_specs(ncol, pver))
        pbuf = pbuf.set("CLD", jnp.full((ncol, pver), 0.3))
        cfg = ZMConfig(org=True)
        out = zm_conv_tend(cfg, reg, st, pbuf, jnp.full((ncol,), 800.0),
                           jnp.full((ncol,), 0.3), jnp.ones((ncol,)), 1800.0)
        ix = reg.index("ZM_ORG")
        org = np.asarray(out.state1.q[:, :, ix])
        assert np.isfinite(org).all()
        # evaporation must have produced organization somewhere
        assert org.max() > 0.0
        assert "ZM_ORG2D" in out.diagnostics
