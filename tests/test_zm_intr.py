"""zm_conv_tend interface tests: pipeline order, energy closure, pbuf."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics import check_energy as ce
from cam_nor_physics_tpu.models.physics import state as st
from cam_nor_physics_tpu.models.physics.constituents import default_registry
from cam_nor_physics_tpu.models.physics.physics_buffer import (pbuf_register,
                                                               zm_pbuf_specs)
from cam_nor_physics_tpu.models.physics.zm_conv_intr import (zm_conv_tend,
                                                             zm_conv_tend_2)
from cam_nor_physics_tpu.utils import constants as c
from cam_nor_physics_tpu.utils.config import ZMConfig


@pytest.fixture(scope="module")
def zm_setup():
    reg = default_registry(extra=1)
    ncol, pver = 4, 26
    eta = np.linspace(0.003, 1.0, pver + 1) ** 1.2
    pint = jnp.asarray(eta[None, :] * 1e5 * np.ones((ncol, 1)))
    pmid = 0.5 * (pint[:, 1:] + pint[:, :-1])
    t = jnp.maximum(300.0 * (pmid / 1e5) ** 0.19, 195.0).at[:, -1].add(2.0)
    q = jnp.zeros((ncol, pver, reg.pcnst))
    q = q.at[:, :, 0].set(0.017 * (pmid / pmid[:, -1:]) ** 2.5 + 1e-6)
    q = q.at[:, -3:, 0].mul(1.15)
    # non-uniform passive tracer for convtran2
    q = q.at[:, :, 3].set(1e-6 * (pmid / pmid[:, -1:]))
    u = jnp.full((ncol, pver), 5.0)
    state = st.make_state_from_profiles(pint, t, u, jnp.zeros_like(u), q,
                                        jnp.zeros(ncol))
    state = ce.check_energy_timestep_init(state, reg)
    pbuf = pbuf_register(zm_pbuf_specs(ncol, pver))
    cfg = ZMConfig()
    out = zm_conv_tend(cfg, reg, state, pbuf, jnp.full(ncol, 800.0),
                       jnp.full(ncol, 0.3), jnp.full(ncol, 1.0), 1800.0, 3)
    return reg, state, out


class TestZMConvTend:
    def test_energy_closure(self, zm_setup):
        """Column energy change equals -Li... the condensate flux terms:
        expected flux = -rho_w*Li*0 ... precip leaves as liquid (flx_cnd)."""
        reg, state, out = zm_setup
        s1 = out.state1.replace(te_cur=state.te_cur, tw_cur=state.tw_cur)
        _, diag = ce.check_energy_chng(
            s1, reg, 1800.0, flx_cnd=out.diagnostics["PRECZ"] + out.rliq)
        assert np.max(np.abs(np.asarray(diag.te_err / diag.te))) < 1e-10

    def test_water_closure(self, zm_setup):
        reg, state, out = zm_setup
        s1 = out.state1.replace(te_cur=state.te_cur, tw_cur=state.tw_cur)
        _, diag = ce.check_energy_chng(
            s1, reg, 1800.0, flx_cnd=out.diagnostics["PRECZ"] + out.rliq)
        # residual is dominated by the qneg3 qmin-floor creation on
        # CLDLIQ/CLDICE (~ qmin * ps/g ~ 1e-8 kg/m2), same as the reference
        assert np.max(np.abs(np.asarray(diag.tw_err))) / \
            np.max(np.asarray(diag.tw)) < 1e-8

    def test_triggered_and_raining(self, zm_setup):
        reg, state, out = zm_setup
        assert np.all(np.asarray(out.diagnostics["CAPE"]) > 70.0)
        assert np.all(np.asarray(out.diagnostics["PRECZ"]) > 0.0)
        assert np.all(np.asarray(out.diagnostics["FREQZM"]) == 1.0)

    def test_pbuf_populated(self, zm_setup):
        reg, state, out = zm_setup
        assert float(jnp.max(out.pbuf.get("ZM_MU"))) > 0.0
        assert float(jnp.max(out.pbuf.get("DP_FLXPRC"))) > 0.0
        np.testing.assert_allclose(np.asarray(out.pbuf.get("PREC_DP")),
                                   np.asarray(out.diagnostics["PRECZ"]))

    def test_momentum_transported(self, zm_setup):
        reg, state, out = zm_setup
        # uniform u=5 has no vertical shear -> momtran tendency ~ 0;
        # state u must stay finite and close to 5
        assert np.allclose(np.asarray(out.state1.u), 5.0, atol=0.5)

    def test_convtran2_acts_on_gradient_tracer(self, zm_setup):
        reg, state, out = zm_setup
        p2 = zm_conv_tend_2(reg, out.state1, out.pbuf, 1800.0)
        assert p2.lq == (False, False, False, True)
        # tracer has vertical gradient -> nonzero transport in deep columns
        assert float(jnp.max(jnp.abs(p2.q[:, :, 3]))) > 0.0
        # and conserves column mass
        col = np.sum(np.asarray(p2.q[:, :, 3]) *
                     np.asarray(out.pbuf.get("ZM_DP")), axis=1)
        tot = np.sum(np.abs(np.asarray(p2.q[:, :, 3])) *
                     np.asarray(out.pbuf.get("ZM_DP")), axis=1) + 1e-30
        assert np.all(np.abs(col) / tot < 1e-9)

    def test_diagnostics_complete(self, zm_setup):
        reg, state, out = zm_setup
        expected = {"CAPE", "FREQZM", "CMFMC_DP", "ZMMU", "ZMMD", "ZMDT",
                    "ZMDQ", "DLFZM", "EVAPTZM", "EVAPQZM", "ZMFLXPRC",
                    "ZMNTPRPD", "PRECZ", "ZMMTT", "ZMMTU", "ZMMTV",
                    "ZMDLIQ", "ZMDICE", "PCONVT", "PCONVB"}
        assert expected <= set(out.diagnostics)
