"""Reference-parity oracle tests for the ZM deep-convection core.

Pins the TPU-native whole-array forms (cam_nor_physics_tpu/models/physics/
zm_conv.py) against line-faithful scalar-loop NumPy transliterations of the
reference Fortran (tests/oracles/zm_conv_oracle.py, from
/root/reference/physics/zm_conv.F90) in float64 — the in-environment route
to the "allclose vs Fortran" north star for the physics side (VERDICT r2
item 3; the tp_core side is pinned by test_oracle_parity.py).

Strategy: run the repo's own buoyan_dilute + cldprp on physical soundings
to obtain plume-consistent profile inputs (mu/eu/du/md/ed/sd/qd/ql/... are
zero outside [jt, mx], which the reference's gathered loops assume), then
feed the SAME arrays to both the repo routine and the oracle.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cam_nor_physics_tpu.models.physics import zm_conv as zm
from cam_nor_physics_tpu.utils import constants as c
from cam_nor_physics_tpu.utils.config import ZMConfig

from oracles import zm_conv_oracle as orc
from test_zm_conv import MSG, make_sounding

RTOL = 1e-12
ATOL = 1e-14


def _pipeline(s, cfg):
    """Replicate the zm_convr glue (zm_conv.py::zm_convr, first-call path)
    up to the closure/q1q2 inputs; returns a dict of intermediates."""
    t, qh = s["t"], s["q"]
    ncol, pver = t.shape
    karr = jnp.arange(pver)

    zs = s["geos"] / c.GRAVIT
    p = s["pmid"] * 0.01
    pf = s["pint"] * 0.01
    z = s["zm"] + zs[:, None]
    zf = s["zi"] + zs[:, None]
    dp = 0.01 * s["pdel"]

    near = jnp.abs(z - zs[:, None] - s["pblh"][:, None]) < \
        (zf[:, :-1] - zf[:, 1:]) * 0.5
    near = near & (karr >= MSG) & (karr <= pver - 2)
    pblt = jnp.where(near.any(axis=1),
                     jnp.argmax(near, axis=1), pver - 1).astype(t.dtype)

    q = qh
    sdse = t + (c.GRAVIT / ((1.0 + c.ZVIR * q) * zm.CP)) * z
    dmpdz0 = jnp.full((ncol, pver), -cfg.tentrm, t.dtype)

    b = zm.buoyan_dilute(cfg, MSG, q, t, p, z, pf, s["zi"], zs, pblt,
                         s["tpert"], s["landfrac"], dmpdz0)
    shat = zm._log_mean_interface(sdse)
    qhat = zm._log_mean_interface(q)
    cld = zm.cldprp(cfg, MSG, q, t, p, z, sdse, zf, shat, qhat, b.mx, b.lel,
                    s["landfrac"])

    ideep = b.cape > cfg.capelmt
    if cfg.use_cin:
        ideep = ideep & (b.cin < b.cape * cfg.cin_threshd)

    dsubcld = jnp.sum(jnp.where((karr >= b.mx[:, None]) & (karr >= MSG),
                                dp, 0.0), axis=1)
    fac_mb = (zf[:, :-1] - zf[:, 1:]) / dp
    return dict(b=b, cld=cld, ideep=np.asarray(ideep), p=p, pf=pf, z=z,
                zf=zf, dp=dp, q=q, t=t, s=sdse, shat=shat, qhat=qhat,
                dsubcld=dsubcld, fac_mb=fac_mb)


def _np(x):
    return np.asarray(x, dtype=np.float64)


@pytest.fixture(scope="module")
def pipe():
    cfg = ZMConfig()
    s = make_sounding(ncol=6, pver=26, unstable=True, seed=7)
    return _pipeline(s, cfg), cfg


class TestCapeCinParity:
    def test_cape_cin_lel(self, pipe):
        d, cfg = pipe
        b = d["b"]
        plge600 = _np(b.pl) >= cfg.plclmin
        cape, cin, lel = orc.cape_cin_oracle(
            _np(b.buoy), _np(d["pf"]), plge600,
            np.asarray(b.lcl), np.asarray(b.mx), MSG, cfg.num_cin)
        np.testing.assert_allclose(_np(b.cape), cape, rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(_np(b.cin), cin, rtol=RTOL, atol=ATOL)
        np.testing.assert_array_equal(np.asarray(b.lel), lel)

    def test_triggers_fire(self, pipe):
        d, _ = pipe
        assert d["ideep"].any(), "sounding must trigger for a useful test"


class TestClosureParity:
    def test_mb(self, pipe):
        d, cfg = pipe
        b, cld = d["b"], d["cld"]
        du_mb = cld.du * d["fac_mb"]

        mb = zm.closure(cfg, MSG, d["q"], d["t"], d["p"], d["z"], d["s"],
                        b.tp, cld.qst, cld.qu, cld.su, cld.mc, du_mb,
                        cld.mu, cld.md, cld.qd, cld.sd, d["qhat"], d["shat"],
                        d["dp"], b.qstp, d["zf"], cld.ql, d["dsubcld"],
                        b.cape, b.tl, b.lcl, b.lel, cld.jt, b.mx)

        mb_o, _, _ = orc.closure_oracle(
            _np(d["q"]), _np(d["t"]), _np(d["p"]), _np(d["z"]), _np(d["s"]),
            _np(b.tp), _np(cld.qst), _np(cld.qu), _np(cld.su), _np(cld.mc),
            _np(du_mb), _np(cld.mu), _np(cld.md), _np(cld.qd), _np(cld.sd),
            _np(d["qhat"]), _np(d["shat"]), _np(d["dp"]), _np(b.qstp),
            _np(d["zf"]), _np(cld.ql), _np(d["dsubcld"]), _np(b.cape),
            _np(b.tl), np.asarray(b.lcl), np.asarray(b.lel),
            np.asarray(cld.jt), np.asarray(b.mx), MSG, cfg.capelmt, cfg.tau)

        # the reference runs closure on gathered (triggered) columns only;
        # compare there (jt <= pver-2 holds for every triggered column)
        m = d["ideep"]
        assert m.any()
        np.testing.assert_allclose(_np(mb)[m], mb_o[m], rtol=RTOL, atol=ATOL)


class TestQ1Q2Parity:
    def test_tendencies(self, pipe):
        d, cfg = pipe
        b, cld = d["b"], d["cld"]
        # scaled profiles as zm_convr feeds q1q2 (zm_conv.py::zm_convr):
        # unit cloud-base mass flux keeps every term active
        du_mb = cld.du * d["fac_mb"]
        eu_mb = cld.eu * d["fac_mb"]
        cu_mb = cld.cu * d["fac_mb"]
        evp_mb = cld.evp * d["fac_mb"]

        dqdt, dsdt, dl, _ = zm.q1q2_pjr(
            MSG, d["q"], cld.qst, cld.qu, cld.su, du_mb, d["qhat"],
            d["shat"], d["dp"], cld.mu, cld.md, cld.sd, cld.qd, cld.qcde,
            d["dsubcld"], cld.jt, b.mx, (evp_mb, cu_mb))

        dqdt_o, dsdt_o, dl_o = orc.q1q2_oracle(
            _np(d["q"]), _np(cld.qst), _np(cld.qu), _np(cld.su), _np(du_mb),
            _np(d["qhat"]), _np(d["shat"]), _np(d["dp"]), _np(cld.mu),
            _np(cld.md), _np(cld.sd), _np(cld.qd), _np(cld.qcde),
            _np(d["dsubcld"]), np.asarray(cld.jt), np.asarray(b.mx), MSG,
            _np(evp_mb), _np(cu_mb))

        m = d["ideep"]
        np.testing.assert_allclose(_np(dqdt)[m], dqdt_o[m], rtol=RTOL,
                                   atol=1e-16)
        np.testing.assert_allclose(_np(dsdt)[m], dsdt_o[m], rtol=RTOL,
                                   atol=1e-16)
        np.testing.assert_allclose(_np(dl)[m], dl_o[m], rtol=RTOL,
                                   atol=1e-16)


class TestEvapParity:
    def test_zm_conv_evap(self, pipe):
        """zm_conv_evap vs the statement-order oracle on the real pipeline's
        precip production (zm_conv.F90:1712-1972, old_snow + tht path)."""
        from cam_nor_physics_tpu.models.physics.zm_conv import (cldfrc_fice,
                                                                qsat_blend,
                                                                zm_conv_evap)
        d, cfg = pipe
        b, cld = d["b"], d["cld"]
        ncol, pver = d["t"].shape
        t_si = d["t"]
        pmid_si = d["p"] * 100.0
        pdel_si = d["dp"] * 100.0
        q = d["q"]
        landfrac = jnp.ones((ncol,), d["t"].dtype)
        cldfrc = jnp.full((ncol, pver), 0.15, d["t"].dtype)
        # a physically-shaped production profile + column rate
        rprd = jnp.maximum(cld.rprd * d["fac_mb"] * 2.0e-2, 0.0)
        prec_in = jnp.sum(rprd * pdel_si, axis=1) / (9.80616 * 1000.0)

        got = zm_conv_evap(cfg, t_si, pmid_si, pdel_si, q, landfrac, rprd,
                           cldfrc, 900.0, prec_in)

        _, qs = qsat_blend(t_si, pmid_si)
        _, fsnow = cldfrc_fice(t_si)
        want = orc.zm_conv_evap_oracle(
            _np(t_si), _np(pmid_si), _np(pdel_si), _np(q), _np(qs),
            _np(fsnow), _np(rprd), _np(cldfrc), 900.0, _np(prec_in),
            cfg.ke, cfg.ke_lnd, _np(landfrac), cfg.org)

        for key in ("tend_s", "tend_q", "tend_s_snwprd", "tend_s_snwevmlt",
                    "ntprprd", "ntsnprd", "flxprec", "flxsnow", "prec",
                    "snow"):
            # atol floor: summation-order roundoff on ~1e-16 residuals
            np.testing.assert_allclose(_np(got[key]), want[key], rtol=RTOL,
                                       atol=1e-15, err_msg=key)


class TestCldprpParity:
    def test_plume_properties(self, pipe):
        """cldprp vs the statement-order oracle (zm_conv.F90:3024-4026,
        microp-off + tht-thermo path) on the real buoyan_dilute launch
        levels."""
        d, cfg = pipe
        b, cld = d["b"], d["cld"]
        want = orc.cldprp_oracle(
            _np(d["q"]), _np(d["t"]), _np(d["p"]), _np(d["z"]), _np(d["s"]),
            _np(d["zf"]), _np(d["shat"]), _np(d["qhat"]), np.asarray(b.mx),
            np.asarray(b.lel), _np(jnp.ones_like(b.cape)), MSG,
            cfg.c0_lnd, cfg.c0_ocn, cfg.tiedke_add, cfg.tiedke_lnd,
            cfg.entrmn, cfg.alfadet)

        m = d["ideep"]
        assert m.any()
        # level indices must agree exactly on triggered columns
        for name in ("jt", "jlcl", "j0", "jd"):
            np.testing.assert_array_equal(
                np.asarray(getattr(cld, name))[m], want[name][m],
                err_msg=name)
        for name in ("mu", "eu", "du", "md", "ed", "mc", "qu", "su", "sd",
                     "qd", "qst", "hmn", "hsat", "ql", "qcde", "cu", "evp",
                     "cmeg", "rprd", "pflx"):
            got = _np(getattr(cld, name))[m]
            np.testing.assert_allclose(got, want[name][m], rtol=1e-10,
                                       atol=1e-12, err_msg=name)


class TestParcelDiluteParity:
    def test_parcel_profile(self, pipe):
        """_parcel_dilute (scan impl, Brent inversion) vs the
        statement-order oracle (parcel_dilute + ientropy/ienthalpy,
        zm_conv.F90:4824-5414, tht path). Both sides iterate their Brent
        loops to the same 1e-3 K tolerance but terminate on slightly
        different floating paths, so agreement is at the solver tolerance,
        not machine precision."""
        d, cfg0 = pipe
        b = d["b"]
        cfg = ZMConfig(parcel_impl="scan", inversion_solver="brent")
        ncol, pver = d["t"].shape
        klaunch = b.mx
        tl0 = jnp.take_along_axis(d["t"], klaunch[:, None], 1)[:, 0]
        ql0 = jnp.take_along_axis(d["q"], klaunch[:, None], 1)[:, 0]
        pl0 = jnp.take_along_axis(d["p"], klaunch[:, None], 1)[:, 0]
        dmpdz = jnp.full((ncol, pver), -cfg.tentrm, d["t"].dtype)

        tp, qstp, tpv, tl, pl, lcl = zm._parcel_dilute(
            cfg, MSG, klaunch, d["p"], d["z"], d["t"], d["q"],
            jnp.zeros((ncol,), d["t"].dtype), tl0, ql0, pl0, dmpdz)

        want = orc.parcel_dilute_oracle(
            np.asarray(klaunch), _np(d["p"]), _np(d["z"]), _np(d["t"]),
            _np(d["q"]), np.zeros(ncol), _np(dmpdz), MSG)

        # compare on the region buoyan_dilute consumes (lel-1 .. launch):
        # above the plume top the ±10 K Brent bracket around the
        # level-above guess fails — the reference ABORTS there (endrun,
        # zm_conv.F90:5401-5410); the repo's NaN-fallback keeps going
        # (SURVEY §7.1.4), so those levels have no reference value
        karr = np.arange(pver)
        in_asc = (karr[None, :] <= np.asarray(klaunch)[:, None]) & \
            (karr[None, :] >= np.asarray(b.lel)[:, None] - 1)
        np.testing.assert_allclose(_np(tp)[in_asc], want["tp"][in_asc],
                                   atol=3e-3, rtol=0)
        np.testing.assert_allclose(_np(tpv)[in_asc], want["tpv"][in_asc],
                                   atol=4e-3, rtol=0)
        np.testing.assert_allclose(_np(qstp)[in_asc], want["qstp"][in_asc],
                                   atol=2e-6, rtol=0)
        np.testing.assert_array_equal(np.asarray(lcl), want["lcl"])
        np.testing.assert_allclose(_np(tl), want["tl"], atol=3e-3, rtol=0)
        np.testing.assert_allclose(_np(pl), want["pl"], atol=0.5, rtol=0)


class TestTransportParity:
    def _fluxes(self, pipe):
        """mb-scaled plume fluxes from the real pipeline (as zm_conv_intr
        stores them in the pbuf and hands them to convtran/momtran)."""
        d, cfg = pipe
        b, cld = d["b"], d["cld"]
        fac = d["fac_mb"]
        mb = 0.003   # representative cloud-base flux (mb/s)
        return dict(mu=cld.mu * mb, md=cld.md * mb, du=cld.du * fac * mb,
                    eu=cld.eu * fac * mb, ed=cld.ed * fac * mb,
                    dp=d["dp"], jt=cld.jt, mx=d["b"].mx)

    def test_convtran(self, pipe):
        from cam_nor_physics_tpu.models.physics.zm_transport import convtran
        d, cfg = pipe
        f = self._fluxes(pipe)
        ncol, pver = d["t"].shape
        rng = np.random.default_rng(11)
        pcnst = 4
        q = jnp.asarray(np.abs(
            1e-4 * rng.standard_normal((ncol, pver, pcnst))) + 1e-6)
        doconv = (False, True, True, True)
        dry_mask = (False, False, True, False)
        dpdry = d["dp"] * 0.98
        fracis = jnp.asarray(
            np.clip(rng.uniform(0.3, 1.0, (ncol, pver, pcnst)), 0, 1))

        got = convtran(doconv, q, f["mu"], f["md"], f["du"], f["eu"],
                       f["ed"], f["dp"], f["jt"], f["mx"], 1800.0,
                       fracis=fracis, dpdry=dpdry, dry_mask=dry_mask)
        want = orc.convtran_oracle(
            doconv, _np(q), _np(f["mu"]), _np(f["md"]), _np(f["du"]),
            _np(f["eu"]), _np(f["ed"]), _np(f["dp"]), _np(d["dsubcld"]),
            np.asarray(f["jt"]), np.asarray(f["mx"]), _np(fracis),
            _np(dpdry), dry_mask, 1800.0)
        np.testing.assert_allclose(_np(got), want, rtol=1e-11, atol=1e-20)

    def test_momtran(self, pipe):
        from cam_nor_physics_tpu.models.physics.zm_transport import momtran
        d, cfg = pipe
        f = self._fluxes(pipe)
        ncol, pver = d["t"].shape
        rng = np.random.default_rng(12)
        u = jnp.asarray(10.0 * rng.standard_normal((ncol, pver)))
        v = jnp.asarray(8.0 * rng.standard_normal((ncol, pver)))

        got = momtran(u, v, f["mu"], f["md"], f["du"], f["eu"], f["ed"],
                      f["dp"], f["jt"], f["mx"], 1800.0, cfg.momcu,
                      cfg.momcd)
        want = orc.momtran_oracle(
            _np(u), _np(v), _np(f["mu"]), _np(f["md"]), _np(f["du"]),
            _np(f["eu"]), _np(f["ed"]), _np(f["dp"]), np.asarray(f["jt"]),
            np.asarray(f["mx"]), 1800.0, cfg.momcu, cfg.momcd)
        for key in ("dudt", "dvdt", "seten"):
            np.testing.assert_allclose(_np(got[key]), want[key], rtol=1e-11,
                                       atol=1e-16, err_msg=key)
        for key in ("pguall", "pgdall", "icwu", "icwd"):
            for c_ in (0, 1):
                np.testing.assert_allclose(
                    _np(got[key][c_]), want[key][c_], rtol=1e-11,
                    atol=1e-16, err_msg=f"{key}[{c_}]")


class TestEuOnlySlimPath:
    @pytest.mark.parametrize("lf", [0.0, 0.4, 1.0])
    def test_eu_only_matches_full(self, pipe, lf):
        """cldprp(eu_only=True) — the slim first call under second_call —
        must be BITWISE the full call's eu (the only first-call output the
        reference's entrainment diagnosis consumes, zm_conv.F90:1046-1078)."""
        d, cfg = pipe
        landfrac = jnp.full((d["t"].shape[0],), lf, d["t"].dtype)
        args = (cfg, MSG, d["q"], d["t"], d["p"], d["z"], d["s"], d["zf"],
                d["shat"], d["qhat"], d["b"].mx, d["b"].lel, landfrac)
        eu_slim = zm.cldprp(*args, eu_only=True)
        eu_full = zm.cldprp(*args).eu
        np.testing.assert_array_equal(np.asarray(eu_slim),
                                      np.asarray(eu_full))
