"""Reference-parity oracle tests for the tp_core transport operators.

Pins the TPU-native whole-slab ops (cam_nor_physics_tpu/ops/tp_core.py)
against line-faithful scalar-loop NumPy transliterations of the reference
Fortran (tests/oracles/tp_core_oracle.py, from /root/reference/fv/
tp_core.F90) in float64 — the in-environment route to the "allclose vs
Fortran" north star (no Fortran compiler exists here, so the scalar loops
ARE the executable reference).

Grids are chosen so every branch fires: polar rows below the upwind/van
Leer cosine thresholds, FFSL rows with |c| in (1, 2.5] exercising the
integer-Courant sums and the donor-gather machinery, and interior PPM rows
for each limiter order iord/jord in {1,...,7} ∪ {-2}.
"""

import numpy as np
import pytest

import cam_nor_physics_tpu.ops.tp_core as tp

from oracles import tp_core_oracle as orc

ATOL = 1e-13
RTOL = 1e-12


def _grid(jm, im, seed=0, ffsl_rows=4, cmax_ffsl=2.5, cmax=0.9):
    """Random-but-smooth slab inputs with an FV-like latitude structure."""
    rng = np.random.default_rng(seed)
    dp = np.pi / (jm - 1)
    lat = -0.5 * np.pi + dp * np.arange(jm)
    cosp = np.maximum(np.cos(lat), 1e-10)  # pole rows ~0 -> upwind branch
    x = 2.0 * np.pi * np.arange(im) / im
    q = (2.0 + np.sin(x)[None, :] * np.cos(lat)[:, None]
         + 0.3 * rng.standard_normal((jm, im)))
    ffsl = np.zeros(jm, bool)
    ffsl[:ffsl_rows] = True
    ffsl[-ffsl_rows:] = True
    c = rng.uniform(-cmax, cmax, (jm, im))
    c[ffsl] = rng.uniform(-cmax_ffsl, cmax_ffsl, (ffsl_rows * 2, im))
    mfx = c * (1.0 + 0.2 * rng.standard_normal((jm, im)))
    return q, c, mfx, cosp, ffsl


def _slab_oracle(q, c, mfx, cosp, ffsl, iord, id_):
    return orc._xtp_slab(q, c, mfx, cosp, ffsl, iord, id_)


@pytest.mark.parametrize("iord", [1, 2, 3, 4, 5, 6, 7, -2])
@pytest.mark.parametrize("id_", [0, 1])
def test_xtp_parity(iord, id_):
    jm, im = 19, 24
    q, c, mfx, cosp, ffsl = _grid(jm, im, seed=abs(iord) * 10 + id_)
    got = np.asarray(tp.xtp(q, c, mfx, cosp, ffsl, iord, id_))
    want = _slab_oracle(q, c, mfx, cosp, ffsl, iord, id_)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_xtp_large_integer_courant():
    """|c| up to 5.5 exercises deep integer-Courant summation chains."""
    jm, im = 13, 30
    q, c, mfx, cosp, ffsl = _grid(jm, im, seed=3, ffsl_rows=5,
                                  cmax_ffsl=5.5)
    for iord in (1, 4):
        got = np.asarray(tp.xtp(q, c, mfx, cosp, ffsl, iord, 1))
        want = _slab_oracle(q, c, mfx, cosp, ffsl, iord, 1)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("id_", [-2, 2, 3])
def test_xmist_parity(id_):
    im = 24
    rng = np.random.default_rng(7)
    q = rng.standard_normal(im)
    got = np.asarray(tp.xmist(q[None, :], id_))[0]
    g = orc._Ghost(-(im // 3), im + im // 3)
    for i in range(1, im + 1):
        g[i] = q[i - 1]
    for off in (-2, -1, 0, im + 1, im + 2):
        g[off] = q[(off - 1) % im]
    dmo = orc.xmist_oracle(g, im, id_)
    want = np.array([dmo[i] for i in range(1, im + 1)])
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("lmt", [0, 1, 2, 3])
def test_lmppm_parity(lmt):
    im = 32
    rng = np.random.default_rng(lmt)
    p = rng.standard_normal(im)
    dm = 0.5 * rng.standard_normal(im)
    al = p + 0.4 * rng.standard_normal(im)
    ar = p + 0.4 * rng.standard_normal(im)
    a6 = 3.0 * (p + p - (al + ar))
    ga6, gar, gal = (np.asarray(a)[0] for a in tp.lmppm(
        dm[None], a6[None].copy(), ar[None].copy(), al[None].copy(),
        p[None], lmt))
    oa6, oar, oal = a6.copy(), ar.copy(), al.copy()
    orc.lmppm_oracle(dm, oa6, oar, oal, p, im, lmt)
    np.testing.assert_allclose(ga6, oa6, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(gar, oar, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(gal, oal, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("iv", [0, 1])
@pytest.mark.parametrize("jord", [2, 3, 4, -2])
def test_ymist_parity(jord, iv):
    jm, im = 17, 24
    rng = np.random.default_rng(abs(jord) * 2 + iv)
    q = rng.standard_normal((jm, im))
    got = np.asarray(tp.ymist(q, jord, iv))
    want = orc.ymist_oracle(q, jord, iv)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("iv", [0, 1])
@pytest.mark.parametrize("jord", [3, 4, 5])
def test_fyppm_parity(jord, iv):
    jm, im = 17, 24
    rng = np.random.default_rng(abs(jord) * 2 + iv)
    q = rng.standard_normal((jm, im))
    c = rng.uniform(-0.9, 0.9, (jm, im))
    dm = orc.ymist_oracle(q, jord, iv)
    got = np.asarray(tp.fyppm(c, q, dm, jord, iv))
    want = orc.fyppm_oracle(c, q, dm, jord, iv)
    np.testing.assert_allclose(got[1:], want[1:], rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("iv", [0, 1])
@pytest.mark.parametrize("jord", [1, 2, 3, 4])
def test_ytp_parity(jord, iv):
    jm, im = 17, 24
    rng = np.random.default_rng(abs(jord) * 2 + iv + 5)
    q = rng.standard_normal((jm, im))
    c = rng.uniform(-0.9, 0.9, (jm, im))
    yfx = rng.standard_normal((jm, im))
    got = np.asarray(tp.ytp(q, c, yfx, jord, iv))
    want = orc.ytp_oracle(q, c, yfx, jord, iv)
    np.testing.assert_allclose(got[1:], want[1:], rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("iord,jord", [(1, 1), (2, 2), (4, 4), (5, 3),
                                       (6, 4), (7, 4)])
def test_tp2d_parity(iord, jord):
    jm, im = 19, 24
    q, crx, xfx, cosp, ffsl = _grid(jm, im, seed=iord * 7 + jord)
    rng = np.random.default_rng(99)
    va = rng.uniform(-0.9, 0.9, (jm, im))
    cry = rng.uniform(-0.9, 0.9, (jm, im))
    yfx = cry * (1.0 + 0.2 * rng.standard_normal((jm, im)))
    gfx, gfy = tp.tp2d(va, q, crx, cry, iord, jord, xfx, yfx, cosp,
                       ffsl, 1)
    wfx, wfy = orc.tp2d_oracle(va, q, crx, cry, iord, jord, xfx, yfx,
                               cosp, ffsl, 1)
    np.testing.assert_allclose(np.asarray(gfx)[1:-1], wfx[1:-1],
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(gfy)[1:], wfy[1:],
                               rtol=RTOL, atol=ATOL)


def test_tp2c_parity():
    jm, im = 19, 24
    q, crx, xfx, cosp, ffsl = _grid(jm, im, seed=11)
    rng = np.random.default_rng(123)
    va = rng.uniform(-0.9, 0.9, (jm, im))
    cry = rng.uniform(-0.9, 0.9, (jm, im))
    yfx = cry * (1.0 + 0.2 * rng.standard_normal((jm, im)))
    acosp = 1.0 / cosp
    rcap = 1.0 / (im * 0.04)
    gdh, gfx, gfy = tp.tp2c(va, q, crx, cry, 4, 4, xfx, yfx, cosp, acosp,
                            rcap, ffsl)
    wdh, wfx, wfy = orc.tp2c_oracle(va, q, crx, cry, 4, 4, xfx, yfx, cosp,
                                    acosp, rcap, ffsl)
    np.testing.assert_allclose(np.asarray(gdh), wdh, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("jord", [1, 2, -2, 3])
@pytest.mark.parametrize("iv", [0, 1])
def test_ycc_parity(jord, iv):
    """ycc (tp_core.F90:1544-1704): the C-grid N-S flux with its north-edge
    donor convention, van Leer limiter for every jord != 1, and the
    cross-pole dc mirrors (zeroed again for jord > 0)."""
    jm, im = 17, 24
    rng = np.random.default_rng(abs(jord) * 3 + iv + 31)
    q = rng.standard_normal((jm, im))
    vc = rng.uniform(-0.9, 0.9, (jm, im))
    ymass = vc * (1.0 + 0.2 * rng.standard_normal((jm, im)))
    got = np.asarray(tp.ycc(q, vc, ymass, jord, iv))
    want = orc.ycc_oracle(q, vc, ymass, jord, iv)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("iord,jord", [(1, 1), (2, 2), (4, 4), (4, -2),
                                       (7, 3)])
def test_tpcc_parity(iord, jord):
    """tpcc (tp_core.F90:1396-1536): the C-grid transport pair — SP q
    mirror, va-upwinded NP row, ycc fy, and the edge-latitude (cose) xtp
    rows."""
    jm, im = 19, 24
    rng = np.random.default_rng(iord * 13 + jord + 7)
    dp = np.pi / (jm - 1)
    late = -0.5 * np.pi + dp * (np.arange(jm) - 0.5)   # edge latitudes
    cose = np.maximum(np.cos(late), 1e-10)
    x = 2.0 * np.pi * np.arange(im) / im
    q = (2.0 + np.sin(x)[None, :] * np.cos(late)[:, None]
         + 0.3 * rng.standard_normal((jm, im)))
    ffsl = np.zeros(jm, bool)
    ffsl[:4] = True
    ffsl[-4:] = True
    crx = rng.uniform(-0.9, 0.9, (jm, im))
    crx[ffsl] = rng.uniform(-2.5, 2.5, (8, im))
    va = rng.uniform(-0.9, 0.9, (jm, im))
    cry = rng.uniform(-0.9, 0.9, (jm, im))
    ymass = cry * (1.0 + 0.2 * rng.standard_normal((jm, im)))
    gfx, gfy = tp.tpcc(va, q, crx, cry, ymass, iord, jord, cose, ffsl)
    wfx, wfy = orc.tpcc_oracle(va, q, crx, cry, ymass, iord, jord, cose,
                               ffsl)
    np.testing.assert_allclose(np.asarray(gfx)[1:], wfx[1:],
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(gfy), wfy, rtol=RTOL, atol=ATOL)


def test_tpcc_vs_tp2d_interior_first_order():
    """The c_sw half step's C-grid route (transport3d -> tp2d at
    iord=jord=1) vs the reference's dedicated tpcc at iord=jord=1: away
    from the pole rows the two formulations produce IDENTICAL fluxes once
    the edge conventions are aligned (tp2d's fy is south-edge, tpcc's is
    north-edge: fy_tp2d[j+1] == fy_tpcc[j]); the deliberate deviation is
    confined to the pole rows, where tp2d freezes the advective pre-update
    (adx=q) while tpcc applies cross-pole mirrors (tp_core.F90:1490-1515).
    This pins the repo's 'tp2c with id/iv flags serves tpcc' claim."""
    jm, im = 19, 24
    rng = np.random.default_rng(5)
    dp = np.pi / (jm - 1)
    late = -0.5 * np.pi + dp * (np.arange(jm) - 0.5)
    cose = np.maximum(np.cos(late), 1e-10)
    q = 2.0 + 0.3 * rng.standard_normal((jm, im))
    ffsl = np.zeros(jm, bool)
    crx = rng.uniform(-0.9, 0.9, (jm, im))
    va = rng.uniform(-0.9, 0.9, (jm, im))
    # one edge field, viewed in both conventions
    cry_n = rng.uniform(-0.9, 0.9, (jm, im))       # north-edge (tpcc)
    ymass_n = cry_n * 1.1
    cry_s = np.roll(cry_n, 1, axis=0)              # south-edge (tp2d)
    yfx_s = np.roll(ymass_n, 1, axis=0)
    cfx, cfy = tp.tpcc(va, q, crx, cry_n, ymass_n, 1, 1, cose, ffsl)
    dfx, dfy = tp.tp2d(va, q, crx, cry_s, 1, 1, crx, yfx_s, cose, ffsl, 0)
    np.testing.assert_allclose(np.asarray(dfy)[2:-1],
                               np.asarray(cfy)[1:-2], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(dfx)[2:-2],
                               np.asarray(cfx)[2:-2], rtol=RTOL, atol=ATOL)
