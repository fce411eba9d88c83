"""Held-Suarez (1994) idealized forcing and initial states.

The dry-dycore climate test of SURVEY §7.2 Stage 3 / BASELINE config 3: the
reference's ecosystem validates the dycore with exactly this benchmark (CIME
system tests); forcing constants are the published Held & Suarez (1994) values.
Operates on the dycore state (pt = virtual potential temperature Tv/pkz;
dry ⇒ Tv = T).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils import constants as c
from .cd_core import DynState, pressure_vars
from .grid import FVGrid
from .vertical import HybridCoord

KF = 1.0 / 86400.0        # surface Rayleigh damping (1/s)
KA = 1.0 / (40.0 * 86400.0)
KS = 1.0 / (4.0 * 86400.0)
DT_Y = 60.0               # equator-pole temperature difference (K)
DTH_Z = 10.0              # vertical theta gradient parameter (K)
SIG_B = 0.7
P0 = 1.0e5
T_MIN = 200.0
T_SRF = 315.0


def equilibrium_temperature(p, lat):
    """Teq(p, φ) (HS94 eq. under their eq. 2)."""
    s2 = jnp.sin(lat) ** 2
    c2 = jnp.cos(lat) ** 2
    teq = (T_SRF - DT_Y * s2 - DTH_Z * jnp.log(p / P0) * c2) * \
        (p / P0) ** c.CAPPA
    return jnp.maximum(T_MIN, teq)


def hs_forcing(state: DynState, grid: FVGrid, ptop: float, dt: float
               ) -> DynState:
    """Apply one forward step of HS94 relaxation + Rayleigh friction."""
    pe, pk, pkz, peln = pressure_vars(state.delp, ptop)
    pmid = 0.5 * (pe[1:] + pe[:-1])
    ps = pe[-1]
    sigma = pmid / ps[None]
    lat_c = jnp.asarray(grid.lats)[:, None]

    tv = state.pt * pkz
    kt_vert = jnp.maximum(0.0, (sigma - SIG_B) / (1.0 - SIG_B))
    kt = KA + (KS - KA) * kt_vert * jnp.cos(lat_c) ** 4
    teq = equilibrium_temperature(pmid, lat_c)
    tv_new = tv + dt * (-kt * (tv - teq))
    pt_new = tv_new / pkz

    kv = KF * kt_vert
    # damp on the staggered points with sigma averaged appropriately
    from ...ops.tp_core import _rolly, wset_row
    kv_u = wset_row(0.5 * (kv + _rolly(kv, 1)), 0, kv)
    kv_v = 0.5 * (kv + jnp.roll(kv, 1, axis=-1))
    u_new = state.u * jnp.exp(-dt * kv_u)
    v_new = state.v * jnp.exp(-dt * kv_v)
    return state.replace(u=u_new, v=v_new, pt=pt_new)


def isothermal_rest_state(grid: FVGrid, coord: HybridCoord, t0: float = 260.0,
                          nq: int = 1, dtype=jnp.float64) -> DynState:
    """Atmosphere at rest over flat topography: the no-spurious-motion test
    state (any acceleration is discretization error)."""
    jm, im, km = grid.jm, grid.im, grid.km
    ps = jnp.full((jm, im), 1.0e5, dtype)
    pe = jnp.moveaxis(coord.pint(ps), -1, 0)
    delp = pe[1:] - pe[:-1]
    _, pk, pkz, _ = pressure_vars(delp, coord.ptop)
    pt = jnp.full((km, jm, im), t0, dtype) / pkz
    z = jnp.zeros((km, jm, im), dtype)
    q = jnp.zeros((nq, km, jm, im), dtype)
    return DynState(u=z, v=z, pt=pt, delp=delp, q=q)


def hs_initial_state(grid: FVGrid, coord: HybridCoord, nq: int = 1,
                     pert: float = 1.0, seed: int = 0, dtype=jnp.float64
                     ) -> DynState:
    """Held-Suarez spin-up state: Teq profile + small temperature noise to
    break zonal symmetry (the reference's pertlim role, dyn_comp.F90:3230)."""
    st = isothermal_rest_state(grid, coord, nq=nq, dtype=dtype)
    pe, pk, pkz, _ = pressure_vars(st.delp, coord.ptop)
    pmid = 0.5 * (pe[1:] + pe[:-1])
    lat_c = jnp.asarray(grid.lats)[:, None]
    teq = equilibrium_temperature(pmid, lat_c)
    rng = np.random.default_rng(seed)
    noise = jnp.asarray(pert * rng.standard_normal(teq.shape))
    tv = teq + noise
    # uniform value on each pole cap (caps are single control volumes)
    tv = tv.at[:, 0, :].set(tv[:, 0, :].mean(axis=-1, keepdims=True))
    tv = tv.at[:, -1, :].set(tv[:, -1, :].mean(axis=-1, keepdims=True))
    return st.replace(pt=tv / pkz)
