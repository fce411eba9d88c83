"""Jablonowski-Williamson (2006, QJRMS 132:2943) baroclinic-wave test.

The standard deterministic dycore validation case, filling the reference's
analytic-IC hook (`inic_analytic`/`analytic_ic_set_ic`, used from read_inidat
at /root/reference/fv/dyn_comp.F90:2968-2976): a balanced zonally symmetric
baroclinic jet (an exact steady state of the hydrostatic primitive equations)
plus an optional localized u-perturbation that triggers explosive baroclinic
wave growth around day 8. Two properties make it a sharp test:

  1. unperturbed, a good dycore holds the jet steady (surface-pressure drift
     measures the discretization + balance error);
  2. perturbed, the eddy growth and surface-low deepening match published
     reference solutions across models.

Evaluated directly on the FV D-grid staggering (u at south cell edges, v at
west cell edges — the conventions of cd_core.py / grid.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils import constants as c
from .cd_core import DynState, pressure_vars
from .grid import FVGrid
from .vertical import HybridCoord

ETA0 = 0.252          # jet-core eta level
ETA_T = 0.2           # tropopause eta
U0 = 35.0             # max jet speed (m/s)
T0 = 288.0            # surface mean temperature (K)
GAMMA = 0.005         # mean lapse rate (K/m)
DELTA_T = 4.8e5       # stratosphere temperature-profile amplitude (K)
P0 = 1.0e5
UP = 1.0              # perturbation amplitude (m/s)
PERT_LON = np.pi / 9.0
PERT_LAT = 2.0 * np.pi / 9.0


def _t_mean(eta):
    tm = T0 * eta ** (c.RAIR * GAMMA / c.GRAVIT)
    return tm + jnp.where(eta < ETA_T, DELTA_T * jnp.maximum(ETA_T - eta,
                                                             0.0) ** 5, 0.0)


def _horiz_factors(lat):
    """A1/A2 of JW06 eq. (6)/(7) (the sin/cos polynomial factors)."""
    a1 = (-2.0 * jnp.sin(lat) ** 6 * (jnp.cos(lat) ** 2 + 1.0 / 3.0)
          + 10.0 / 63.0)
    a2 = (8.0 / 5.0 * jnp.cos(lat) ** 3 * (jnp.sin(lat) ** 2 + 2.0 / 3.0)
          - np.pi / 4.0)
    return a1, a2


def _u_balanced(eta, lat):
    eta_v = (eta - ETA0) * np.pi / 2.0
    return U0 * jnp.cos(eta_v) ** 1.5 * jnp.sin(2.0 * lat) ** 2


def _temperature(eta, lat):
    eta_v = (eta - ETA0) * np.pi / 2.0
    a1, a2 = _horiz_factors(lat)
    fac = 0.75 * (eta * np.pi * U0 / c.RAIR) * jnp.sin(eta_v) * \
        jnp.sqrt(jnp.cos(eta_v))
    return _t_mean(eta) + fac * (2.0 * U0 * jnp.cos(eta_v) ** 1.5 * a1
                                 + c.REARTH * c.OMEGA * a2)


def _phis(lat):
    eta_vs = (1.0 - ETA0) * np.pi / 2.0
    cvs = np.cos(eta_vs) ** 1.5
    a1, a2 = _horiz_factors(lat)
    return U0 * cvs * (U0 * cvs * a1 + c.REARTH * c.OMEGA * a2)


def _u_perturbation(lon, lat):
    """Localized Gaussian u-bump (JW06 eq. 11), radius a/10."""
    r_great = jnp.arccos(jnp.clip(
        np.sin(PERT_LAT) * jnp.sin(lat)
        + np.cos(PERT_LAT) * jnp.cos(lat) * jnp.cos(lon - PERT_LON),
        -1.0, 1.0))
    return UP * jnp.exp(-(10.0 * r_great) ** 2)


def jw_baroclinic_wave(grid: FVGrid, coord: HybridCoord, perturb: bool = True,
                       nq: int = 1, moist: bool = False, dtype=jnp.float64
                       ) -> tuple[DynState, jnp.ndarray]:
    """Build (DynState, phis) for the JW06 case on the D-grid.

    ps = p0 everywhere (the case's topography absorbs the balance), so
    eta(k) = (ak + bk p0)/p0 is horizontally uniform and the analytic
    formulas evaluate directly at midlevels. `moist=True` adds the JW06
    moist-variant specific humidity (q = q0 exp[-(φ/φw)^4] exp[-((p/ps-1)
    p0/pw)^2]-shaped; Lauritzen et al. 2010 eq. 16) in tracer slot 0.
    """
    jm, im, km = grid.jm, grid.im, grid.km
    dp = np.pi / (jm - 1)
    dl = 2.0 * np.pi / im

    lat_c = jnp.asarray(grid.lats)                        # centers (jm,)
    lat_u = jnp.asarray(grid.lats) - 0.5 * dp             # south edges
    lat_u = lat_u.at[0].set(-0.5 * np.pi)                 # unused row
    lon_c = jnp.asarray(grid.lons)
    lon_v = lon_c - 0.5 * dl                              # west edges

    eta_mid = jnp.asarray((coord.ak + coord.bk * P0) / P0, dtype)
    eta_mid = 0.5 * (eta_mid[1:] + eta_mid[:-1])          # (km,)
    eta3 = eta_mid[:, None, None]

    # --- winds on the staggered points ---
    u = jnp.broadcast_to(_u_balanced(eta3, lat_u[None, :, None]),
                         (km, jm, im)).astype(dtype)
    if perturb:
        u = u + _u_perturbation(lon_c[None, None, :],
                                lat_u[None, :, None]).astype(dtype)
    u = u.at[:, 0, :].set(0.0)                            # polar edge row
    v = jnp.zeros((km, jm, im), dtype)

    # --- mass/thermo fields at centers ---
    ps = jnp.full((jm, im), P0, dtype)
    pe = jnp.moveaxis(coord.pint(ps), -1, 0)
    delp = (pe[1:] - pe[:-1]).astype(dtype)
    _, _, pkz, _ = pressure_vars(delp, coord.ptop)
    t = jnp.broadcast_to(_temperature(eta3, lat_c[None, :, None]),
                         (km, jm, im)).astype(dtype)

    q = jnp.zeros((nq, km, jm, im), dtype)
    tv = t
    if moist:
        # Lauritzen et al. (2010) moist JW06 humidity field
        q0, phi_w, p_w = 0.021, 2.0 * np.pi / 9.0, 3.4e4
        pmid = 0.5 * (pe[1:] + pe[:-1])
        qv = q0 * jnp.exp(-(lat_c[None, :, None] / phi_w) ** 4) * \
            jnp.exp(-(((pmid / P0) - 1.0) * P0 / p_w) ** 2)
        q = q.at[0].set(qv.astype(dtype))
        tv = t * (1.0 + c.ZVIR * qv)

    phis = jnp.broadcast_to(_phis(lat_c)[:, None], (jm, im)).astype(dtype)
    state = DynState(u=u, v=v, pt=(tv / pkz).astype(dtype), delp=delp, q=q)
    return state, phis
