"""Initial-condition ingestion — read_inidat / process_inidat equivalents.

The reference reads CAM IC NetCDF files via PIO (read_inidat,
/root/reference/fv/dyn_comp.F90:2889-3081: required fields PS, US, VS, T +
constituents at :3004-3027), sets topography (set_phis, :3085-3168), applies
pole averaging to all scalars (process_inidat, :3172-3402 via par_xsum), and
optionally seeds a deterministic temperature perturbation (pertlim,
:3230-3255).

Here: NetCDF-3 via scipy (CAM IC files at matching resolution), the same pole
treatment (cap rows replaced by their zonal mean), and the pertlim hook.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils import constants as c
from .cd_core import DynState, pressure_vars
from .grid import FVGrid
from .vertical import HybridCoord


def pole_average(a: np.ndarray) -> np.ndarray:
    """Replace pole-row values by their zonal mean (process_inidat's
    par_xsum pole consistency, dyn_comp.F90:3257-3273): the cap is one
    control volume and must carry a single scalar value."""
    a = np.array(a)
    a[..., 0, :] = a[..., 0, :].mean(axis=-1, keepdims=True)
    a[..., -1, :] = a[..., -1, :].mean(axis=-1, keepdims=True)
    return a


def apply_pertlim(t: np.ndarray, pertlim: float, seed: int = 0) -> np.ndarray:
    """Deterministic seeded temperature perturbation (dyn_comp.F90:3230-3255):
    uniform in (-pertlim, +pertlim), reproducible for a given seed."""
    if pertlim == 0.0:
        return t
    rng = np.random.default_rng(seed)
    return t * (1.0 + pertlim * (2.0 * rng.random(t.shape) - 1.0))


def read_inidat(path: str, grid: FVGrid, coord: HybridCoord,
                constituent_names=("Q",), pertlim: float = 0.0,
                dtype=jnp.float64) -> tuple[DynState, jnp.ndarray]:
    """Read a CAM IC file (read_inidat, dyn_comp.F90:2889-3081).

    Expects variables PS (lat, lon), T/Q.. (lev, lat, lon) or
    (time, lev, lat, lon), US (slat, lon), VS (lev, lat, slon); PHIS optional.
    Returns (DynState, phis). Fields must match the grid resolution.
    """
    from scipy.io import netcdf_file
    km, jm, im = grid.km, grid.jm, grid.im

    with netcdf_file(path, "r", mmap=False) as nc:
        def get(name, ndim):
            """Read a variable, squeezing a leading time dimension."""
            v = np.array(nc.variables[name][:], np.float64)
            while v.ndim > ndim and v.shape[0] == 1:
                v = v[0]
            return v

        ps = get("PS", 2)
        t = get("T", 3)
        if t.shape != (km, jm, im):
            raise ValueError(f"T shape {t.shape} != grid {(km, jm, im)}")
        qs = []
        for name in constituent_names:
            if name in nc.variables:
                qs.append(get(name, 3))
            else:
                qs.append(np.zeros((km, jm, im)))
        # staggered winds: US on (km, jm-1, im) slat rows -> edge rows 1..jm-1
        us = get("US", 3) if "US" in nc.variables else \
            np.zeros((km, jm - 1, im))
        vs = get("VS", 3) if "VS" in nc.variables else np.zeros((km, jm, im))
        phis = get("PHIS", 2) if "PHIS" in nc.variables else \
            np.zeros((jm, im))

    ps = pole_average(ps)
    t = pole_average(apply_pertlim(t, pertlim))
    qs = [pole_average(q) for q in qs]
    phis = pole_average(phis)

    u = np.zeros((km, jm, im))
    u[:, 1:, :] = us                      # south-edge rows 1..jm-1
    v = np.asarray(vs)
    v[:, 0, :] = 0.0
    v[:, -1, :] = 0.0

    # hydrostatic state from the hybrid coordinate and PS
    pe = np.moveaxis(np.asarray(coord.pint(jnp.asarray(ps))), -1, 0)
    delp = pe[1:] - pe[:-1]
    _, pk, pkz, _ = pressure_vars(jnp.asarray(delp), coord.ptop)
    qv = qs[0]
    pt = jnp.asarray(t) * (1.0 + c.ZVIR * jnp.asarray(qv)) / pkz

    state = DynState(
        u=jnp.asarray(u, dtype), v=jnp.asarray(v, dtype),
        pt=jnp.asarray(pt, dtype), delp=jnp.asarray(delp, dtype),
        q=jnp.asarray(np.stack(qs), dtype))
    return state, jnp.asarray(phis, dtype)


def write_inidat(path: str, state: DynState, phis, grid: FVGrid,
                 coord: HybridCoord, constituent_names=("Q",)) -> None:
    """Write the dycore state as a CAM-convention IC file (round-trip /
    restart-interchange support)."""
    from scipy.io import netcdf_file
    km, jm, im = grid.km, grid.jm, grid.im
    pe, pk, pkz, _ = pressure_vars(state.delp, coord.ptop)
    qv = state.q[0]
    t = np.asarray(state.pt * pkz / (1.0 + c.ZVIR * qv), np.float64)
    with netcdf_file(path, "w") as nc:
        nc.createDimension("lat", jm)
        nc.createDimension("lon", im)
        nc.createDimension("slat", jm - 1)
        nc.createDimension("lev", km)
        v = nc.createVariable("PS", "d", ("lat", "lon"))
        v[:] = np.asarray(pe[-1], np.float64)
        v = nc.createVariable("PHIS", "d", ("lat", "lon"))
        v[:] = np.asarray(phis, np.float64)
        v = nc.createVariable("T", "d", ("lev", "lat", "lon"))
        v[:] = t
        v = nc.createVariable("US", "d", ("lev", "slat", "lon"))
        v[:] = np.asarray(state.u[:, 1:, :], np.float64)
        v = nc.createVariable("VS", "d", ("lev", "lat", "lon"))
        v[:] = np.asarray(state.v, np.float64)
        for m, name in enumerate(constituent_names):
            v = nc.createVariable(name, "d", ("lev", "lat", "lon"))
            v[:] = np.asarray(state.q[m], np.float64)
