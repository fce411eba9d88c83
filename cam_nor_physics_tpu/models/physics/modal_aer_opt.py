"""Modal aerosol optics — modal_aer_opt equivalent.

Re-implementation of /root/reference/physics/modal_aer_opt.F90 (1576 lines):
the Ghan & Zaveri (2007) parameterization of per-mode aerosol shortwave and
longwave optical properties. Algorithm (modal_aero_sw :485-1212, modal_aero_lw
:1216-1469):

  per mode, per band, per level:
    1. wet surface-mode radius from pbuf (DGNUMWET) -> Chebyshev basis in
       log(radius) over [rmmin, rmmax] (modal_size_parameters, :1538-1574)
    2. bulk complex refractive index = volume mixing of species indices
       incl. aerosol water (:733+)
    3. bilinear table interpolation in (Re m, Im m) on the prefr=7 x
       prefi=10 grid of Chebyshev coefficient tables (ncoef=5, :54)
    4. specific extinction / absorption / asymmetry = Chebyshev sum;
       tau = b_ext * (dry mass column burden), tau*w, tau*w*g, tau*w*f

TPU-first formulation: all five loops (mode, band, level, refr-cell,
cheb-order) are one fused einsum/elementwise program over
(ncol, pver, nband); the bilinear interpolation is a 4-corner weighted sum
with comparison-count cell search (no hardware gathers). Tables come from a
`ModalOpticsTable` the caller loads (NetCDF loader below for the reference's
`modal_optics_file`) or generates procedurally for testing.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

NCOEF = 5      # Chebyshev polynomial terms       (modal_aer_opt.F90:54)
PREFR = 7      # real refractive-index grid size   (:54)
PREFI = 10     # imaginary refractive-index grid   (:54)


@dataclass(frozen=True)
class ModalOpticsTable:
    """Per-mode optics tables (the modal_optics_file payload, :112-481)."""

    # Chebyshev coefficient tables (nband, prefr, prefi, ncoef)
    extpsw: np.ndarray     # specific extinction (m2/kg)
    abspsw: np.ndarray     # specific absorption
    asmpsw: np.ndarray     # asymmetry parameter
    absplw: np.ndarray     # LW specific absorption (nlwband, prefr, prefi, ncoef)
    refrtabsw: np.ndarray  # (prefr,) real refractive index grid
    refitabsw: np.ndarray  # (prefi,) imaginary grid (positive convention)
    refrtablw: np.ndarray
    refitablw: np.ndarray
    rmmin: float           # min surface mode radius (m)
    rmmax: float           # max surface mode radius (m)


@dataclass(frozen=True)
class AeroMode:
    """One aerosol mode: species metadata (rad_constituents role)."""

    name: str
    species_names: tuple          # constituent names of the species
    species_density: tuple        # kg/m3 per species
    species_refindex_sw: tuple    # complex refractive index per species (scalar
                                  # per band simplified to band-independent)
    species_refindex_lw: tuple
    sigma_logr: float = 1.8       # geometric standard deviation
    table: ModalOpticsTable = None


# water refractive index (read_water_refindex role, :1475): band-independent
# simplification of the Segelstein tables
CREFWSW = complex(1.33, 1.0e-8)
CREFWLW = complex(1.27, 0.15)


def make_synthetic_table(nband: int = 14, nlwband: int = 16,
                         seed: int = 0) -> ModalOpticsTable:
    """Physically-shaped synthetic tables for testing: smooth in radius
    (Chebyshev coefficients decaying by order), extinction decreasing with
    Im(m), asymmetry in (0, 1). Stands in for the modal_optics_file payload
    where the real NetCDF is unavailable."""
    rng = np.random.default_rng(seed)
    refr = np.linspace(1.3, 1.7, PREFR)
    refi = np.geomspace(1e-9, 0.5, PREFI)

    def cheb_decay(shape):
        base = rng.uniform(0.5, 1.5, shape[:-1] + (1,))
        orders = np.exp(-1.5 * np.arange(NCOEF))[None, None, None, :]
        return base * orders

    extpsw = 5.0e3 * cheb_decay((nband, PREFR, PREFI, NCOEF)) * \
        (1.0 + refr[None, :, None, None] - 1.3)
    abspsw = extpsw * (0.05 + 0.9 * (refi / refi[-1])[None, None, :, None])
    asmpsw = 0.6 * cheb_decay((nband, PREFR, PREFI, NCOEF)) / 1.0
    absplw = 1.0e3 * cheb_decay((nlwband, PREFR, PREFI, NCOEF)) * \
        (0.1 + (refi / refi[-1])[None, None, :, None])
    return ModalOpticsTable(
        extpsw=extpsw, abspsw=abspsw, asmpsw=asmpsw, absplw=absplw,
        refrtabsw=refr, refitabsw=refi, refrtablw=refr, refitablw=refi,
        rmmin=0.01e-6, rmmax=25.0e-6)


def load_modal_optics_netcdf(path: str, mode_index: int = 0
                             ) -> ModalOpticsTable:
    """Load one mode's tables from the reference's modal_optics_file
    (modal_aer_opt_init, :112-481; NetCDF-3 classic via scipy)."""
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        def get(name):
            return np.array(nc.variables[name][:])
        return ModalOpticsTable(
            extpsw=get("extpsw")[mode_index], abspsw=get("abspsw")[mode_index],
            asmpsw=get("asmpsw")[mode_index], absplw=get("absplw")[mode_index],
            refrtabsw=get("refrtabsw"), refitabsw=get("refitabsw"),
            refrtablw=get("refrtablw"), refitablw=get("refitablw"),
            rmmin=float(get("rmmin")) if "rmmin" in nc.variables else 0.01e-6,
            rmmax=float(get("rmmax")) if "rmmax" in nc.variables else 25e-6)


def modal_size_parameters(dgnumwet, rmmin: float, rmmax: float,
                          sigma_logr: float):
    """Chebyshev basis in normalized log surface-mode wet radius
    (modal_size_parameters, modal_aer_opt.F90:1538-1574).

    dgnumwet: (ncol, pver) wet number-mode diameter (m). The surface-mode
    radius is dgnumwet/2 * exp(2 ln^2 sigma). Returns (ncol, pver, NCOEF).
    """
    alnsg = jnp.log(sigma_logr)
    rs = 0.5 * dgnumwet * jnp.exp(2.0 * alnsg ** 2)
    rs = jnp.clip(rs, rmmin, rmmax)
    xr = (2.0 * jnp.log(rs / rmmin) / jnp.log(rmmax / rmmin)) - 1.0
    # Chebyshev recurrence T_0..T_{NCOEF-1}
    cheb = [jnp.ones_like(xr), xr]
    for _ in range(2, NCOEF):
        cheb.append(2.0 * xr * cheb[-1] - cheb[-2])
    return jnp.stack(cheb[:NCOEF], axis=-1)


def _bilinear_cell(grid, x):
    """Cell index + weight for 1-D table interpolation, gather-free:
    returns one-hot (…, n_grid) weights for the linear interpolation
    (table_interp_mod role)."""
    n = grid.shape[0]
    g = jnp.asarray(grid, x.dtype)
    cnt = jnp.sum(g[None, :] <= x[..., None], axis=-1)
    k = jnp.clip(cnt - 1, 0, n - 2)
    onehot_lo = (k[..., None] == jnp.arange(n)).astype(x.dtype)
    onehot_hi = (k[..., None] + 1 == jnp.arange(n)).astype(x.dtype)
    x_lo = jnp.einsum('...n,n->...', onehot_lo, g)
    x_hi = jnp.einsum('...n,n->...', onehot_hi, g)
    w = jnp.clip((x - x_lo) / jnp.where(x_hi == x_lo, 1.0, x_hi - x_lo),
                 0.0, 1.0)
    return onehot_lo * (1.0 - w[..., None]) + onehot_hi * w[..., None]


def _volume_mix_refindex(specmmr, specdens, crefin_spec, qaerwat, crefw):
    """Bulk complex refractive index by volume mixing (modal_aero_sw
    :733+): sum(vol_i * m_i)/sum(vol_i), water included."""
    vols = [m / d for m, d in zip(specmmr, specdens)]       # (ncol,pver) each
    volw = qaerwat / 1000.0
    wetvol = sum(vols) + volw
    cre = sum(v * m.real for v, m in zip(vols, crefin_spec)) + volw * crefw.real
    cim = sum(v * abs(m.imag) for v, m in zip(vols, crefin_spec)) + \
        volw * abs(crefw.imag)
    safe = jnp.where(wetvol > 0, wetvol, 1.0e-30)
    return cre / safe, cim / safe, wetvol, sum(vols)


def modal_aero_sw(mode: AeroMode, specmmr, dgnumwet, qaerwat, mass):
    """Shortwave optics for one mode (modal_aero_sw, :485-1212).

    specmmr: list of (ncol, pver) species mass mixing ratios (kg/kg);
    dgnumwet, qaerwat: (ncol, pver) from pbuf DGNUMWET / QAERWAT;
    mass: (ncol, pver) layer air mass pdel/gravit (kg/m2).
    Returns dict(tau, tau_w, tau_w_g, tau_w_f) each (ncol, pver, nband)
    (the radiation_tend contract) plus AOD diagnostics.
    """
    tbl = mode.table
    nband = tbl.extpsw.shape[0]
    cheb = modal_size_parameters(dgnumwet, tbl.rmmin, tbl.rmmax,
                                 mode.sigma_logr)                  # (c,p,5)
    refr, refi, wetvol, dryvol = _volume_mix_refindex(
        specmmr, mode.species_density, mode.species_refindex_sw, qaerwat,
        CREFWSW)

    w_r = _bilinear_cell(tbl.refrtabsw, refr)       # (c,p,prefr)
    w_i = _bilinear_cell(tbl.refitabsw, refi)       # (c,p,prefi)

    # table contraction: coefficients at (refr, refi) for all bands, then
    # Chebyshev sum — one fused einsum chain on the MXU
    def interp(table):                               # (b,R,I,5) -> (c,p,b)
        coef = jnp.einsum('cpr,cpi,brin->cpbn', w_r, w_i,
                          jnp.asarray(table, refr.dtype))
        return jnp.einsum('cpbn,cpn->cpb', coef, cheb)

    drymass = sum(specmmr) * mass                    # dry aerosol burden
    b_ext = jnp.maximum(interp(tbl.extpsw), 0.0)
    b_abs = jnp.clip(interp(tbl.abspsw), 0.0, None)
    asym = jnp.clip(interp(tbl.asmpsw), -1.0, 1.0)

    tau = b_ext * drymass[..., None]
    ssa = jnp.where(b_ext > 0, 1.0 - b_abs / jnp.maximum(b_ext, 1e-30), 1.0)
    ssa = jnp.clip(ssa, 0.0, 1.0)
    tau_w = tau * ssa
    tau_w_g = tau_w * asym
    tau_w_f = tau_w * asym * asym

    # AOD family diagnostics (visible band index 10 in RRTMG ordering is the
    # reference's idx_sw_diag; clipped into range for smaller test tables)
    idx_vis = min(10, nband - 1)
    aodvis = jnp.sum(tau[:, :, idx_vis], axis=1)
    aodabs = jnp.sum(b_abs[:, :, idx_vis] * drymass, axis=1)
    return dict(tau=tau, tau_w=tau_w, tau_w_g=tau_w_g, tau_w_f=tau_w_f,
                AODVIS=aodvis, AODABS=aodabs, burden=jnp.sum(drymass, axis=1))


def modal_aero_lw(mode: AeroMode, specmmr, dgnumwet, qaerwat, mass):
    """Longwave absorption optics for one mode (modal_aero_lw, :1216-1469).
    Returns tau_abs (ncol, pver, nlwband)."""
    tbl = mode.table
    cheb = modal_size_parameters(dgnumwet, tbl.rmmin, tbl.rmmax,
                                 mode.sigma_logr)
    refr, refi, wetvol, dryvol = _volume_mix_refindex(
        specmmr, mode.species_density, mode.species_refindex_lw, qaerwat,
        CREFWLW)
    w_r = _bilinear_cell(tbl.refrtablw, refr)
    w_i = _bilinear_cell(tbl.refitablw, refi)
    coef = jnp.einsum('cpr,cpi,brin->cpbn', w_r, w_i,
                      jnp.asarray(tbl.absplw, refr.dtype))
    b_abs = jnp.maximum(jnp.einsum('cpbn,cpn->cpb', coef, cheb), 0.0)
    drymass = sum(specmmr) * mass
    return b_abs * drymass[..., None]
