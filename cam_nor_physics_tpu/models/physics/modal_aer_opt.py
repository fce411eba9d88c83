"""Modal aerosol optics — modal_aer_opt equivalent.

Re-implementation of /root/reference/physics/modal_aer_opt.F90 (1576 lines):
the Ghan & Zaveri (2007) parameterization of per-mode aerosol shortwave and
longwave optical properties. Algorithm (modal_aero_sw :485-1212, modal_aero_lw
:1216-1469):

  per mode, per band, per level:
    1. wet surface-mode radius from pbuf (DGNUMWET) -> Chebyshev basis in
       log(radius) over [log rmmin, log rmmax] (modal_size_parameters,
       :1538-1574)
    2. bulk complex refractive index = volume mixing of the per-band species
       indices plus aerosol water with the per-band water index crefwsw/crefwlw
       (:733-850; water indices from read_water_refindex, :1475-1536)
    3. bilinear table interpolation in (Re m, Im m) on the per-band
       prefr=7 x prefi=10 grids of Chebyshev coefficient tables (ncoef=5, :54)
    4. specific extinction = exp(Chebyshev sum) in m2/kg — geometric-optics
       1.5/(r rho_w) above the table radius range (:869-877); absorption and
       asymmetry are plain Chebyshev sums (:882-891); all converted from
       per-kg-water to per-kg-air by wetvol*rhoh2o (:880-890); layer optical
       depth tau = pext * (dry air layer mass) (:896)

TPU-first formulation: all five loops (mode, band, level, refr-cell,
cheb-order) are one fused einsum/elementwise program over
(ncol, pver, nband); the bilinear interpolation is a 4-corner weighted sum
with comparison-count cell search (no hardware gathers). Tables come from a
`ModalOpticsTable` the caller loads (NetCDF loader below for the reference's
`modal_optics_file`) or generates procedurally for testing. DGNUMWET/QAERWAT
are produced by `modal_aero_wateruptake.py` (calcsize + Koehler growth), the
equivalents of the upstream modules called at :697-704.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

NCOEF = 5      # Chebyshev polynomial terms       (modal_aer_opt.F90:54)
PREFR = 7      # real refractive-index grid size   (:54)
PREFI = 10     # imaginary refractive-index grid   (:54)
NSWBANDS = 14  # RRTMG shortwave bands (radconstants)
NLWBANDS = 16  # RRTMG longwave bands
IDX_SW_DIAG = 9   # 0-based visible diagnostic band (16000-22650 cm-1)
IDX_UV_DIAG = 10  # 0-based 0.35 um band
IDX_NIR_DIAG = 7  # 0-based 0.88 um band

RHOH2O = 1000.0   # kg/m3 (rhoh2o; watervol = qaerwat/rhoh2o, :834)


@dataclass(frozen=True)
class ModalOpticsTable:
    """Per-mode optics tables (the modal_optics_file payload, :112-481).

    Coefficient tables are (nband, prefr, prefi, ncoef); the refractive
    index grids are per band: (prefr, nband) / (prefi, nband) exactly as
    the reference's refrtabsw(:,isw) usage (:856-857). 1-D grids are
    accepted and broadcast across bands by the constructors below.
    """

    extpsw: np.ndarray     # log specific extinction Chebyshev coefs (m2/kg)
    abspsw: np.ndarray     # specific absorption coefs
    asmpsw: np.ndarray     # asymmetry parameter coefs
    absplw: np.ndarray     # LW specific absorption (nlwband, prefr, prefi, ncoef)
    refrtabsw: np.ndarray  # (prefr, nswband) real refractive-index grids
    refitabsw: np.ndarray  # (prefi, nswband) imaginary grids (positive)
    refrtablw: np.ndarray  # (prefr, nlwband)
    refitablw: np.ndarray  # (prefi, nlwband)
    rmmin: float           # min surface mode radius treated (m)  (:140)
    rmmax: float           # max surface mode radius treated (m)  (:141)


@dataclass(frozen=True)
class AeroMode:
    """One aerosol mode: species metadata (rad_constituents role,
    rad_cnst_get_mode_props / rad_cnst_get_aer_props call sites :717-765).

    species_refindex_sw/lw entries may be a scalar complex (broadcast over
    bands) or a per-band complex array of length NSWBANDS/NLWBANDS.
    """

    name: str
    species_names: tuple          # constituent names of the species
    species_density: tuple        # kg/m3 per species
    species_refindex_sw: tuple    # complex refractive index per species
    species_refindex_lw: tuple
    species_hygro: tuple = ()     # hygroscopicity per species (wateruptake)
    species_type: tuple = ()      # 'dust'/'sulfate'/... (AOD diagnostics)
    sigma_logr: float = 1.8       # geometric standard deviation
    num_name: str = None          # number-mixing-ratio constituent, if any
    dgnum: float = 0.11e-6        # default dry number-mode diameter (m)
    dgnumlo: float = 0.0535e-6
    dgnumhi: float = 0.44e-6
    rhcrystal: float = 0.35
    rhdeliques: float = 0.80
    table: ModalOpticsTable = None


def _per_band(values, nband):
    """Stack per-species refractive indices to (nspec, nband) complex,
    broadcasting scalars across bands."""
    rows = []
    for v in values:
        arr = np.asarray(v, dtype=complex)
        rows.append(np.broadcast_to(arr, (nband,)))
    return np.stack(rows)  # (nspec, nband)


# Water complex refractive index per RRTMG band (read_water_refindex role,
# :1475-1536). Default values are representative of the Segelstein (1981)
# compilation at the band centers; `read_water_refindex` below replaces them
# from the reference's water_refindex_file when available.
CREFWSW = np.array([complex(r, i) for r, i in [
    (1.396, 9.2e-3), (1.334, 2.0e-4), (1.311, 1.2e-4), (1.297, 1.1e-4),
    (1.286, 6.6e-5), (1.279, 2.2e-5), (1.307, 2.2e-6), (1.321, 1.0e-7),
    (1.328, 2.5e-8), (1.332, 1.5e-9), (1.336, 8.7e-10), (1.340, 3.3e-9),
    (1.346, 2.9e-9), (1.291, 5.5e-2)]])
CREFWLW = np.array([complex(r, i) for r, i in [
    (1.53, 0.39), (1.48, 0.42), (1.42, 0.40), (1.34, 0.37),
    (1.26, 0.34), (1.18, 0.30), (1.16, 0.21), (1.29, 0.10),
    (1.32, 0.050), (1.32, 0.034), (1.34, 0.019), (1.35, 0.013),
    (1.36, 0.011), (1.38, 0.010), (1.40, 0.012), (1.42, 0.014)]])


def make_synthetic_table(nband: int = NSWBANDS, nlwband: int = NLWBANDS,
                         seed: int = 0) -> ModalOpticsTable:
    """Physically-shaped synthetic tables for testing: smooth in radius
    (Chebyshev coefficients decaying by order), extinction stored in log
    space (the reference's convention: pext = exp(chebsum), :869-874),
    absorption increasing with Im(m), asymmetry in (0, 1). Stands in for
    the modal_optics_file payload where the real NetCDF is unavailable."""
    rng = np.random.default_rng(seed)
    refr = np.linspace(1.3, 1.7, PREFR)
    refi = np.geomspace(1e-9, 0.5, PREFI)

    def cheb_decay(shape, lo=0.5, hi=1.5):
        base = rng.uniform(lo, hi, shape[:-1] + (1,))
        orders = np.exp(-1.5 * np.arange(NCOEF))[None, None, None, :]
        return base * orders

    # log specific extinction ~ exp(0.5*c1) in [e^2, e^5] m2/kg-water
    extpsw = cheb_decay((nband, PREFR, PREFI, NCOEF), 4.0, 10.0) * \
        (1.0 + 0.3 * (refr[None, :, None, None] - 1.3))
    abspsw = 50.0 * cheb_decay((nband, PREFR, PREFI, NCOEF)) * \
        (0.05 + 0.9 * (refi / refi[-1])[None, None, :, None])
    asmpsw = 0.6 * cheb_decay((nband, PREFR, PREFI, NCOEF))
    absplw = 30.0 * cheb_decay((nlwband, PREFR, PREFI, NCOEF)) * \
        (0.1 + (refi / refi[-1])[None, None, :, None])
    tile = lambda g, nb: np.tile(g[:, None], (1, nb))
    return ModalOpticsTable(
        extpsw=extpsw, abspsw=abspsw, asmpsw=asmpsw, absplw=absplw,
        refrtabsw=tile(refr, nband), refitabsw=tile(refi, nband),
        refrtablw=tile(refr, nlwband), refitablw=tile(refi, nlwband),
        rmmin=0.01e-6, rmmax=25.0e-6)


def load_modal_optics_netcdf(path: str, mode_index: int = 0
                             ) -> ModalOpticsTable:
    """Load one mode's tables from the reference's modal_optics_file
    (modal_aer_opt_init, :112-481; NetCDF-3 classic via scipy). The file
    stores coefficients as (ncoef, prefr, prefi, nband) per the Fortran
    declarations (:548-551); transposed here to (nband, prefr, prefi, ncoef).
    """
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        def get(name):
            return np.array(nc.variables[name][:])

        def coefs(name):
            a = get(name)
            if a.ndim == 5:          # (mode, ...) stacked file
                a = a[mode_index]
            if a.shape[0] == NCOEF:  # (ncoef, prefr, prefi, nband)
                a = np.transpose(a, (3, 1, 2, 0))
            return a

        def grid(name, n):
            a = get(name)
            if a.ndim == 1:
                a = np.tile(a[:, None], (1, n))
            return a

        return ModalOpticsTable(
            extpsw=coefs("extpsw"), abspsw=coefs("abspsw"),
            asmpsw=coefs("asmpsw"), absplw=coefs("absplw"),
            refrtabsw=grid("refrtabsw", NSWBANDS),
            refitabsw=grid("refitabsw", NSWBANDS),
            refrtablw=grid("refrtablw", NLWBANDS),
            refitablw=grid("refitablw", NLWBANDS),
            rmmin=float(get("rmmin")) if "rmmin" in nc.variables else 0.01e-6,
            rmmax=float(get("rmmax")) if "rmmax" in nc.variables else 25e-6)


def read_water_refindex(path: str):
    """Per-band water complex refractive indices from the reference's
    water_refindex_file (read_water_refindex, :1475-1536). Returns
    (crefwsw[NSWBANDS], crefwlw[NLWBANDS]) complex arrays; imaginary parts
    forced positive as the reference does (:1527-1532)."""
    from scipy.io import netcdf_file
    with netcdf_file(path, "r") as nc:
        g = lambda n: np.array(nc.variables[n][:])
        crefwsw = g("refindex_real_water_sw") + \
            1j * np.abs(g("refindex_im_water_sw"))
        crefwlw = g("refindex_real_water_lw") + \
            1j * np.abs(g("refindex_im_water_lw"))
    return crefwsw, crefwlw


def modal_size_parameters(dgnumwet, rmmin: float, rmmax: float,
                          sigma_logr: float):
    """Surface-mode radius + Chebyshev basis in normalized log radius
    (modal_size_parameters, modal_aer_opt.F90:1538-1574).

    dgnumwet: (ncol, pver) wet number-mode diameter (m). The surface-mode
    radius is dgnumwet/2 * exp(2 ln^2 sigma). Returns
    (radsurf, logradsurf, cheb) with cheb (ncol, pver, NCOEF); logradsurf
    is unclipped (the geometric-optics branch tests it against log rmmax,
    :869).
    """
    alnsg = jnp.log(sigma_logr)
    radsurf = 0.5 * dgnumwet * jnp.exp(2.0 * alnsg ** 2)
    logradsurf = jnp.log(jnp.maximum(radsurf, 1.0e-30))
    xrmin, xrmax = np.log(rmmin), np.log(rmmax)
    xr = jnp.clip(logradsurf, xrmin, xrmax)
    xr = (2.0 * xr - xrmax - xrmin) / (xrmax - xrmin)
    # Chebyshev recurrence T_0..T_{NCOEF-1}
    cheb = [jnp.ones_like(xr), xr]
    for _ in range(2, NCOEF):
        cheb.append(2.0 * xr * cheb[-1] - cheb[-2])
    return radsurf, logradsurf, jnp.stack(cheb[:NCOEF], axis=-1)


def _bilinear_cell(grids, x):
    """Cell index + weight for per-band 1-D table interpolation, gather-free
    (table_interp_mod role): grids (n_grid, nband), x (ncol, pver, nband);
    returns one-hot (ncol, pver, nband, n_grid) interpolation weights."""
    g = jnp.asarray(grids, x.dtype).T                    # (b, n)
    n = g.shape[-1]
    cnt = jnp.sum(g <= x[..., None], axis=-1)
    k = jnp.clip(cnt - 1, 0, n - 2)
    onehot_lo = (k[..., None] == jnp.arange(n)).astype(x.dtype)
    onehot_hi = (k[..., None] + 1 == jnp.arange(n)).astype(x.dtype)
    x_lo = jnp.einsum('cpbn,bn->cpb', onehot_lo, g)
    x_hi = jnp.einsum('cpbn,bn->cpb', onehot_hi, g)
    w = jnp.clip((x - x_lo) / jnp.where(x_hi == x_lo, 1.0, x_hi - x_lo),
                 0.0, 1.0)
    return onehot_lo * (1.0 - w[..., None]) + onehot_hi * w[..., None]


def _volume_mix_refindex(specmmr, specdens, crefin_spec, qaerwat, crefw,
                         nband, dtype):
    """Bulk complex refractive index by per-band volume mixing
    (modal_aero_sw :733-850): sum(vol_l * m_l(band)) + watervol*m_w(band),
    normalized by wet volume; negative water volume repaired to zero
    (:837-843). Returns (refr, refi, wetvol, dryvol) with refr/refi
    (ncol, pver, nband)."""
    cref = jnp.asarray(_per_band(crefin_spec, nband))     # (nspec, b)
    vols = [m / d for m, d in zip(specmmr, specdens)]     # (ncol,pver) each
    dryvol = sum(vols)
    watervol = jnp.maximum(qaerwat / RHOH2O, 0.0)         # (:837-843)
    wetvol = watervol + dryvol
    crefw = jnp.asarray(crefw)                            # (b,)
    cre = sum(v[..., None] * jnp.real(cref[l])
              for l, v in enumerate(vols)) + \
        watervol[..., None] * jnp.real(crefw)
    cim = sum(v[..., None] * jnp.abs(jnp.imag(cref[l]))
              for l, v in enumerate(vols)) + \
        watervol[..., None] * jnp.abs(jnp.imag(crefw))
    safe = jnp.maximum(wetvol, 1.0e-60)[..., None]
    return (cre / safe).astype(dtype), (cim / safe).astype(dtype), \
        wetvol, dryvol


def modal_aero_sw(mode: AeroMode, specmmr, dgnumwet, qaerwat, mass):
    """Shortwave optics for one mode (modal_aero_sw, :485-1212).

    specmmr: list of (ncol, pver) species mass mixing ratios (kg/kg);
    dgnumwet, qaerwat: (ncol, pver) from pbuf DGNUMWET / QAERWAT;
    mass: (ncol, pver) dry layer air mass pdeldry/gravit (kg/m2).
    Returns dict(tau, tau_w, tau_w_g, tau_w_f) each (ncol, pver, nband)
    (the radiation_tend contract: tauxar/wa/ga/fa accumulation, :940-947)
    plus AOD/burden diagnostics.
    """
    tbl = mode.table
    nband = tbl.extpsw.shape[0]
    dtype = dgnumwet.dtype
    radsurf, logradsurf, cheb = modal_size_parameters(
        dgnumwet, tbl.rmmin, tbl.rmmax, mode.sigma_logr)   # (c,p,5)
    refr, refi, wetvol, dryvol = _volume_mix_refindex(
        specmmr, mode.species_density, mode.species_refindex_sw, qaerwat,
        CREFWSW[:nband], nband, dtype)

    w_r = _bilinear_cell(tbl.refrtabsw, refr)       # (c,p,b,prefr)
    w_i = _bilinear_cell(tbl.refitabsw, refi)       # (c,p,b,prefi)

    # table contraction: coefficients at (refr, refi) for all bands — one
    # fused einsum chain on the MXU
    def interp(table):                               # (b,R,I,5) -> (c,p,b,5)
        return jnp.einsum('cpbr,cpbi,brin->cpbn', w_r, w_i,
                          jnp.asarray(table, dtype))

    # Chebyshev sums: 0.5*c1 + sum_{n>=2} cheb_n c_n  (:870-890)
    def chebsum(coef):
        s = 0.5 * coef[..., 0]
        return s + jnp.einsum('cpbn,cpn->cpb', coef[..., 1:], cheb[..., 1:])

    # specific extinction per kg water: exp of the Chebyshev sum inside the
    # table radius range; geometric optics 1.5/(r rho_w) above it (:869-877)
    pext_tab = jnp.exp(chebsum(interp(tbl.extpsw)))
    pext_geo = 1.5 / (jnp.maximum(radsurf, 1.0e-30) * RHOH2O)
    xrmax = np.log(tbl.rmmax)
    pext = jnp.where((logradsurf <= xrmax)[..., None], pext_tab,
                     pext_geo[..., None])

    # per-kg-water -> per-kg-air (:880-890); tau = pext * layer mass (:896)
    wfac = (wetvol * RHOH2O)[..., None]
    pext = pext * wfac
    pabs = jnp.clip(chebsum(interp(tbl.abspsw)) * wfac, 0.0, None)
    pabs = jnp.minimum(pabs, pext)
    pasm = jnp.clip(chebsum(interp(tbl.asmpsw)), -1.0, 1.0)
    palb = 1.0 - pabs / jnp.maximum(pext, 1.0e-40)

    tau = pext * mass[..., None]
    tau_w = tau * palb
    tau_w_g = tau_w * pasm
    tau_w_f = tau_w_g * pasm

    # AOD family diagnostics (the savaervis block, :780-828, 900-935)
    drymass = sum(specmmr) * mass
    aodvis = jnp.sum(tau[:, :, IDX_SW_DIAG % nband], axis=1)
    aodabs = jnp.sum((pabs * mass[..., None])[:, :, IDX_SW_DIAG % nband],
                     axis=1)
    aodnir = jnp.sum(tau[:, :, IDX_NIR_DIAG % nband], axis=1)
    aoduv = jnp.sum(tau[:, :, IDX_UV_DIAG % nband], axis=1)
    return dict(tau=tau, tau_w=tau_w, tau_w_g=tau_w_g, tau_w_f=tau_w_f,
                AODVIS=aodvis, AODABS=aodabs, AODNIR=aodnir, AODUV=aoduv,
                burden=jnp.sum(drymass, axis=1))


def modal_aero_lw(mode: AeroMode, specmmr, dgnumwet, qaerwat, mass):
    """Longwave absorption optics for one mode (modal_aero_lw, :1216-1469).
    Returns tau_abs (ncol, pver, nlwband): pabs = Chebyshev sum * wetvol *
    rhoh2o (:1418-1421), dopaer = pabs * mass (:1422)."""
    tbl = mode.table
    nband = tbl.absplw.shape[0]
    dtype = dgnumwet.dtype
    _, _, cheb = modal_size_parameters(dgnumwet, tbl.rmmin, tbl.rmmax,
                                       mode.sigma_logr)
    refr, refi, wetvol, dryvol = _volume_mix_refindex(
        specmmr, mode.species_density, mode.species_refindex_lw, qaerwat,
        CREFWLW[:nband], nband, dtype)
    w_r = _bilinear_cell(tbl.refrtablw, refr)
    w_i = _bilinear_cell(tbl.refitablw, refi)
    coef = jnp.einsum('cpbr,cpbi,brin->cpbn', w_r, w_i,
                      jnp.asarray(tbl.absplw, dtype))
    pabs = 0.5 * coef[..., 0] + \
        jnp.einsum('cpbn,cpn->cpb', coef[..., 1:], cheb[..., 1:])
    pabs = jnp.maximum(pabs * (wetvol * RHOH2O)[..., None], 0.0)
    return pabs * mass[..., None]


def modal_aero_optics_all(modes, specmmr_by_mode, dgnumwet_m, qaerwat_m,
                          mass):
    """Multi-mode sweep (the `do m = 1, nmodes` loops, :707 and :1325):
    accumulate tauxar/wa/ga/fa over modes and emit per-mode diagnostics.

    dgnumwet_m/qaerwat_m: (ncol, pver, nmodes). Returns
    (sw_totals, lw_tau, per_mode_diags)."""
    tot = None
    lw = None
    diags = {}
    for m, (mode, specmmr) in enumerate(zip(modes, specmmr_by_mode)):
        sw = modal_aero_sw(mode, specmmr, dgnumwet_m[..., m],
                           qaerwat_m[..., m], mass)
        lw_m = modal_aero_lw(mode, specmmr, dgnumwet_m[..., m],
                             qaerwat_m[..., m], mass)
        if tot is None:
            tot = {k: sw[k] for k in ("tau", "tau_w", "tau_w_g", "tau_w_f")}
            lw = lw_m
        else:
            for k in tot:
                tot[k] = tot[k] + sw[k]
            lw = lw + lw_m
        for k, out in (("AODVIS", "AODVIS"), ("AODABS", "AODABS"),
                       ("AODNIR", "AODNIR"), ("AODUV", "AODUV"),
                       ("burden", "BURDEN")):
            diags[f"{out}_{mode.name}"] = sw[k]
    return tot, lw, diags
