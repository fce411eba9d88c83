"""General physics diagnostics — cam_diagnostics equivalent.

Re-implementation of the output side of
/root/reference/physics/cam_diagnostics.F90 (2833 lines). The reference's
hundreds of addfld declarations + per-chunk outfld calls become: declaration
via utils.history.HistoryRegistry, and the payload builders here, each
returning a {name: array} dict to feed `outfld_many`:

  diag_phys_writeout      (:1953) — state fields T/U/V/Q/PS/OMEGA/Z3, the
                                    p-level slice families, moments,
                                    IVT/stability indices
  diag_conv               (:2021) — convective/moist budget terms
  diag_surf               (:2199) — surface fields from cam_in/cam_out
  diag_export             (:2307) — precip/flux fields bound for the coupler
  diag_conv_tend_ini      (:1306) — store pre-convection T/q for budget diffs
  diag_phys_tend_writeout (:2696) — before/after-physics T/U/V snapshots and
                                    total physics tendencies
  diag_clip_tend_writeout (:1975) — negative-water clipping tendencies
  diag_physvar_ic         (:2368) — pbuf physics variables on IC tapes

The Oslo-aerosol optics block (:378-723, DLOAD_*/EC550*/... emitted only
`if (use_oslo_aero)`) is out of scope exactly as the reference's stubbed
`use_oslo_aero = .false.` makes it; the modal-aerosol AOD family comes from
modal_aer_opt.py instead.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils import constants as c
from ...utils.history import HistoryRegistry

# ---------------------------------------------------------------------------
# catalog (diag_init_dry/moist role, cam_diagnostics.F90:195-1304)
# ---------------------------------------------------------------------------

# (name, units, long_name, vdim) with optional 5th avgflag element
_CATALOG = [
    # dycore state + pressures (:240-330)
    ("NSTEP", "timestep", "Model timestep", "srf", "I"),
    ("PHIS", "m2/s2", "Surface geopotential", "srf", "I"),
    ("PS", "Pa", "Surface pressure", "srf"),
    ("PSDRY", "Pa", "Dry surface pressure", "srf"),
    ("PSL", "Pa", "Sea level pressure", "srf"),
    ("PMID", "Pa", "Pressure at layer midpoints", "mid"),
    ("PINT", "Pa", "Pressure at layer interfaces", "int"),
    ("PDEL", "Pa", "Layer pressure thickness", "mid"),
    ("PDELDRY", "Pa", "Dry-air layer pressure thickness", "mid"),
    ("AIRMASSL", "kg/m2", "Layer air mass", "mid"),
    ("GRIDAREA", "m2", "Column grid area", "srf", "I"),
    ("T", "K", "Temperature", "mid"),
    ("U", "m/s", "Zonal wind", "mid"),
    ("V", "m/s", "Meridional wind", "mid"),
    ("Q", "kg/kg", "Specific humidity", "mid"),
    ("OMEGA", "Pa/s", "Vertical velocity (pressure)", "mid"),
    ("Z3", "m", "Geopotential height above sea level", "mid"),
    # before/after-physics snapshots + total tendencies (:246-298, 2696)
    ("TBP", "K", "Temperature (before physics)", "mid"),
    ("UBP", "m/s", "Zonal wind (before physics)", "mid"),
    ("VBP", "m/s", "Meridional wind (before physics)", "mid"),
    ("TAP", "K", "Temperature (after physics)", "mid"),
    ("UAP", "m/s", "Zonal wind (after physics)", "mid"),
    ("VAP", "m/s", "Meridional wind (after physics)", "mid"),
    ("QBP", "kg/kg", "Specific humidity (before physics)", "mid"),
    ("CLDLIQBP", "kg/kg", "Cloud liquid (before physics)", "mid"),
    ("CLDICEBP", "kg/kg", "Cloud ice (before physics)", "mid"),
    ("QAP", "kg/kg", "Specific humidity (after physics)", "mid"),
    ("CLDLIQAP", "kg/kg", "Cloud liquid (after physics)", "mid"),
    ("CLDICEAP", "kg/kg", "Cloud ice (after physics)", "mid"),
    ("TTEND_TOT", "K/s", "Total temperature tendency", "mid"),
    ("UTEND_TOT", "m/s2", "Total zonal-wind tendency", "mid"),
    ("VTEND_TOT", "m/s2", "Total meridional-wind tendency", "mid"),
    ("UTEND_PHYSTOT", "m/s2", "Zonal-wind tendency from physics", "mid"),
    ("VTEND_PHYSTOT", "m/s2", "Meridional-wind tendency from physics",
     "mid"),
    ("PTTEND", "K/s", "T tendency: total physics parameterizations", "mid"),
    # dynamics-tendency family (diag_phys_tend_writeout's DTCORE block,
    # cam_diagnostics.F90:286-300; stored across the bc/ac boundary in
    # pbuf by physpkg)
    ("DTCORE", "K/s", "T tendency due to dynamical core", "mid"),
    ("DQCORE", "kg/kg/s", "Water vapor tendency due to dynamical core",
     "mid"),
    ("UTEND_CORE", "m/s2", "Zonal-wind tendency due to dynamical core",
     "mid"),
    ("VTEND_CORE", "m/s2", "Meridional-wind tendency due to dynamical "
     "core", "mid"),
    # ZM heating/moistening rates (zm_conv_intr.F90 outfld families; the
    # history_budget heating-rate members)
    ("ZMDT", "K/s", "T tendency - Zhang-McFarlane moist convection",
     "mid"),
    ("ZMDQ", "kg/kg/s", "Q tendency - Zhang-McFarlane moist convection",
     "mid"),
    ("EVAPTZM", "K/s", "T tendency - evaporation/snow production from "
     "ZM convection", "mid"),
    ("EVAPQZM", "kg/kg/s", "Q tendency - evaporation from ZM convection",
     "mid"),
    # ZM in-plume microphysics family (zm_conv_micro_outfld,
    # zm_conv_intr.F90:1292-1390)
    ("CLDLIQZM", "kg/kg", "ZM in-plume convective cloud liquid", "mid"),
    ("CLDICEZM", "kg/kg", "ZM in-plume convective cloud ice", "mid"),
    ("ICIMRDP", "kg/kg", "Deep-convection in-cloud ice mixing ratio",
     "mid"),
    ("QNLZM", "1/kg", "ZM in-plume droplet number", "mid"),
    ("QNIZM", "1/kg", "ZM in-plume crystal number", "mid"),
    ("WUZM", "m/s", "ZM updraft vertical velocity", "mid"),
    ("FRZZM", "kg/kg/s", "ZM in-plume freezing rate", "mid"),
    ("CLIQSNUM", "1", "ZM cloud-liquid presence sample number", "mid"),
    ("CICESNUM", "1", "ZM cloud-ice presence sample number", "mid"),
    ("WUZMSNUM", "1", "ZM updraft-velocity presence sample number", "mid"),
    ("ZMDCAPE", "J/kg", "ZM freezing-CAPE increment", "srf"),
    ("ZMFRZ", "K/s", "ZM freezing heating rate", "mid"),
    ("ZMSPRD", "kg/kg/s", "ZM snow production rate", "mid"),
    ("DIFZM", "kg/kg/s", "Detrained ice water from ZM convection", "mid"),
    ("DNLFZM", "1/kg/s", "Detrained liquid-number tendency from ZM",
     "mid"),
    ("DNIFZM", "1/kg/s", "Detrained ice-number tendency from ZM", "mid"),
    ("ZMNLIQ", "1/kg", "ZM in-plume liquid number", "mid"),
    ("ZMNICE", "1/kg", "ZM in-plume ice number", "mid"),
    ("AUTOL_M", "kg/kg/s", "ZM in-plume autoconversion mass rate", "mid"),
    ("ACCRL_M", "kg/kg/s", "ZM in-plume accretion mass rate", "mid"),
    ("FHTIM_M", "kg/kg/s", "ZM immersion-freezing mass rate", "mid"),
    ("FHTCT_M", "kg/kg/s", "ZM contact/deposition-freezing mass rate",
     "mid"),
    ("HMPI_M", "kg/kg/s", "ZM homogeneous-freezing mass rate", "mid"),
    ("BERGN_M", "kg/kg/s", "ZM Wegener-Bergeron-Findeisen mass rate",
     "mid"),
    ("ACTIV_N", "1/kg/s", "ZM droplet-activation number rate", "mid"),
    ("AUTOL_N", "1/kg/s", "ZM autoconversion number-loss rate", "mid"),
    ("ACCRL_N", "1/kg/s", "ZM accretion number-loss rate", "mid"),
    ("FHTIM_N", "1/kg/s", "ZM immersion-freezing number rate", "mid"),
    ("FHTCT_N", "1/kg/s", "ZM contact-freezing number rate", "mid"),
    ("TFIX", "K/s", "T fixer (T tendency from energy fixer)", "srf"),
    ("PTTEND_DME", "K/s", "T tendency: dry-mass adjustment", "mid"),
    ("IETEND_DME", "W/m2", "Column internal-energy tendency: dry-mass "
     "adjustment", "srf"),
    # geopotential-height p-surfaces (:312-330)
    ("Z050", "m", "Geopotential Z at 50 mbar pressure surface", "srf"),
    ("Z100", "m", "Geopotential Z at 100 mbar pressure surface", "srf"),
    ("Z200", "m", "Geopotential Z at 200 mbar pressure surface", "srf"),
    ("Z300", "m", "Geopotential Z at 300 mbar pressure surface", "srf"),
    ("Z500", "m", "Geopotential Z at 500 mbar pressure surface", "srf"),
    ("Z700", "m", "Geopotential Z at 700 mbar pressure surface", "srf"),
    ("Z1000", "m", "Geopotential Z at 1000 mbar pressure surface", "srf"),
    # temperature p-surfaces (:471-520)
    ("T010", "K", "Temperature at 10 mbar pressure surface", "srf"),
    ("T200", "K", "Temperature at 200 mbar pressure surface", "srf"),
    ("T300", "K", "Temperature at 300 mbar pressure surface", "srf"),
    ("T400", "K", "Temperature at 400 mbar pressure surface", "srf"),
    ("T500", "K", "Temperature at 500 mbar pressure surface", "srf"),
    ("T700", "K", "Temperature at 700 mbar pressure surface", "srf"),
    ("T850", "K", "Temperature at 850 mbar pressure surface", "srf"),
    ("T925", "K", "Temperature at 925 mbar pressure surface", "srf"),
    ("T1000", "K", "Temperature at 1000 mbar pressure surface", "srf"),
    # wind p-surfaces (:523-556)
    ("U010", "m/s", "Zonal wind at 10 mbar pressure surface", "srf"),
    ("U200", "m/s", "Zonal wind at 200 mbar pressure surface", "srf"),
    ("U250", "m/s", "Zonal wind at 250 mbar pressure surface", "srf"),
    ("U500", "m/s", "Zonal wind at 500 mbar pressure surface", "srf"),
    ("U850", "m/s", "Zonal wind at 850 mbar pressure surface", "srf"),
    ("V200", "m/s", "Meridional wind at 200 mbar pressure surface", "srf"),
    ("V250", "m/s", "Meridional wind at 250 mbar pressure surface", "srf"),
    ("V500", "m/s", "Meridional wind at 500 mbar pressure surface", "srf"),
    ("V850", "m/s", "Meridional wind at 850 mbar pressure surface", "srf"),
    # humidity p-surfaces
    ("Q200", "kg/kg", "Specific humidity at 200 mbar pressure surface",
     "srf"),
    ("Q850", "kg/kg", "Specific humidity at 850 mbar pressure surface",
     "srf"),
    ("Q925", "kg/kg", "Specific humidity at 925 mbar pressure surface",
     "srf"),
    ("Q1000", "kg/kg", "Specific humidity at 1000 mbar pressure surface",
     "srf"),
    ("OMEGA500", "Pa/s", "Vertical velocity at 500 mbar pressure surface",
     "srf"),
    ("OMEGA850", "Pa/s", "Vertical velocity at 850 mbar pressure surface",
     "srf"),
    # layer-difference stability indices (:486-515)
    ("T7001000", "K", "T difference 700 mb - 1000 mb", "srf"),
    ("T8501000", "K", "T difference 850 mb - 1000 mb", "srf"),
    ("T9251000", "K", "T difference 925 mb - 1000 mb", "srf"),
    ("TH7001000", "K", "Theta difference 700 mb - 1000 mb", "srf"),
    ("TH8501000", "K", "Theta difference 850 mb - 1000 mb", "srf"),
    ("TH9251000", "K", "Theta difference 925 mb - 1000 mb", "srf"),
    ("THE7001000", "K", "Theta_e difference 700 mb - 1000 mb", "srf"),
    ("THE8501000", "K", "Theta_e difference 850 mb - 1000 mb", "srf"),
    ("THE9251000", "K", "Theta_e difference 925 mb - 1000 mb", "srf"),
    # second moments / transport products (:333-468)
    ("VT", "K m/s", "Meridional heat transport", "mid"),
    ("VU", "m2/s2", "Meridional flux of zonal momentum", "mid"),
    ("VV", "m2/s2", "Meridional velocity squared", "mid"),
    ("VQ", "m/s kg/kg", "Meridional water transport", "mid"),
    ("VZ", "m2/s", "Meridional transport of geopotential height", "mid"),
    ("ZZ", "m2", "Geopotential height squared", "mid"),
    ("QQ", "kg2/kg2", "Eddy moisture variance", "mid"),
    ("TT", "K2", "Eddy temperature variance", "mid"),
    ("UU", "m2/s2", "Zonal velocity squared", "mid"),
    ("OMEGAT", "K Pa/s", "Vertical heat flux", "mid"),
    ("OMEGAU", "m Pa/s2", "Vertical flux of zonal momentum", "mid"),
    ("OMEGAV", "m Pa/s2", "Vertical flux of meridional momentum", "mid"),
    ("OMEGAQ", "kg/kg Pa/s", "Vertical water transport", "mid"),
    ("OMGAOMGA", "Pa2/s2", "Vertical flux of vertical momentum", "mid"),
    ("MQ", "kg/m2", "Water vapor mass in layer", "mid"),
    ("WSPEED", "m/s", "Horizontal total wind speed maximum", "mid", "X"),
    ("WSPDSRFMX", "m/s", "Horizontal total wind speed maximum at the "
     "surface", "srf", "X"),
    ("WSPDSRFAV", "m/s", "Horizontal total wind speed average at the "
     "surface", "srf"),
    # humidity / moisture integrals (:560-640)
    ("RELHUM", "percent", "Relative humidity", "mid"),
    ("RHW", "percent", "Relative humidity with respect to liquid", "mid"),
    ("RHI", "percent", "Relative humidity with respect to ice", "mid"),
    ("RHCFMIP", "percent", "Relative humidity with respect to water above "
     "273 K, ice below 273 K", "mid"),
    ("TMQ", "kg/m2", "Total (vertically integrated) precipitable water",
     "srf"),
    ("IVT", "kg/m/s", "Total (vertically integrated) vapor transport",
     "srf"),
    ("uIVT", "kg/m/s", "u component of integrated vapor transport", "srf"),
    ("vIVT", "kg/m/s", "v component of integrated vapor transport", "srf"),
    ("ATMEINT", "J/m2", "Vertically integrated total atmospheric energy",
     "srf"),
    # bottom-level + reference-height fields (:643-700)
    ("TBOT", "K", "Lowest model level temperature", "srf"),
    ("UBOT", "m/s", "Lowest model level zonal wind", "srf"),
    ("VBOT", "m/s", "Lowest model level meridional wind", "srf"),
    ("QBOT", "kg/kg", "Lowest model level water vapor mixing ratio", "srf"),
    ("ZBOT", "m", "Lowest model level height", "srf"),
    ("TREFHT", "K", "Reference height temperature", "srf"),
    ("TREFHTMN", "K", "Minimum reference height temperature over output "
     "period", "srf", "M"),
    ("TREFHTMX", "K", "Maximum reference height temperature over output "
     "period", "srf", "X"),
    ("QREFHT", "kg/kg", "Reference height humidity", "srf"),
    ("RHREFHT", "fraction", "Reference height relative humidity", "srf"),
    # moist-process budget terms (diag_conv, :2021)
    # per-constituent column burdens (upstream constituent_burden_comp,
    # called from diag_phys_writeout at cam_diagnostics.F90:1738: "column
    # burdens of all constituents except water vapor"; vapor is TMQ)
    ("CB_CLDLIQ", "kg/m2", "Column burden CLDLIQ", "srf"),
    ("CB_CLDICE", "kg/m2", "Column burden CLDICE", "srf"),
    ("DTCOND", "K/s", "T tendency - moist processes", "mid"),
    ("DCQ", "kg/kg/s", "Q tendency - moist processes", "mid"),
    ("DCCLDLIQ", "kg/kg/s", "CLDLIQ tendency - moist processes", "mid"),
    ("DCCLDICE", "kg/kg/s", "CLDICE tendency - moist processes", "mid"),
    # migrating-tide extraction products (diag_conv's tidal_diag block,
    # :2156-2161): DTCOND x sin/cos of the 24/12/8-hour local-solar-time
    # harmonics; monthly means of these isolate the migrating tides
    ("DTCOND_24_SIN", "K/s", "DTCOND 24hr. sin coeff.", "mid"),
    ("DTCOND_24_COS", "K/s", "DTCOND 24hr. cos coeff.", "mid"),
    ("DTCOND_12_SIN", "K/s", "DTCOND 12hr. sin coeff.", "mid"),
    ("DTCOND_12_COS", "K/s", "DTCOND 12hr. cos coeff.", "mid"),
    ("DTCOND_08_SIN", "K/s", "DTCOND 8hr. sin coeff.", "mid"),
    ("DTCOND_08_COS", "K/s", "DTCOND 8hr. cos coeff.", "mid"),
    # clipping tendencies (diag_clip_tend_writeout, :1975)
    ("INEGCLPTEND", "kg/kg/s", "Cloud-ice tendency due to clipping "
     "negative values", "mid"),
    ("LNEGCLPTEND", "kg/kg/s", "Cloud-liquid tendency due to clipping "
     "negative values", "mid"),
    ("VNEGCLPTEND", "kg/kg/s", "Water-vapor tendency due to clipping "
     "negative values", "mid"),
    # surface fields (diag_surf, :2199)
    ("SHFLX", "W/m2", "Surface sensible heat flux", "srf"),
    ("LHFLX", "W/m2", "Surface latent heat flux", "srf"),
    ("QFLX", "kg/m2/s", "Surface water flux", "srf"),
    ("TAUX", "N/m2", "Zonal surface stress", "srf"),
    ("TAUY", "N/m2", "Meridional surface stress", "srf"),
    ("TS", "K", "Surface temperature (radiative)", "srf"),
    ("TSMN", "K", "Minimum surface temperature over output period", "srf",
     "M"),
    ("TSMX", "K", "Maximum surface temperature over output period", "srf",
     "X"),
    ("SST", "K", "Sea surface temperature", "srf"),
    ("SNOWHLND", "m", "Water equivalent snow depth (land)", "srf"),
    ("SNOWHICE", "m", "Water equivalent snow depth (ice)", "srf"),
    ("LANDFRAC", "fraction", "Fraction of surface area that is land",
     "srf"),
    ("ICEFRAC", "fraction", "Fraction of surface area that is sea-ice",
     "srf"),
    ("OCNFRAC", "fraction", "Fraction of surface area that is ocean",
     "srf"),
    ("ASDIR", "fraction", "Albedo: shortwave, direct", "srf"),
    ("ASDIF", "fraction", "Albedo: shortwave, diffuse", "srf"),
    ("ALDIR", "fraction", "Albedo: longwave, direct", "srf"),
    ("ALDIF", "fraction", "Albedo: longwave, diffuse", "srf"),
    # precip / export fields (diag_export, :2307)
    ("PRECT", "m/s", "Total (convective and large-scale) precipitation "
     "rate", "srf"),
    ("PRECTMX", "m/s", "Maximum total precipitation rate over output "
     "period", "srf", "X"),
    ("PRECC", "m/s", "Convective precipitation rate", "srf"),
    ("PRECL", "m/s", "Large-scale (stable) precipitation rate", "srf"),
    ("PRECSC", "m/s", "Convective snow rate (water equivalent)", "srf"),
    ("PRECSL", "m/s", "Large-scale snow rate (water equivalent)", "srf"),
    ("PRECST", "m/s", "Total snow rate (water equivalent)", "srf"),
    ("PRECCav", "m/s", "Average large-scale precipitation (convective)",
     "srf"),
    ("PRECLav", "m/s", "Average large-scale precipitation", "srf"),
    # cloud-cover summaries (cldsav role)
    ("CLDTOT", "fraction", "Vertically-integrated total cloud", "srf"),
    ("CLDLOW", "fraction", "Vertically-integrated low cloud", "srf"),
    ("CLDMED", "fraction", "Vertically-integrated mid-level cloud", "srf"),
    ("CLDHGH", "fraction", "Vertically-integrated high cloud", "srf"),
    ("CLDFREE", "fraction", "Fractional occurrence of cloud-free column",
     "srf"),
    # general tail (diag_init, cam_diagnostics.F90:195-850): airmass /
    # gas "constants" / reference-height extrema / surface LW up / 10 m
    # wind / precip partition
    ("AIRMASS", "kg/m2", "Vertically integrated dry air mass", "srf"),
    ("CPAIRV", "J/K/kg", "Specific heat of dry air (variable composition "
     "slot; constant here)", "mid"),
    ("RAIRV", "J/K/kg", "Gas constant of dry air (variable composition "
     "slot; constant here)", "mid"),
    ("TREFMXAV", "K", "Average of TREFHT daily maximum", "srf", "X"),
    ("TREFMNAV", "K", "Average of TREFHT daily minimum", "srf", "M"),
    ("U10", "m/s", "10 m wind speed", "srf"),
    ("FLUS", "W/m2", "Upwelling longwave flux at surface", "srf"),
    ("EFLX", "W/m2", "Net energy flux into the surface", "srf"),
    ("PREC_PCW", "m/s", "Stratiform (macro/microphysics slot) "
     "precipitation rate", "srf"),
    ("PREC_zmc", "m/s", "Deep-convective (ZM) precipitation rate", "srf"),
]

# pbuf physics variables written to IC tapes (diag_physvar_ic, :2368-2500)
_IC_FIELDS = [
    ("QCWAT", "kg/kg", "q associated with cloud water", "mid"),
    ("TCWAT", "K", "T associated with cloud water", "mid"),
    ("LCWAT", "kg/kg", "Cloud water (liq+ice)", "mid"),
    ("CLOUD", "fraction", "Cloud fraction", "mid"),
    ("CONCLD", "fraction", "Convective cloud fraction", "mid"),
    ("CUSH", "Pa", "Convective scale height", "srf"),
    ("TKE", "m2/s2", "Turbulent kinetic energy", "int"),
    ("KVM", "m2/s", "Vertical diffusivity (momentum)", "int"),
    ("KVH", "m2/s", "Vertical diffusivity (heat/moisture)", "int"),
    ("PBLH", "m", "PBL height", "srf"),
    ("TPERT", "K", "Perturbation temperature (eddies in PBL)", "srf"),
    ("QPERT", "kg/kg", "Perturbation specific humidity (eddies in PBL)",
     "srf"),
]


def amwg_core_fields() -> list[str]:
    """The AMWG-core default-tape set (the reference's history_amwg
    add_default block, cam_diagnostics.F90 diag_init + phys_control
    history_amwg): every catalog field a standard h0 climate tape carries.
    The driver add_defaults these (plus the dycore/ZM families registered
    elsewhere) when history is on."""
    return [row[0] for row in _CATALOG] + \
        [name + "&IC" for name, *_ in _IC_FIELDS]


def budget_register(reg: HistoryRegistry, tape: int = 1,
                    cnst_names=("Q",)) -> None:
    """history_budget tape defaults (cam_diagnostics.F90:760-850): route
    the state/tendency budget families — PHIS/PS/T/U/V, the total
    tendencies, the before/after-physics snapshots, the dynamics-tendency
    family, and the per-constituent budget fields — to `tape`
    (history_budget_histfile_num role). Call after diag_register."""
    names = ["PHIS", "PS", "T", "U", "V",
             "TTEND_TOT", "UTEND_TOT", "VTEND_TOT",
             "TBP", "UBP", "VBP", "TAP", "UAP", "VAP",
             "QBP", "QAP", "CLDLIQBP", "CLDLIQAP", "CLDICEBP", "CLDICEAP",
             "PTTEND", "TFIX", "PTTEND_DME",
             "DTCORE", "DQCORE", "UTEND_CORE", "VTEND_CORE",
             "DTCOND", "EVAPTZM", "ZMDT", "EVAPQZM", "ZMDQ"]
    for n in cnst_names:
        if f"DC{n}" in reg.fields:
            names.append(f"DC{n}")
    for n in names:
        if n in reg.fields and n not in reg.defaults.get(tape, []):
            reg.add_default(n, tape=tape)


def diag_register(reg: HistoryRegistry) -> None:
    """Declare the diagnostic field set (diag_init_dry/moist role,
    cam_diagnostics.F90:195-1304)."""
    for row in _CATALOG:
        name, units, long_name, vdim = row[:4]
        avgflag = row[4] if len(row) > 4 else "A"
        if name not in reg.fields:
            reg.addfld(name, units, long_name, vdim=vdim, avgflag=avgflag)
    for name, units, long_name, vdim in _IC_FIELDS:
        icname = name + "&IC"
        if icname not in reg.fields:
            reg.addfld(icname, units, long_name, vdim=vdim, avgflag="I")


def plevel_slice(field, pmid, p_target: float):
    """Linear-in-log-p interpolation of a (ncol, pver) field to one pressure
    surface (vertical_interpolate role); clamps outside the column range."""
    lnp = jnp.log(pmid)
    lnt = jnp.log(jnp.asarray(p_target, field.dtype))
    km = field.shape[1]
    cnt = jnp.sum(lnp <= lnt, axis=1)
    k = jnp.clip(cnt - 1, 0, km - 2)
    oh_lo = (k[:, None] == jnp.arange(km)).astype(field.dtype)
    oh_hi = (k[:, None] + 1 == jnp.arange(km)).astype(field.dtype)
    p_lo = jnp.sum(oh_lo * lnp, axis=1)
    p_hi = jnp.sum(oh_hi * lnp, axis=1)
    f_lo = jnp.sum(oh_lo * field, axis=1)
    f_hi = jnp.sum(oh_hi * field, axis=1)
    w = jnp.clip((lnt - p_lo) / jnp.where(p_hi == p_lo, 1.0, p_hi - p_lo),
                 0.0, 1.0)
    return f_lo + w * (f_hi - f_lo)


def _theta_e(t, q, pmid):
    """Bolton (1980) pseudo-equivalent potential temperature (the
    reference's THE* stability indices)."""
    e = pmid * q / (c.EPSILO + q)
    e = jnp.maximum(e, 1.0e-3)
    tl = 2840.0 / (3.5 * jnp.log(t) - jnp.log(e * 0.01) - 4.805) + 55.0
    theta = t * (1.0e5 / pmid) ** (0.2854 * (1.0 - 0.28 * q))
    return theta * jnp.exp((3.376 / tl - 0.00254) * 1.0e3 * q *
                           (1.0 + 0.81 * q))


def diag_phys_writeout(state, nstep: int | float = 0, area=None) -> dict:
    """State snapshot payload (diag_phys_writeout,
    cam_diagnostics.F90:1953): prognostic fields, pressure-surface slices,
    second moments, moisture integrals, stability indices."""
    from ...ops.saturation import qsat, qsat_ice, qsat_water
    t, u, v = state.t, state.u, state.v
    qv = state.q[:, :, 0]
    pmid = state.pmid
    _, qs = qsat(t, pmid)
    _, qsw = qsat_water(t, pmid)
    _, qsi = qsat_ice(t, pmid)
    z3 = state.zm + state.phis[:, None] / c.GRAVIT
    wspd = jnp.sqrt(u ** 2 + v ** 2)
    ncol = t.shape[0]

    sl = lambda f, p: plevel_slice(f, pmid, p)
    theta = t * (1.0e5 / pmid) ** c.CAPPA
    the = _theta_e(t, qv, pmid)

    # vertically integrated total energy (ATMEINT): cp*T + Phi + K + L*q
    # over mass — the tot_energy_phys 'phys' accounting
    e_int = jnp.sum((c.CPAIR * t + c.GRAVIT * z3 + 0.5 * wspd ** 2 +
                     c.LATVAP * qv) * state.pdel, axis=1) / c.GRAVIT

    out = {
        "NSTEP": jnp.broadcast_to(jnp.asarray(nstep, t.dtype), (ncol,)),
        "T": t, "U": u, "V": v, "Q": qv,
        "PS": state.ps, "PSDRY": state.psdry, "OMEGA": state.omega,
        "PMID": pmid, "PINT": state.pint, "PDEL": state.pdel,
        "PDELDRY": state.pdeldry,
        "AIRMASSL": state.pdel / c.GRAVIT,
        "Z3": z3,
        "RELHUM": 100.0 * qv / jnp.maximum(qs, 1e-12),
        "RHW": 100.0 * qv / jnp.maximum(qsw, 1e-12),
        "RHI": 100.0 * qv / jnp.maximum(qsi, 1e-12),
        "RHCFMIP": 100.0 * qv / jnp.maximum(
            jnp.where(t >= 273.0, qsw, qsi), 1e-12),
        "TMQ": jnp.sum(qv * state.pdel, axis=-1) / c.GRAVIT,
        "uIVT": jnp.sum(u * qv * state.pdel, axis=-1) / c.GRAVIT,
        "vIVT": jnp.sum(v * qv * state.pdel, axis=-1) / c.GRAVIT,
        "ATMEINT": e_int,
        "TREFHT": t[:, -1],
        "QREFHT": qv[:, -1],
        "TREFHTMN": t[:, -1], "TREFHTMX": t[:, -1],
        "RHREFHT": qv[:, -1] / jnp.maximum(qs[:, -1], 1e-12),
        "TBOT": t[:, -1], "UBOT": u[:, -1], "VBOT": v[:, -1],
        "QBOT": qv[:, -1], "ZBOT": state.zm[:, -1],
        "PHIS": state.phis,
        # second moments / transports
        "VT": v * t, "VU": v * u, "VQ": v * qv, "VZ": v * z3,
        "ZZ": z3 * z3, "QQ": qv * qv, "TT": t * t, "UU": u * u,
        "VV": v * v,
        "OMEGAT": state.omega * t, "OMEGAU": state.omega * u,
        "OMEGAV": state.omega * v, "OMEGAQ": state.omega * qv,
        "OMGAOMGA": state.omega * state.omega,
        "MQ": qv * state.pdel / c.GRAVIT,
        "WSPEED": wspd, "WSPDSRFMX": wspd[:, -1], "WSPDSRFAV": wspd[:, -1],
        "AIRMASS": jnp.sum(state.pdeldry, axis=-1) / c.GRAVIT,
        "CPAIRV": jnp.full_like(t, c.CPAIR),
        "RAIRV": jnp.full_like(t, c.RAIR),
        "TREFMXAV": t[:, -1], "TREFMNAV": t[:, -1],
        "U10": wspd[:, -1],
        "FLUS": c.STEBOL * t[:, -1] ** 4,
    }
    if area is not None:
        out["GRIDAREA"] = area
    # pressure-surface families
    for p in (10e2, 200e2, 300e2, 400e2, 500e2, 700e2, 850e2, 925e2,
              1000e2):
        out[f"T{int(p / 100):03d}" if p < 100e2 else f"T{int(p / 100)}"] = \
            sl(t, p)
    for p in (50e2, 100e2, 200e2, 300e2, 500e2, 700e2, 1000e2):
        out[f"Z{int(p / 100):03d}" if p < 100e2 else f"Z{int(p / 100)}"] = \
            sl(z3, p)
    for p in (10e2, 200e2, 250e2, 500e2, 850e2):
        out[f"U{int(p / 100):03d}" if p < 100e2 else f"U{int(p / 100)}"] = \
            sl(u, p)
    for p in (200e2, 250e2, 500e2, 850e2):
        out[f"V{int(p / 100)}"] = sl(v, p)
    for p in (200e2, 850e2, 925e2, 1000e2):
        out[f"Q{int(p / 100)}"] = sl(qv, p)
    out["OMEGA500"] = sl(state.omega, 500e2)
    out["OMEGA850"] = sl(state.omega, 850e2)
    out["IVT"] = jnp.sqrt(out["uIVT"] ** 2 + out["vIVT"] ** 2)
    # layer-difference stability indices (T/TH/THE at 700/850/925 − 1000)
    t1000, th1000, the1000 = sl(t, 1000e2), sl(theta, 1000e2), sl(the,
                                                                  1000e2)
    for p, tag in ((700e2, "7001000"), (850e2, "8501000"),
                   (925e2, "9251000")):
        out[f"T{tag}"] = sl(t, p) - t1000
        out[f"TH{tag}"] = sl(theta, p) - th1000
        out[f"THE{tag}"] = sl(the, p) - the1000
    return out


def constituent_burdens(state, cnst_names) -> dict:
    """Column burdens of all constituents except water vapor (upstream
    constituent_burden_comp contract, cam_diagnostics.F90:867-868,
    1737-1738); only constituents with a declared CB_<name> field reach
    the tape (outfld drops the rest)."""
    out = {}
    for m, name in enumerate(cnst_names):
        if m == 0:
            continue                           # vapor burden is TMQ
        out["CB_" + name] = jnp.sum(state.q[:, :, m] * state.pdel,
                                    axis=-1) / c.GRAVIT
    return out


def diag_cloud(cld, pmid) -> dict:
    """Cloud-cover summaries by maximum-random overlap (cldsav role,
    cam_diagnostics' CLDTOT/CLDLOW/CLDMED/CLDHGH; bands at 700/400 hPa)."""
    eps = 1.0e-6

    def overlap(mask):
        cf = jnp.where(mask, cld, 0.0)
        cf_up = jnp.concatenate([cf[:, :1] * 0.0, cf[:, :-1]], axis=1)
        num = 1.0 - jnp.maximum(cf, cf_up)
        den = 1.0 - jnp.minimum(cf_up, 1.0 - eps)
        return 1.0 - jnp.prod(num / den, axis=1)

    ones = jnp.ones_like(cld, bool)
    tot = overlap(ones)
    return {
        "CLDTOT": tot,
        "CLDFREE": 1.0 - tot,
        "CLDLOW": overlap(pmid > 700e2),
        "CLDMED": overlap((pmid <= 700e2) & (pmid > 400e2)),
        "CLDHGH": overlap(pmid <= 400e2),
    }


def diag_conv_tend_ini(state) -> dict:
    """Pre-moist-processes snapshot for budget differencing
    (diag_conv_tend_ini, cam_diagnostics.F90:1306, called at
    physpkg.F90:2745 right after the energy fixer). The snapshot crosses
    the tphysbc→tphysac boundary via pbuf (physpkg_pbuf_specs
    DTCOND_TINI/DQCOND_QINI)."""
    return {"T_ini": state.t, "Q_ini": state.q}


def diag_conv(state, ini: dict, ztodt: float, cnst_names=()) -> dict:
    """Convective/moist budget terms (diag_conv, cam_diagnostics.F90:2021,
    called at physpkg.F90:2006 after convect_deep_tend_2): DTCOND plus the
    per-constituent DC<name> family (the reference's dcconnam fields) for
    every constituent a DC field is declared for."""
    q_ini = ini["Q_ini"]
    out = {
        "DTCOND": (state.t - ini["T_ini"]) / ztodt,
        "DCQ": (state.q[:, :, 0] - q_ini[:, :, 0]) / ztodt,
    }
    for m, name in enumerate(cnst_names):
        if m == 0:
            continue                      # Q handled as DCQ above
        out["DC" + name] = (state.q[:, :, m] - q_ini[:, :, m]) / ztodt
    return out


def tidal_coeffs(lons, time_days, dtype=jnp.float64):
    """Local-solar-time tide coefficients (the upstream tidal_diag role
    consumed by diag_conv, cam_diagnostics.F90:2156-2161): sin/cos of the
    n = 1, 2, 3 harmonics (24/12/8 hours) of local solar time
    θ_lst = 2π·(UTC day fraction) + λ, with λ in RADIANS (FVGrid.lons).
    Returns a (6, nlon) stack ordered
    [24_SIN, 24_COS, 12_SIN, 12_COS, 08_SIN, 08_COS]."""
    lam = jnp.asarray(lons, dtype)
    theta = 2.0 * jnp.pi * (jnp.asarray(time_days, dtype) % 1.0) + lam
    return jnp.stack([f(n * theta)
                      for n in (1.0, 2.0, 3.0)
                      for f in (jnp.sin, jnp.cos)])


def diag_conv_tidal(dtcond, coeffs) -> dict:
    """DTCOND × tidal coefficients (cam_diagnostics.F90:2156-2161).
    `dtcond`: (ncol, pver) with ncol = jm*im row-major; `coeffs`: (6, im)
    from tidal_coeffs (zonally periodic, latitude-independent)."""
    names = ("DTCOND_24_SIN", "DTCOND_24_COS", "DTCOND_12_SIN",
             "DTCOND_12_COS", "DTCOND_08_SIN", "DTCOND_08_COS")
    ncol = dtcond.shape[0]
    im = coeffs.shape[1]
    col = jnp.tile(coeffs, (1, ncol // im))          # (6, ncol) row-major
    return {n: dtcond * col[i][:, None] for i, n in enumerate(names)}


def diag_phys_tend_writeout(state_before, state_after, ztodt: float,
                            cnst_names=()) -> dict:
    """Before/after-physics snapshots and the total physics tendencies
    (the TBP/TAP families, diag_state_b4_phys_write incl. the moist
    bpcnst/apcnst constituent snapshots, + diag_phys_tend_writeout,
    cam_diagnostics.F90:246-298, 2696, 2748-2833)."""
    rdt = 1.0 / ztodt
    out = {}
    for m, name in enumerate(cnst_names):
        if name in ("Q", "CLDLIQ", "CLDICE"):
            out[name + "BP"] = state_before.q[:, :, m]
            out[name + "AP"] = state_after.q[:, :, m]
    return out | {
        "TBP": state_before.t, "UBP": state_before.u,
        "VBP": state_before.v,
        "TAP": state_after.t, "UAP": state_after.u, "VAP": state_after.v,
        "PTTEND": (state_after.t - state_before.t) * rdt,
        "UTEND_PHYSTOT": (state_after.u - state_before.u) * rdt,
        "VTEND_PHYSTOT": (state_after.v - state_before.v) * rdt,
        "TTEND_TOT": (state_after.t - state_before.t) * rdt,
        "UTEND_TOT": (state_after.u - state_before.u) * rdt,
        "VTEND_TOT": (state_after.v - state_before.v) * rdt,
    }


def diag_clip_tend_writeout(q_preclip, q_clipped, ztodt: float, ix_q: int,
                            ix_cldliq: int, ix_cldice: int) -> dict:
    """Clipping tendencies from the actual pre-clip prediction and the
    clipped result (the (state%q - preclip)·rtdt form of
    cam_diagnostics.F90:2007-2012)."""
    rdt = 1.0 / ztodt
    out = {}
    for name, ix in (("VNEGCLPTEND", ix_q), ("LNEGCLPTEND", ix_cldliq),
                     ("INEGCLPTEND", ix_cldice)):
        if ix >= 0:
            out[name] = (q_clipped[:, :, ix] - q_preclip[:, :, ix]) * rdt
    return out


def diag_physvar_ic(pbuf) -> dict:
    """Physics-buffer variables for IC tapes (diag_physvar_ic,
    cam_diagnostics.F90:2368-2500): each present pbuf field goes out under
    NAME&IC with instantaneous averaging."""
    out = {}
    for name, _, _, _ in _IC_FIELDS:
        val = pbuf.get(name) if pbuf.has(name) else None
        if val is not None:
            out[name + "&IC"] = val
    return out


def diag_surf(cam_in, cam_out) -> dict:
    """Surface diagnostics (diag_surf, cam_diagnostics.F90:2199)."""
    out = {
        "SHFLX": cam_in.shf, "LHFLX": cam_in.lhf,
        "QFLX": cam_in.cflx[:, 0],
        "TAUX": cam_in.wsx, "TAUY": cam_in.wsy, "TS": cam_in.ts,
        "TSMN": cam_in.ts, "TSMX": cam_in.ts,
        "PSL": cam_out.psl,
        # net energy flux INTO the surface: absorbed solar + downwelling
        # LW minus turbulent losses (EFLX role); netsw/flwds are the
        # coupler export payload
        "EFLX": (cam_out.netsw + cam_out.flwds - cam_in.shf - cam_in.lhf),
    }
    for attr, name in (("landfrac", "LANDFRAC"), ("icefrac", "ICEFRAC"),
                       ("ocnfrac", "OCNFRAC"), ("snowhland", "SNOWHLND"),
                       ("snowhice", "SNOWHICE"), ("sst", "SST"),
                       ("asdir", "ASDIR"), ("asdif", "ASDIF"),
                       ("aldir", "ALDIR"), ("aldif", "ALDIF")):
        val = getattr(cam_in, attr, None)
        if val is not None:
            out[name] = val
    return out


def diag_export(cam_out) -> dict:
    """Coupler-bound precip/flux payload (diag_export,
    cam_diagnostics.F90:2307)."""
    prect = cam_out.precc + cam_out.precl
    return {
        "PRECT": prect,
        "PRECTMX": prect,
        "PRECST": cam_out.precsc + cam_out.precsl,
        "PRECC": cam_out.precc,
        "PRECL": cam_out.precl,
        "PRECSC": cam_out.precsc,
        "PRECSL": cam_out.precsl,
        "PRECCav": cam_out.precc,
        "PRECLav": cam_out.precl,
        "PREC_zmc": cam_out.precc,
        "PREC_PCW": cam_out.precl,
    }
