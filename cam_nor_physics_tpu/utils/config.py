"""Typed configuration dataclasses (TPU-native replacement for Fortran namelists).

The reference reads one Fortran namelist group per subsystem on the master rank
and MPI-broadcasts field by field (`dyn_fv_inparm` /root/reference/fv/dyn_comp.F90:206-213,
`zmconv_nl` /root/reference/physics/zm_conv_intr.F90:188-192, `phys_ctl_nl`
/root/reference/physics/phys_control.F90:133-144). Here each group is a frozen
dataclass; all hosts construct the same config from the same TOML/dict, so no
broadcast is needed. Defaults preserve the reference's semantics, including the
nsplit auto-computation formula (/root/reference/fv/dyn_comp.F90:412-451).
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from typing import Any

log = logging.getLogger("cam_nor_tpu")


@dataclass(frozen=True)
class FVConfig:
    """FV dycore run configuration (dyn_fv_inparm equivalent).

    Mirrors the knobs of /root/reference/fv/dyn_comp.F90:159-454 and the derived
    quantities stored in T_FVDYCORE_STATE (/root/reference/fv/dynamics_vars.F90:279-309).
    """

    nsplit: int = 0           # Lagrangian time splits; 0 = auto (init_nsplit)
    nspltrac: int = 0         # tracer time splits; 0 = auto (max(1, nsplit/4))
    nspltvrm: int = 0         # vertical remap splits; 0 = auto (1)
    iord: int = 4             # E-W scheme order (1 upwind, 2 van Leer, 3 PPM, 4 PPM+monotonic)
    jord: int = 4             # N-S scheme order
    kord: int = 4             # vertical remap scheme order
    conserve: bool = False    # total-energy conserving vertical remap
    # filter C-grid winds (reference namelist `filtcw`, on only if > 0 with
    # default 0). DEVIATION: this solver's c_sw half step REQUIRES the
    # C-increment polar filter (unfiltered near-pole PGF kicks blow up in
    # ~15 small steps — cd_core.py:289-306), so any filtcw >= 0 keeps it
    # on; filtcw < 0 (an explicit request to disable) raises
    # NotImplementedError in dyn_run rather than silently no-opping.
    filtcw: int = 0
    fft_flt: int = 1          # 0 = FFT/algebraic filter, 1 = FFT filter
    # Divergence/velocity damping selector (fv_div24del2flag,
    # /root/reference/fv/dyn_comp.F90:190-192): 2 = 2nd-order divergence
    # damping, 4 = 4th-order (biharmonic) divergence damping, 24 = both,
    # 42 = 4th-order divergence + del2 velocity damping. Repo extension
    # 22 = 2nd-order divergence + del2 velocity damping — the round-1
    # validated operating point for THIS solver's explicit forward-backward
    # coupling (1.9°x2.5° Held-Suarez: ns=4/del2=3e5 dies day ~11
    # (subtropical jet mode), ns=4/del2=6e5 + c_sw_pgf stable day 20+),
    # kept as the default until the reference flags are revalidated here.
    div24del2flag: int = 22
    del2coef: float = 6.0e5   # strength of 2nd-order velocity damping
    # Nondimensional damping strengths (coef · Δy²/dt resp. coef · Δy⁴/dt).
    # The reference's del2 strength is tau/(128·dt) with the model-top
    # sponge tau = max(1, 8(1+tanh(ln(ptop/p)))) (upstream cd_core tables,
    # allocated at /root/reference/fv/dynamics_vars.F90:940-952): interior
    # 1/128 ≈ 0.0078 rising to 1/16 at the top. 0.08 is this solver's
    # validated interior floor; div_damp_top_taper adds the sponge profile
    # via max(floor, sponge).
    div2_coef_nd: float = 0.08
    div4_coef_nd: float = 0.02
    div_damp_top_taper: bool = True
    # Full C-grid half step (c_sw role): advance delp/pt a half step on the
    # C grid and kick the advective winds with Coriolis + the PGF of the
    # half-advanced state, with the increments polar-filtered (filtcw
    # role). This is what buys the reference's cΔt/Δ ≈ 1 small-step
    # envelope; without it the polar cap blows up at nsplit=4 (measured:
    # first NaN at rows |lat| > 86°, all levels at once). False falls back
    # to the Coriolis-only half rotation (needs the doubled split count).
    c_sw_pgf: bool = True
    # Polar-filter the D-step mass/pt transport increments as well as the
    # wind tendencies (experimental; zonal mean untouched so global mass is
    # exactly conserved). Stability experiments only.
    filter_dm: bool = False
    # Polar-filter the C half-step mass/pt increments (the reference
    # filters the c_sw products delpf/ptc with pft2d). Stability knob.
    filter_csw_dm: bool = False
    # KE form in the vector-invariant update: "centered" (square of the
    # D2A-averaged winds), "avg_sq" (average of squares), "upwind"
    # (upstream-biased edge selection, the FV-family Hollingsworth-
    # Kallberg treatment).
    ke_method: str = "centered"
    high_order_top: bool = False
    # WACCM-X variable-composition thermodynamics in the dycore
    # (fv_high_altitude, /root/reference/fv/dyn_comp.F90:2371-2489): κ is
    # advected as an extra tracer through trac2d and pt is corrected for
    # the κ change implied by the advected major species. `major_species`
    # locates those species in the dycore tracer stack as (name, q-index)
    # pairs with names from ops/thermo.MAJOR_SPECIES ('O', 'O2', 'H'); N2
    # is the remainder. Empty means N2-only composition (κ constant —
    # the correction is an exact no-op, useful for testing the machinery).
    high_altitude: bool = False
    major_species: tuple = ()
    am_correction: bool = False
    am_geom_crrct: bool = False
    am_fixer: bool = False
    am_fix_lbl: bool = False
    am_fix_taper: bool = False
    am_fix_tpr_h: float = 95e2
    am_fix_tpr_w: float = 10e2
    am_diag: bool = False
    # Fused per-level Pallas TPU kernels for the transport/vorticity hot
    # path (ops/pallas_kernels.py). "auto": on for single-chip TPU, off on
    # CPU and under multi-chip sharding (where the XLA path partitions);
    # True/False force. Numerics identical to f32 roundoff (measured).
    use_pallas: bool | str = "auto"

    def resolved_splits(self, dt: float, im: int, jm: int) -> tuple[int, int, int]:
        """Resolve (nsplit, nspltrac, nspltvrm), applying the reference's auto rules.

        nsplit auto formula: ns = int(ns0*dt*dim/(dt0*dim0) + 0.75), floored at 1,
        with ns0=4, dt0=1800, dim0=191, dim=max(im, 2*(jm-1))
        (/root/reference/fv/dyn_comp.F90:412-451). nspltrac defaults to
        max(1, nsplit/4) (:326); nspltvrm defaults to 1 (:334).
        """
        ns = self.nsplit
        if ns <= 0:
            # ns0 matches the reference's 4 when the c_sw half step is on
            # (the validated default: 20-day HS stable at 1.9°x2.5° with
            # del2coef=6e5). The Coriolis-only fallback half step is only
            # stable to c·dt/Δ ≈ 0.5, so it needs the split count doubled.
            dim0, dt0 = 191.0, 1800.0
            ns0 = 4.0 if self.c_sw_pgf else 8.0
            dim = max(im, 2 * (jm - 1))
            ns = max(1, int(ns0 * dt * dim / (dt0 * dim0) + 0.75))
        nspltrac = self.nspltrac if self.nspltrac > 0 else max(1, ns // 4)
        nspltvrm = self.nspltvrm if self.nspltvrm > 0 else 1
        return ns, nspltrac, nspltvrm


@dataclass(frozen=True)
class ZMConfig:
    """Zhang-McFarlane deep convection configuration (zmconv_nl equivalent).

    Namelist knobs from /root/reference/physics/zm_conv_intr.F90:66-81,188-192;
    hard-wired "tht" switches and tunables from /root/reference/physics/zm_conv.F90:75-103.
    Defaults are the CAM6/NorESM production values.
    """

    # namelist tunables
    c0_lnd: float = 0.0075     # autoconversion coefficient over land (1/m)
    c0_ocn: float = 0.0300     # autoconversion coefficient over ocean (1/m)
    ke: float = 5.0e-6         # evaporation efficiency
    ke_lnd: float = 5.0e-6
    momcu: float = 0.4         # updraft momentum-transport pressure-gradient parameter
    momcd: float = 0.4         # downdraft momentum-transport pressure-gradient parameter
    num_cin: int = 5           # negative-buoyancy layers allowed (must be <= 5, zm_conv.F90:200)
    org: bool = False          # Mapes-Neale organization tracer
    microp: bool = False       # convective microphysics inside updraft
    dmpdz: float = -1.0e-3     # test-parcel fractional entrainment rate (1/m, negative)
    tiedke_add: float = 0.5    # launching buoyancy of plume ensemble (K)
    capelmt: float = 70.0      # CAPE threshold for deep convection (J/kg)
    parcel_pbl: bool = False   # PBL-mixed launch parcel
    tau: float = 3600.0        # CAPE-relaxation closure timescale (s)
    no_deep_pbl: bool = False  # eliminate deep convection entirely within PBL

    # tht switches, hard-wired true in the reference (zm_conv.F90:75-78)
    second_call: bool = True   # iterate parcel-plume calculation
    retrigger: bool = True     # iterate trigger condition
    use_cin: bool = True       # CIN gating of the trigger
    tht_tweaks: bool = True    # enthalpy (not entropy) plume mixing etc.

    # hard-wired tunables (zm_conv.F90:83-103)
    capelmt_lnd: float = 70.0
    tiedke_lnd: float = 1.0
    cape_tau: float = 3.6e3
    entrmn: float = 2.0e-4     # max convective entrainment rate (1/m)
    alfadet: float = 0.1       # detrainment/entrainment ratio
    tentr_lnd: float = 1.0e-3
    plclmin: float = 6.0e2     # min LCL pressure (hPa): no convection if LCL above
    cin_threshd: float = 0.33  # max CIN as fraction of CAPE
    parcel_hscale: float = 0.5 # PBL-height scaling for parcel mixing (lparcel_pbl)

    # TPU-first numerics: entropy/enthalpy inversion method. "newton" is a
    # fixed-count unrolled solver (fast on TPU, 0.001 K-equivalent answers);
    # "brent" reproduces the reference's iterate-to-convergence loop
    # (zm_conv.F90:5304-5414).
    inversion_solver: str = "newton"
    # Parcel-ascent implementation. "batched" hoists every thermodynamic
    # inversion out of the level scans: the entrainment budget is a masked
    # suffix-sum, so the whole ascent inverts in ONE batched (ncol, pver)
    # call; the precip/freeze adjustment becomes a short fixed-point of
    # {lightweight carry scan -> batched inversion} sweeps. Same converged
    # answers (the inversions are guess-independent to their 1e-3 K
    # tolerance), ~20x shallower sequential depth on TPU. "scan" is the
    # reference-shaped level-recursive form kept for validation.
    parcel_impl: str = "batched"
    precip_sweeps: int = 3     # fixed-point sweeps in the batched adjustment
    # The zm_convr core has ONE execution story: the XLA scan path (the
    # experimental level-major Pallas mega-kernel was deleted in round 3 —
    # faster but not bitwise; see zm_conv_intr.py). This flag is retained
    # for config-file compatibility and must stay False.
    use_pallas: bool | str = False
    # Fused Pallas kernel for the ZM tail (evap + momtran + convtran,
    # models/physics/zm_tail_pallas.py): (pver, cols)-major layout with
    # statically unrolled level recursions. "auto" = on for single-chip TPU
    # float32 (the XLA lowering is dispatch-bound there); False forces XLA.
    use_pallas_tail: bool | str = "auto"

    def __post_init__(self) -> None:
        if self.num_cin > 5:
            raise ValueError("ZMConfig: num_cin must not exceed 5 "
                             "(reference zm_conv.F90:200)")
        if not self.tht_tweaks and (self.second_call or self.retrigger):
            raise ValueError("ZMConfig: tht_tweaks must be True to use "
                             "second_call or retrigger (zm_conv.F90:197)")

    @property
    def tentrm(self) -> float:
        """Initial test-parcel entrainment rate = -dmpdz (zm_conv.F90 tentrm=-dmpdz_param)."""
        return -self.dmpdz


@dataclass(frozen=True)
class PhysConfig:
    """Physics package control flags (phys_ctl_nl equivalent).

    Scheme selections + switches from /root/reference/physics/phys_control.F90:33-117.
    """

    cam_physpkg: str = "cam6"
    deep_scheme: str = "ZM"
    shallow_scheme: str = "CLUBB_SGS"
    eddy_scheme: str = "CLUBB_SGS"
    microp_scheme: str = "MG"
    macrop_scheme: str = "CLUBB_SGS"
    radiation_scheme: str = "rrtmg"
    srf_flux_avg: int = 0
    cld_macmic_num_steps: int = 1   # macro/micro substeps per physics step
    micro_do_icesupersat: bool = False
    use_subcol_microp: bool = False
    state_debug_checks: bool = True
    history_amwg: bool = True
    history_verbose: bool = False
    history_aerosol: bool = False
    history_budget: bool = False
    history_budget_histfile_num: int = 1
    history_waccm: bool = False
    do_clubb_sgs: bool = True
    use_gw_oro: bool = True
    use_gw_front: bool = False
    use_gw_convect: bool = False
    # TEM circulation diagnostics in d_p_coupling (do_circulation_diags,
    # /root/reference/fv/dp_coupling.F90:274-279)
    do_circulation_diags: bool = False
    # QBO zonal-mean wind forcing input (qbo_use_forcing, :318-320)
    qbo_use_forcing: bool = False
    use_hetfrz_classnuc: bool = False
    waccmx_opt: str = "off"
    fv_am_correction: bool = False  # set by the dycore (dyn_comp.F90:374)
    use_oslo_aero: bool = False     # oslo_aero_share equivalent (stub => False)
    prog_modal_aero: bool = True
    # snapshot hooks (cam_take_snapshot_before/after, phys_control.F90:111-114):
    # when True, tphysbc/tphysac record T/q before+after each
    # parameterization into the diagnostics payload for offline diffing
    cam_snapshot: bool = False
    # Rayleigh friction (rayleigh_friction_tend, physpkg.F90:2177-2185):
    # raytau0 <= 0 disables (the upstream default without the namelist)
    rayk0: int = 2
    raykrange: float = 0.0
    raytau0: float = 0.0          # e-folding time at model top (days)
    # modal aerosol optics modes (rad_constituents role): tuple of
    # modal_aer_opt.AeroMode; when non-empty and prog_modal_aero (and not
    # use_oslo_aero), tphysbc emits the AOD diagnostics family
    # (physpkg.F90:2899-2930 nstep-0 aerosol-optics branch)
    aero_modes: tuple = ()

    def cam_physpkg_is(self, name: str) -> bool:
        return self.cam_physpkg == name

    def waccmx_is(self, name: str) -> bool:
        return self.waccmx_opt == name


@dataclass(frozen=True)
class GridConfig:
    """Horizontal/vertical resolution and tracer count."""

    im: int = 144      # longitudes
    jm: int = 96       # latitudes (pole to pole, pole points included)
    km: int = 26       # levels
    pcnst: int = 3     # constituents (Q must be index 0, physpkg.F90:113)
    dtime: float = 1800.0  # large (physics) timestep in seconds


@dataclass(frozen=True)
class ModelConfig:
    """Top-level bundle of all subsystem configs."""

    grid: GridConfig = field(default_factory=GridConfig)
    fv: FVConfig = field(default_factory=FVConfig)
    zm: ZMConfig = field(default_factory=ZMConfig)
    phys: PhysConfig = field(default_factory=PhysConfig)

    def echo(self) -> None:
        """Log the full configuration at init, like the reference's masterproc echo
        (/root/reference/fv/dyn_comp.F90:376-401, zm_conv.F90:185-225)."""
        for name, sub in (("grid", self.grid), ("fv", self.fv),
                          ("zm", self.zm), ("phys", self.phys)):
            for f in dataclasses.fields(sub):
                log.info("config %s.%s = %r", name, f.name, getattr(sub, f.name))


def _apply_overrides(cls: type, data: dict[str, Any]) -> Any:
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data) - names
    if unknown:
        raise KeyError(f"unknown {cls.__name__} keys: {sorted(unknown)}")
    return cls(**data)


def config_from_dict(data: dict[str, Any]) -> ModelConfig:
    """Build a ModelConfig from a nested dict (e.g. parsed TOML/YAML/JSON)."""
    return ModelConfig(
        grid=_apply_overrides(GridConfig, data.get("grid", {})),
        fv=_apply_overrides(FVConfig, data.get("fv", {})),
        zm=_apply_overrides(ZMConfig, data.get("zm", {})),
        phys=_apply_overrides(PhysConfig, data.get("phys", {})),
    )


def config_from_toml(path: str) -> ModelConfig:
    import tomllib

    with open(path, "rb") as f:
        return config_from_dict(tomllib.load(f))
