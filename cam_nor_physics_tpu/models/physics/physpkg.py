"""Physics package driver — physpkg equivalent (tphysbc/tphysac sequences).

Re-implementation of /root/reference/physics/physpkg.F90 (3053 lines), the
CLUBB-reordered CAM physics driver. The reference's chunk/OMP machinery
(physpkg.F90:1147-1161) has no equivalent: the whole column batch runs as one
jitted program (SURVEY §2.3 P4). Parameterizations the reference calls but
does not shadow (CLUBB, MG microphysics, RRTMG radiation, gravity waves,
chemistry, …) are cleanly stubbed behind their interface contracts — each stub
returns a zero ptend and writes its expected pbuf fields, so the sequencing,
energy accounting, and pbuf dataflow match physpkg.F90 §3.3/3.5 exactly and a
real implementation can slot in per stub.

Sequence (pre-coupler, tphysbc, physpkg.F90:2508-2942):
  qneg3 -> energy fixer -> dry adjustment -> deep convection (ZM) ->
  convect_diagnostics -> cam_export
Sequence (post-coupler, tphysac, physpkg.F90:1342-2506):
  qneg4 flux limiter -> surface-flux application (vertical_diffusion's
  surface term; full PBL diffusion stubbed via CLUBB slot) -> macro/micro
  substep loop (CLUBB + microphysics stubs) -> wet deposition stub ->
  convect_deep_tend_2 -> radiation stub -> dry-mass/energy adjustment ->
  teout save
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ...utils import constants as c
from ...utils.config import PhysConfig, ZMConfig
from ..coupling.camsrfexch import CamIn, CamOut, cam_export
from .check_energy import (check_energy_chng, check_energy_fix,
                           check_energy_gmean, column_energy)
from .constituents import ConstituentRegistry
from .convect_diagnostics import convect_diagnostics_calc
from .dadadj import dadadj_tend
from .physics_buffer import PhysicsBuffer, pbuf_register, zm_pbuf_specs
from .state import (PhysicsState, PhysicsTend, physics_dme_adjust,
                    physics_update, ptend_init, ptend_sum, set_dry_to_wet)
from .zm_conv_intr import zm_conv_tend, zm_conv_tend_2
from ...ops.fill import qneg3, qneg4


def physpkg_pbuf_specs(ncol: int, pver: int, nmodes: int = 1,
                       pcnst: int = 1) -> dict:
    """Full pbuf registration: ZM set + driver-level persistent fields
    (phys_register, physpkg.F90:100-352). nmodes sizes the per-mode
    aerosol wateruptake stacks (len(phys_cfg.aero_modes)); pcnst sizes the
    moist-process budget snapshot (diag_conv_tend_ini payload)."""
    specs = dict(zm_pbuf_specs(ncol, pver))
    specs.update({
        # pre-moist-processes T/q snapshot for the DTCOND/DC* budget
        # family (diag_conv_tend_ini, physpkg.F90:2745 -> diag_conv,
        # :2006) — crosses the tphysbc/tphysac boundary, so pbuf
        "DTCOND_TINI": ((ncol, pver), "physpkg"),
        "DQCOND_QINI": ((ncol, pver, pcnst), "physpkg"),
        "TEOUT": ((ncol,), "global"),        # physpkg.F90:231
        # explicit validity flag for the energy fixer's TEOUT payload: 0
        # until tphysac has stored a real value (replaces the fragile
        # all-zero sentinel; a half-initialized pbuf with stale TEOUT must
        # not fire the fixer)
        "TEOUT_VALID": ((1,), "global"),
        # dynamics-tendency diagnostics (physpkg.F90:1046-1049, 2470-2477):
        # tphysac stores end-of-physics T/q/u/v; next step's tphysbc
        # differences them against the post-dynamics state
        "DTCORE": ((ncol, pver), "global"),
        "DQCORE": ((ncol, pver), "global"),
        "DUCORE": ((ncol, pver), "global"),
        "DVCORE": ((ncol, pver), "global"),
        # gravity-wave frontogenesis sources + QBO zonal-mean wind,
        # computed in d_p_coupling (dyn_comp.F90:469-476 registration;
        # dp_coupling.F90:313-320 fill)
        "FRONTGF": ((ncol, pver), "global"),
        "FRONTGA": ((ncol, pver), "global"),
        "UZM": ((ncol, pver), "global"),
        "QINI": ((ncol, pver), "physpkg"),
        "CLDLIQINI": ((ncol, pver), "physpkg"),
        "CLDICEINI": ((ncol, pver), "physpkg"),
        "RLIQBC": ((ncol,), "physpkg"),      # physpkg.F90:2894
        # aerosol water uptake state for modal optics: per-mode stacks, as
        # the reference's (pcols, pver, nmodes) pbuf fields
        # (modal_aer_opt.F90:652-663 pbuf_get_field DGNUMWET/QAERWAT; filled
        # by the calcsize + wateruptake equivalents at physpkg.F90:2899-2930)
        "DGNUMDRY": ((ncol, pver, nmodes), "global"),
        "DGNUMWET": ((ncol, pver, nmodes), "global"),
        "QAERWAT": ((ncol, pver, nmodes), "global"),
        "WETDENS_AP": ((ncol, pver, nmodes), "global"),
        # per-mode aerosol number (1/kg) from calcsize — feeds the ZM
        # convective-microphysics activation (zm_aero_t number role)
        "NAER": ((ncol, pver, nmodes), "global"),
    })
    return specs


@struct.dataclass
class PhysRunOut:
    state: PhysicsState
    pbuf: PhysicsBuffer
    tend: PhysicsTend
    cam_out: CamOut
    diagnostics: dict



# Ordered snapshot sites (cam_take_snapshot_before/after tape contract,
# phys_control.F90:111-114, physpkg.F90:2788-2804): every _snap call tag, in
# execution order. snapshot_register() declares the tape fields from this
# list; tests localize injected perturbations against it.
SNAPSHOT_SITES = (
    "chkenergyfix_before", "chkenergyfix_after",
    "dadadj_before", "dadadj_after",
    "convect_deep_before", "convect_deep_after",
    "vertical_diffusion_before", "vertical_diffusion_after",
    "macmic_before", "macmic_after",
    "convect_deep_2_before", "convect_deep_2_after",
    "radiation_before", "radiation_after",
    "rayleigh_before", "rayleigh_after",
    "dme_adjust_before", "dme_adjust_after",
)

# per-site payload: the full prognostic state + (when the site produced
# one) the parameterization's ptend — the reference writes state%T/u/v/s/ps
# + every constituent + ptend to the before/after tapes
_SNAP_STATE_FIELDS = ("T", "U", "V", "S", "PS")

# after-sites whose parameterization exposes a single ptend to snapshot
# (ZM applies its tendencies internally — its payload is the ZMDT/ZMDQ
# diagnostics family; dme_adjust is a state adjustment, not a ptend)
_PTEND_SITES = ("chkenergyfix_after", "dadadj_after",
                "vertical_diffusion_after", "macmic_after",
                "convect_deep_2_after", "radiation_after",
                "rayleigh_after")


def _snap(diags: dict, phys_cfg: PhysConfig, tag: str, state,
          ptend=None) -> None:
    """Snapshot hook (cam_take_snapshot_before/after role,
    phys_control.F90:111-114, write sites physpkg.F90:2788-2804): record
    the FULL prognostic state (T/u/v/s/ps + every constituent) — and, at
    'after' sites, the parameterization's ptend — for offline diffing when
    phys_cfg.cam_snapshot. Fields ride the diagnostics dict and land on
    whatever tape snapshot_register() declared them to."""
    if not phys_cfg.cam_snapshot:
        return
    diags[f"SNAP_{tag}_T"] = state.t
    diags[f"SNAP_{tag}_U"] = state.u
    diags[f"SNAP_{tag}_V"] = state.v
    diags[f"SNAP_{tag}_S"] = state.s
    diags[f"SNAP_{tag}_PS"] = state.ps
    for k in range(state.pcnst):
        diags[f"SNAP_{tag}_Q{k:02d}"] = state.q[:, :, k]
    if ptend is not None:
        diags[f"SNAP_{tag}_PTEND_S"] = ptend.s
        diags[f"SNAP_{tag}_PTEND_U"] = ptend.u
        diags[f"SNAP_{tag}_PTEND_V"] = ptend.v
        for k in range(state.pcnst):
            diags[f"SNAP_{tag}_PTEND_Q{k:02d}"] = ptend.q[:, :, k]


def snapshot_register(reg, pcnst: int, tape: int = 1) -> None:
    """Declare the snapshot payload on a history tape (the reference's
    cam_snapshot_before_num/after_num tapes, phys_control.F90:111-114):
    one instantaneous field per SNAPSHOT_SITES x state/ptend component.
    `reg` is a utils.history.HistoryRegistry."""
    units = {"T": "K", "U": "m/s", "V": "m/s", "S": "J/kg", "PS": "Pa"}
    for tag in SNAPSHOT_SITES:
        for f in _SNAP_STATE_FIELDS:
            reg.addfld(f"SNAP_{tag}_{f}", units[f],
                       f"snapshot {f} at {tag}",
                       vdim="srf" if f == "PS" else "mid", avgflag="I")
            reg.add_default(f"SNAP_{tag}_{f}", tape=tape)
        for k in range(pcnst):
            reg.addfld(f"SNAP_{tag}_Q{k:02d}", "kg/kg",
                       f"snapshot constituent {k} at {tag}", avgflag="I")
            reg.add_default(f"SNAP_{tag}_Q{k:02d}", tape=tape)
        if tag in _PTEND_SITES:
            for f in ("S", "U", "V"):
                reg.addfld(f"SNAP_{tag}_PTEND_{f}",
                           "J/kg/s" if f == "S" else "m/s2",
                           f"snapshot ptend {f} at {tag}", avgflag="I")
                reg.add_default(f"SNAP_{tag}_PTEND_{f}", tape=tape)
            for k in range(pcnst):
                reg.addfld(f"SNAP_{tag}_PTEND_Q{k:02d}", "kg/kg/s",
                           f"snapshot ptend constituent {k} at {tag}",
                           avgflag="I")
                reg.add_default(f"SNAP_{tag}_PTEND_Q{k:02d}", tape=tape)

def _stub_ptend(name: str, state: PhysicsState):
    """Zero ptend with the interface shape of an unported parameterization
    (CLUBB / MG / RRTMG / gw / chem slots; contracts at physpkg.F90:1736,
    1813, 2030, 2254)."""
    return ptend_init(name, state.ncol, state.pver, state.pcnst,
                      dtype=state.t.dtype)


def tphysbc(phys_cfg: PhysConfig, zm_cfg: ZMConfig,
            registry: ConstituentRegistry, state: PhysicsState,
            pbuf: PhysicsBuffer, cam_in: CamIn, ztodt: float,
            nstep: int = 1) -> PhysRunOut:
    """Pre-coupler physics (tphysbc, physpkg.F90:2508-2942)."""
    ncol, pver, pcnst = state.ncol, state.pver, state.pcnst
    dtype = state.t.dtype
    diags = {}
    tend = PhysicsTend.zeros(ncol, pver, dtype)

    # save step-start vapor/condensate for dme_adjust + budget diags
    pbuf = pbuf.update(QINI=state.q[:, :, 0])
    ixliq, ixice = registry.index("CLDLIQ"), registry.index("CLDICE")
    if ixliq > 0:
        pbuf = pbuf.set("CLDLIQINI", state.q[:, :, ixliq])
    if ixice > 0:
        pbuf = pbuf.set("CLDICEINI", state.q[:, :, ixice])

    # qneg3 (physpkg.F90:2702-2707)
    qmin = jnp.asarray(registry.qmin_array(), dtype)
    q_fixed, _, _ = qneg3(state.q, qmin[None, None, :])
    state = state.replace(q=q_fixed)

    _snap(diags, phys_cfg, 'chkenergyfix_before', state)
    # ---- ENERGY FIXER (physpkg.F90:2726-2781) ----
    # close the dycore's energy non-conservation against the previous step's
    # exported energy (TEOUT); nstep 0 has no previous value
    teout_prev = pbuf.get("TEOUT") if nstep > 0 else None
    if teout_prev is not None:
        heat = check_energy_fix(state, registry, teout_prev) / ztodt
        # the fixer fires only against a TEOUT that tphysac actually
        # stored (explicit validity flag; an uninitialized or stale pbuf
        # payload must not drive the fixer)
        heat = heat * pbuf.get("TEOUT_VALID")[0]
    else:
        heat = jnp.zeros_like(state.t)
    ptend = ptend_init("chkenergyfix", ncol, pver, pcnst, ls=True,
                       dtype=dtype).replace(s=heat)
    state, tend = physics_update(state, ptend, ztodt, registry, tend)
    state, ediag = check_energy_chng(state, registry, ztodt,
                                     flx_sen=jnp.sum(heat * state.pdel,
                                                     axis=-1) / c.GRAVIT)
    diags["EFIX"] = jnp.sum(heat * state.pdel, axis=-1) / c.GRAVIT
    # TFIX: the fixer's (column-uniform) T tendency (cam_diagnostics TFIX)
    diags["TFIX"] = heat[:, -1] / c.CPAIR

    # ---- T/q/u/v tendencies due to dynamics (physpkg.F90:2770-2781):
    # difference the post-dynamics state against the values tphysac stored
    # at the end of the previous physics step ----
    if nstep > 0:
        valid = pbuf.get("TEOUT_VALID")[0]
        diags["DTCORE"] = valid * (state.t - pbuf.get("DTCORE")) / ztodt
        diags["DQCORE"] = valid * (state.q[:, :, 0] -
                                   pbuf.get("DQCORE")) / ztodt
        diags["UTEND_CORE"] = valid * (state.u - pbuf.get("DUCORE")) / ztodt
        diags["VTEND_CORE"] = valid * (state.v - pbuf.get("DVCORE")) / ztodt

    _snap(diags, phys_cfg, 'chkenergyfix_after', state, ptend=ptend)
    # pre-moist-processes snapshot (diag_conv_tend_ini, physpkg.F90:2745)
    from .cam_diagnostics import diag_conv_tend_ini
    _ini = diag_conv_tend_ini(state)
    pbuf = pbuf.update(DTCOND_TINI=_ini["T_ini"], DQCOND_QINI=_ini["Q_ini"])
    _snap(diags, phys_cfg, 'dadadj_before', state)
    # ---- DRY ADJUSTMENT (physpkg.F90:2786-2806) ----
    tend_s, tend_q = dadadj_tend(state, ztodt)
    lq = (True,) + (False,) * (pcnst - 1)
    ptend = ptend_init("dadadj", ncol, pver, pcnst, ls=True, lq=lq,
                       dtype=dtype)
    ptend = ptend.replace(s=tend_s, q=ptend.q.at[:, :, 0].set(tend_q))
    state, tend = physics_update(state, ptend, ztodt, registry, tend)

    _snap(diags, phys_cfg, 'dadadj_after', state, ptend=ptend)
    _snap(diags, phys_cfg, 'convect_deep_before', state)
    # ---- DEEP CONVECTION (physpkg.F90:2813-2868 -> zm_conv_tend) ----
    pblh = pbuf.get("PBLH")
    tpert = pbuf.get("TPERT")
    aero = None
    if (zm_cfg.microp and phys_cfg.prog_modal_aero
            and not phys_cfg.use_oslo_aero and phys_cfg.aero_modes):
        # modal aerosol state for in-plume activation (zm_aero_init role,
        # zm_conv_intr.F90:1032-1410): last step's NAER/DGNUMWET stacks
        # (explicit coupling; filled by the calcsize branch below)
        modes = phys_cfg.aero_modes
        hyg = tuple(
            float(sum(m.species_hygro) / len(m.species_hygro))
            if m.species_hygro else 0.1 for m in modes)
        aero = dict(num=pbuf.get("NAER"), dgnum=pbuf.get("DGNUMWET"),
                    hygro=hyg)
    zm_out = zm_conv_tend(zm_cfg, registry, state, pbuf, pblh, tpert,
                          cam_in.landfrac, ztodt, aero=aero)
    state, pbuf = zm_out.state1, zm_out.pbuf
    diags.update(zm_out.diagnostics)
    prec_dp = pbuf.get("PREC_DP")
    snow_dp = pbuf.get("SNOW_DP")
    state, ediag = check_energy_chng(
        state, registry, ztodt,
        flx_cnd=prec_dp + zm_out.rliq,         # both m/s (physpkg.F90:2867)
        flx_ice=snow_dp + zm_out.rice)
    diags["ZM_TE_ERR"] = ediag.te_err

    _snap(diags, phys_cfg, 'convect_deep_after', state)
    # ---- merged convection diagnostics (physpkg.F90:2885-2887) ----
    diags.update(convect_diagnostics_calc(state, pbuf))
    pbuf = pbuf.set("RLIQBC", zm_out.rliq)               # (:2894-2895)

    # ---- modal aerosol optics diagnostics (physpkg.F90:2899-2930: the
    # nstep-0 calcsize/wateruptake + optics branch, skipped for oslo) ----
    if (phys_cfg.prog_modal_aero and not phys_cfg.use_oslo_aero
            and phys_cfg.aero_modes):
        from .modal_aer_opt import modal_aero_optics_all
        from .modal_aero_wateruptake import (modal_aero_calcsize,
                                             modal_aero_wateruptake)
        from ...ops.saturation import qsat_water
        modes = phys_cfg.aero_modes
        mass = state.pdeldry / c.GRAVIT          # dry layer mass (:545)
        # calcsize + wateruptake fill the per-mode DGNUMWET/QAERWAT stacks
        # (modal_aero_calcsize_diag + modal_aero_wateruptake_dr,
        # physpkg.F90:2906-2913 / modal_aer_opt.F90:697-704)
        es, qs = qsat_water(state.t, state.pmid)
        rh = jnp.clip(state.q[:, :, 0] / jnp.maximum(qs, 1.0e-12), 0.0, 1.0)
        specmmr_by_mode, dg_dry, dg_wet, qw, wdens, naer_m = \
            [], [], [], [], [], []
        for mode in modes:
            specmmr = [state.q[:, :, registry.index(n)]
                       for n in mode.species_names]
            specmmr_by_mode.append(specmmr)
            num = (state.q[:, :, registry.index(mode.num_name)]
                   if mode.num_name else None)
            dgnum, naer, _ = modal_aero_calcsize(
                specmmr, mode.species_density, mode.sigma_logr,
                mode.dgnum, mode.dgnumlo, mode.dgnumhi, num)
            if mode.species_hygro:
                hygro = mode.species_hygro
            else:
                # weakly-hygroscopic default (dust/BC-like); 0.5 here would
                # overstate water uptake and hence DGNUMWET/QAERWAT/AOD
                import warnings
                warnings.warn(
                    f"aerosol mode '{mode.name}' has no species_hygro; "
                    "defaulting hygroscopicity to 0.1 per species",
                    stacklevel=2)
                hygro = (0.1,) * len(specmmr)
            wu = modal_aero_wateruptake(
                specmmr, mode.species_density, hygro, mode.sigma_logr,
                dgnum, naer, rh, mode.rhcrystal, mode.rhdeliques)
            dg_dry.append(dgnum)
            dg_wet.append(wu["dgnumwet"])
            qw.append(wu["qaerwat"])
            wdens.append(wu["wetdens"])
            naer_m.append(naer)
        dgnumwet_m = jnp.stack(dg_wet, axis=-1)
        qaerwat_m = jnp.stack(qw, axis=-1)
        pbuf = pbuf.update(DGNUMDRY=jnp.stack(dg_dry, axis=-1),
                           DGNUMWET=dgnumwet_m, QAERWAT=qaerwat_m,
                           WETDENS_AP=jnp.stack(wdens, axis=-1),
                           NAER=jnp.stack(naer_m, axis=-1))
        sw_tot, lw_tau, aero_diags = modal_aero_optics_all(
            modes, specmmr_by_mode, dgnumwet_m, qaerwat_m, mass)
        diags.update(aero_diags)
        diags["AER_TAU_SW"] = sw_tot["tau"]
        diags["AER_TAU_LW"] = lw_tau

    # ---- export to surface models (physpkg.F90:2933-2940) ----
    cam_out = cam_export(state, prec_dp, snow_dp)

    return PhysRunOut(state=state, pbuf=pbuf, tend=tend, cam_out=cam_out,
                      diagnostics=diags)


def tphysac(phys_cfg: PhysConfig, registry: ConstituentRegistry,
            state: PhysicsState, pbuf: PhysicsBuffer, cam_in: CamIn,
            ztodt: float) -> PhysRunOut:
    """Post-coupler physics (tphysac, physpkg.F90:1342-2506)."""
    ncol, pver, pcnst = state.ncol, state.pver, state.pcnst
    dtype = state.t.dtype
    diags = {}
    tend = PhysicsTend.zeros(ncol, pver, dtype)

    # ---- qneg4 surface-flux limiter (physpkg.F90:1546-1649) ----
    cflx = qneg4(cam_in.cflx, state.q[:, -1, :],
                 state.pdel[:, -1:].repeat(pcnst, axis=-1), ztodt, c.GRAVIT)

    _snap(diags, phys_cfg, 'vertical_diffusion_before', state)
    # ---- implicit vertical diffusion + surface fluxes
    # (vertical_diffusion_tend, physpkg.F90:2144-2171) ----
    from .vertical_diffusion import vertical_diffusion_tend
    vd = vertical_diffusion_tend(state, cam_in.shf, cflx, cam_in.wsx,
                                 cam_in.wsy, pbuf.get("PBLH"), ztodt)
    # frictional heating closes the KE budget of the momentum mixing
    u1 = state.u + vd["dudt"] * ztodt
    v1 = state.v + vd["dvdt"] * ztodt
    dke = 0.5 * ((u1 ** 2 + v1 ** 2) - (state.u ** 2 + state.v ** 2))
    lq = tuple(True for _ in range(pcnst))
    ptend = ptend_init("vertical_diffusion", ncol, pver, pcnst, ls=True,
                       lu=True, lv=True, lq=lq, dtype=dtype)
    ptend = ptend.replace(
        s=vd["dsdt"] - dke / ztodt,
        u=vd["dudt"], v=vd["dvdt"], q=vd["dqdt"])
    state, tend = physics_update(state, ptend, ztodt, registry, tend)
    state, _ = check_energy_chng(state, registry, ztodt,
                                 flx_vap=cflx[:, 0], flx_sen=cam_in.shf)
    diags["KVH"] = vd["kvh"]

    _snap(diags, phys_cfg, 'vertical_diffusion_after', state, ptend=ptend)
    # ---- macro/micro substep loop (physpkg.F90:1719-1915) ----
    # the macrophysics slot's cloud-fraction product: diagnostic Sundqvist
    # + convective fraction into the CLD pbuf field (cldfrc role)
    from .cloud_fraction import cldfrc
    pbuf = pbuf.set("CLD", cldfrc(state, pbuf.get("CMFMC_DP")))

    _snap(diags, phys_cfg, 'macmic_before', state)
    n_sub = phys_cfg.cld_macmic_num_steps
    for _ in range(n_sub):
        # clubb_tend_cam slot: PBL turbulence + shallow convection +
        # macrophysics (physpkg.F90:1736) — STUB
        ptend = _stub_ptend("clubb", state)
        state, tend = physics_update(state, ptend, ztodt / n_sub,
                                     registry, tend)
        # microp_driver_tend slot: MG/PUMAS stratiform microphysics
        # (physpkg.F90:1813-1906) — STUB
        ptend = _stub_ptend("microp", state)
        state, tend = physics_update(state, ptend, ztodt / n_sub,
                                     registry, tend)

    _snap(diags, phys_cfg, 'macmic_after', state, ptend=ptend)
    # ---- aerosol wet deposition slot (physpkg.F90:1936-1960) — STUB ----
    ptend = _stub_ptend("wetdep", state)
    state, tend = physics_update(state, ptend, ztodt, registry, tend)

    _snap(diags, phys_cfg, 'convect_deep_2_before', state)
    # ---- convective tracer transport pass 2 (physpkg.F90:1988) ----
    ptend = zm_conv_tend_2(registry, state, pbuf, ztodt)
    # pre-clip prediction for the clipping-tendency diagnostics
    # (diag_clip_tend_writeout, cam_diagnostics.F90:1975-2018): the
    # difference between the raw q + ptend·dt prediction and the
    # qmin-clamped result of physics_update
    q_preclip = state.q + ptend.q * ztodt
    state, tend = physics_update(state, ptend, ztodt, registry, tend)
    _snap(diags, phys_cfg, 'convect_deep_2_after', state, ptend=ptend)
    from .cam_diagnostics import diag_clip_tend_writeout, diag_conv
    diags.update(diag_clip_tend_writeout(
        q_preclip, state.q, ztodt, 0, registry.index("CLDLIQ"),
        registry.index("CLDICE")))

    # ---- moist-process budget family (diag_conv, physpkg.F90:2006):
    # difference against the pre-moist snapshot tphysbc stored in pbuf ----
    diags.update(diag_conv(
        state, {"T_ini": pbuf.get("DTCOND_TINI"),
                "Q_ini": pbuf.get("DQCOND_QINI")}, ztodt,
        cnst_names=registry.names))

    _snap(diags, phys_cfg, 'radiation_before', state)
    # ---- radiation slot (physpkg.F90:2030-2051) ----
    if phys_cfg.radiation_scheme == "gray":
        # working gray two-stream radiation (see radiation.py); "rrtmg"
        # remains the unported-stub branch awaiting a spectral port
        from .radiation import radiation_tend
        rad = radiation_tend(state, cam_in)
        ptend = ptend_init("radheat", ncol, pver, pcnst, ls=True,
                           dtype=dtype)
        ptend = ptend.replace(s=rad["qrl"] + rad["qrs"])
        state, tend = physics_update(state, ptend, ztodt, registry, tend)
        # the column's radiative gain: SW absorbed in air + net LW gain
        state, _ = check_energy_chng(
            state, registry, ztodt,
            flx_sen=(rad["FSNT"] - rad["FSNS"]) +
                    (rad["FLNS"] - rad["FLNT"]))
        for k in ("FSNT", "FLNT", "FSNS", "FLNS", "FLWDS"):
            diags[k] = rad[k]
        diags["QRL"] = rad["qrl"] / c.CPAIR
        diags["QRS"] = rad["qrs"] / c.CPAIR
    else:
        ptend = _stub_ptend("radheat", state)
        state, tend = physics_update(state, ptend, ztodt, registry, tend)
    _snap(diags, phys_cfg, 'radiation_after', state, ptend=ptend)

    # ---- Rayleigh friction (physpkg.F90:2177-2185) ----
    if phys_cfg.raytau0 > 0.0:
        _snap(diags, phys_cfg, 'rayleigh_before', state)
        from .rayleigh_friction import rayleigh_friction_tend
        dudt, dvdt, dsdt = rayleigh_friction_tend(
            state, ztodt, phys_cfg.rayk0, phys_cfg.raykrange,
            phys_cfg.raytau0)
        ptend = ptend_init("rayleigh_friction", ncol, pver, pcnst, ls=True,
                           lu=True, lv=True, dtype=dtype)
        ptend = ptend.replace(u=dudt, v=dvdt, s=dsdt)
        state, tend = physics_update(state, ptend, ztodt, registry, tend)
        state, _ = check_energy_chng(state, registry, ztodt)
        _snap(diags, phys_cfg, 'rayleigh_after', state, ptend=ptend)

    _snap(diags, phys_cfg, 'dme_adjust_before', state)
    # ---- dry-mass / energy adjustment (physpkg.F90:2394-2452) ----
    # FV is a moist dycore: convert dry-basis tracers back to wet, then
    # adjust layer masses for the vapor change since step start (THT variant)
    state = set_dry_to_wet(state, registry)
    qini = pbuf.get("QINI")
    t_pre_dme = state.t
    state = physics_dme_adjust(state, qini, registry, variant="tht")
    # dme-adjust T tendency + column internal-energy tendency
    # (PTTEND_DME / IETEND_DME, cam_diagnostics.F90:288-291)
    diags["PTTEND_DME"] = (state.t - t_pre_dme) / ztodt
    diags["IETEND_DME"] = jnp.sum(
        c.CPAIR * (state.t - t_pre_dme) * state.pdel,
        axis=-1) / (c.GRAVIT * ztodt)

    _snap(diags, phys_cfg, 'dme_adjust_after', state)
    # pbuf physics variables on IC tapes (diag_physvar_ic,
    # cam_diagnostics.F90:2368-2500)
    from .cam_diagnostics import diag_physvar_ic
    diags.update(diag_physvar_ic(pbuf))
    # ---- save teout for next step's energy fixer (physpkg.F90:2394) ----
    te, _ = column_energy(state, registry)
    pbuf = pbuf.update(
        TEOUT=te, TEOUT_VALID=jnp.ones((1,), dtype),
        # store end-of-physics state for next step's dynamics-tendency
        # diagnostics (physpkg.F90:2470-2477)
        DTCORE=state.t, DQCORE=state.q[:, :, 0],
        DUCORE=state.u, DVCORE=state.v)

    cam_out = cam_export(state, pbuf.get("PREC_DP"), pbuf.get("SNOW_DP"))
    if "FLWDS" in diags:
        # route the radiation surface fluxes to the coupler (cam_export's
        # netsw/flwds payload; consumed by e.g. the slab ocean)
        cam_out = cam_out.replace(netsw=diags["FSNS"], flwds=diags["FLWDS"])
    return PhysRunOut(state=state, pbuf=pbuf, tend=tend, cam_out=cam_out,
                      diagnostics=diags)


def phys_run1(phys_cfg: PhysConfig, zm_cfg: ZMConfig,
              registry: ConstituentRegistry, state: PhysicsState,
              pbuf: PhysicsBuffer, cam_in: CamIn, ztodt: float,
              nstep: int = 1) -> PhysRunOut:
    """Pre-coupler driver (phys_run1, physpkg.F90:1057-1173): the reference's
    per-chunk OMP loop over tphysbc is one batched call here. Emits the
    global-mean energy (check_energy_gmean, :1115) into the diagnostics."""
    out = tphysbc(phys_cfg, zm_cfg, registry, state, pbuf, cam_in, ztodt,
                  nstep)
    out.diagnostics["TEGMEAN"] = check_energy_gmean(out.state, registry)
    return out


def phys_run2(phys_cfg: PhysConfig, registry: ConstituentRegistry,
              state: PhysicsState, pbuf: PhysicsBuffer, cam_in: CamIn,
              ztodt: float) -> PhysRunOut:
    """Post-coupler driver (phys_run2, physpkg.F90:1179-1293)."""
    return tphysac(phys_cfg, registry, state, pbuf, cam_in, ztodt)
