"""Two-moment convective microphysics for the ZM updraft — zm_microphysics
equivalent.

The reference's optional upstream module (`zm_mphy`, types
`zm_conv_t`/`zm_aero_t`; called from inside cldprp at
/root/reference/physics/zm_conv.F90:3826-3851 when `zmconv_microp`) is the
Song & Zhang (2011) scheme: two-moment cloud liquid/ice inside the steady
updraft plume — droplet activation, immersion + homogeneous freezing,
autoconversion/accretion to rain, ice-to-snow conversion — feeding back the
in-plume condensate (`ql = qliq + qice`, :3848), the freezing heating
(`frz`, scattered as latice/cp heating at :1521), the snow production `sprd`
(scaled alongside rprd, :1267-1268, 1313-1314), and the detrained
liquid/ice mass and number fluxes that drive the stratiform scheme (pbuf
DLFZM/DIFZM/DNLFZM/DNIFZM, /root/reference/physics/zm_conv_intr.F90:141-166).

TPU-native formulation: a single `lax.scan` up the plume (bottom -> top)
carrying the four condensate fluxes (mu*ql, mu*qi, mu*nl, mu*ni). The scheme
consumes the cldprp ql-budget's per-level condensate source (dlf + rprd from
the phase-blind budget) and re-routes it through the two-moment process
chain, so total condensate is conserved exactly:

    sum_k (dlf + dif + rain + snow)_k dp_k  ==  sum_k (dlf_old + rprd_old)_k dp_k

Process rates (per in-plume residence time dp/mu):
  * activation: new liquid brings number at an assumed activation radius;
    the activated-number cap comes from the modal aerosol state when an
    `aero` bundle is supplied (lognormal activated-fraction per mode — the
    zm_aero_t role, /root/reference/physics/zm_conv_intr.F90:1032-1410),
    else from the land/ocean contrast constants
  * immersion freezing: Bigg (1953) volume-dependent rate, as in
    Song & Zhang eq. (21)
  * contact/deposition ice nucleation: Cooper (1986) temperature-dependent
    crystal-number target, mass drawn from cloud liquid
  * homogeneous freezing: instantaneous below T_HOM = 233.15 K
  * autoconversion: Khairoutdinov & Kogan (2000) ql^2.47 Nc^-1.79
  * accretion of cloud liquid by the freshly formed rain:
    KK2000 67 (qc qr)^1.15
  * ice -> snow: threshold-relaxation conversion above qi0
  * detrainment: du-proportional removal of all four species; the plume
    top detrains the remainder (closure)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ...utils import constants as c

# --- scheme constants ---------------------------------------------------
T_HOM = 233.15            # homogeneous freezing threshold (K)
T_FREEZ = 273.15
R_ACT = 7.0e-6            # activation droplet radius (m)
R_ICE0 = 25.0e-6          # fresh ice crystal radius (m)
RHO_LIQ = 1000.0
RHO_ICE = 500.0
M_ACT = (4.0 / 3.0) * 3.14159265358979 * R_ACT ** 3 * RHO_LIQ
M_ICE0 = (4.0 / 3.0) * 3.14159265358979 * R_ICE0 ** 3 * RHO_ICE
BIMM = 100.0              # Bigg immersion-freezing rate coefficient (1/s)
AIMM = 0.66               # Bigg exponent (1/K)
KK_A = 1350.0             # KK2000 autoconversion prefactor
KK_ACC = 67.0             # KK2000 accretion prefactor (qc·qr)^1.15
QI0_SNOW = 1.0e-4         # ice threshold for snow conversion (kg/kg)
TAU_SNOW = 180.0          # ice->snow relaxation time (s)
NACT_LND = 4.0e8          # activated number per kg, land
NACT_OCN = 1.5e8          # activated number per kg, ocean
COOPER_A = 0.005e3        # Cooper (1986) crystal number: a·exp(b·dT) (1/m3)
COOPER_B = 0.304
NI_MAX = 1.0e8            # crystal-number cap (1/kg), ~Cooper at -35 C
D_ACT0 = 0.08e-6          # critical dry activation diameter at kappa=0.5 (m)


def activated_number(aero: dict, dtype=None):
    """Activated CCN number per kg from the modal aerosol state — the
    reduced Abdul-Razzak & Ghan role of zm_aero_init/activation
    (/root/reference/physics/zm_conv_intr.F90:1032-1410).

    aero: {"num": (ncol, pver, nmodes) 1/kg, "dgnum": wet median diameter
    (m), "hygro": per-mode hygroscopicity tuple}. Per lognormal mode the
    activated fraction is the tail above the kappa-scaled critical
    diameter d_c = D_ACT0·(0.5/kappa)^(1/3); sigma_g = 1.8 assumed."""
    num = aero["num"]
    dg = jnp.maximum(aero["dgnum"], 1.0e-10)
    hygro = jnp.asarray(aero["hygro"], num.dtype)
    ln_sig = jnp.log(1.8)
    d_crit = D_ACT0 * (0.5 / jnp.maximum(hygro, 1e-3)) ** (1.0 / 3.0)
    z = jnp.log(d_crit[None, None, :] / dg) / (jnp.sqrt(2.0) * ln_sig)
    frac = 0.5 * jax.scipy.special.erfc(z)
    return jnp.sum(num * frac, axis=-1)


@struct.dataclass
class ZMMicroOut:
    """Per-level updraft microphysics fields (zm_conv_t role)."""

    qliq: jnp.ndarray     # updraft cloud liquid mixing ratio (kg/kg)
    qice: jnp.ndarray     # updraft cloud ice
    qnl: jnp.ndarray      # updraft liquid number (1/kg)
    qni: jnp.ndarray      # updraft ice number
    dlf: jnp.ndarray      # detrained liquid tendency (kg/kg/s)
    dif: jnp.ndarray      # detrained ice tendency (kg/kg/s)
    dnlf: jnp.ndarray     # detrained liquid number tendency (1/kg/s)
    dnif: jnp.ndarray     # detrained ice number tendency (1/kg/s)
    rprd: jnp.ndarray     # rain production (kg/kg/s)
    sprd: jnp.ndarray     # snow production (kg/kg/s)
    frz: jnp.ndarray      # freezing heating rate (J/kg/s)


def zm_mphy(t, pmid, dp, mu, du, dlf_in, rprd_in, landfrac, jt, maxg,
            rho=None, aero: dict | None = None):
    """Two-moment updraft microphysics (zm_mphy contract,
    /root/reference/physics/zm_conv.F90:3826-3851).

    t, pmid: environment temperature (K) / pressure (Pa), (ncol, pver),
    level 0 = model top; dp: layer thickness (mb); mu: updraft mass flux
    (mb/s); du: detrainment rate (1/s); dlf_in/rprd_in: the phase-blind
    ql-budget's detrained-condensate and rain-production tendencies
    (kg/kg/s) whose sum is the per-level condensate source re-routed here;
    jt/maxg: int top/base levels; landfrac: (ncol,).

    Returns ZMMicroOut. Exact closure: column integrals of
    (dlf+dif+rprd+sprd)*dp match (dlf_in+rprd_in)*dp.
    """
    ncol, pver = t.shape
    dtype = t.dtype
    eps = jnp.asarray(1.0e-12, dtype)

    src = jnp.maximum(dlf_in + rprd_in, 0.0)          # condensate source
    rho = (pmid / (c.RAIR * t)) if rho is None else rho
    if aero is not None:
        # activated number from the modal aerosol state (zm_aero_t role)
        nact_2d = activated_number(aero)               # (ncol, pver)
    else:
        nact_2d = (NACT_LND * landfrac + NACT_OCN *
                   (1.0 - landfrac))[:, None] * jnp.ones_like(t)

    karr = jnp.arange(pver)
    in_plume = (karr[None, :] >= jt[:, None]) & (karr[None, :] <= maxg[:, None])

    def step(carry, xs):
        # fluxes through the interface below this level: mu * x (mb/s * unit)
        f_ql, f_qi, f_nl, f_ni = carry
        (t_k, dp_k, mu_k, du_k, src_k, rho_k, nact_k, inp_k, top_k) = xs

        mu_s = jnp.maximum(mu_k, eps)                  # mb/s
        tau = dp_k / mu_s                              # residence time (s)

        # 1. new condensate (flux units: kg/kg/s * mb): liquid unless
        #    colder than the homogeneous threshold
        new = src_k * dp_k
        is_liq = t_k > T_HOM
        new_l = jnp.where(is_liq, new, 0.0)
        new_i = new - new_l
        f_ql = f_ql + new_l
        f_qi = f_qi + new_i
        # activation / nucleation: new droplets at the activation radius,
        # number capped at the (land/ocean) activated-aerosol supply — the
        # zm_aero_t activation contrast
        f_nl = f_nl + new_l / M_ACT
        f_ni = f_ni + new_i / M_ICE0

        # in-plume mixing ratios (steady plume: flux / mass flux)
        ql_u = f_ql / mu_s
        qi_u = f_qi / mu_s
        nl_u = jnp.minimum(f_nl / mu_s, nact_k)
        ni_u = f_ni / mu_s

        # 2. immersion freezing, Bigg (1953): dq/dt = Bimm [exp(a dT)-1]
        #    * rho q^2 / (Nl rho_w)  (Song & Zhang 2011 eq. 21)
        dT = jnp.clip(T_FREEZ - t_k, 0.0, 40.0)
        frz_imm = BIMM * jnp.expm1(AIMM * dT) * rho_k * ql_u * ql_u / \
            jnp.maximum(nl_u * RHO_LIQ * M_ACT, eps) * M_ACT
        frz_imm = jnp.where(t_k < T_FREEZ, frz_imm, 0.0)
        dq_frz = jnp.minimum(ql_u, frz_imm * tau)
        # contact/deposition ice nucleation: Cooper (1986) crystal-number
        # target N = a·exp(b·dT)/rho (capped), mass drawn from cloud liquid
        # at the fresh-crystal size (the deposition/contact modes of the
        # upstream zm_mphy contract, zm_conv.F90:3826-3851)
        n_cooper = jnp.minimum(COOPER_A * jnp.exp(COOPER_B * dT) / rho_k,
                               NI_MAX)
        n_cooper = jnp.where(t_k < T_FREEZ, n_cooper, 0.0)
        dn_nuc = jnp.maximum(n_cooper - ni_u, 0.0)
        dq_nuc = jnp.minimum(jnp.maximum(ql_u - dq_frz, 0.0),
                             dn_nuc * M_ICE0)
        dn_nuc = dq_nuc / M_ICE0
        dq_frz = dq_frz + dq_nuc
        # homogeneous freezing below T_HOM: everything left freezes
        dq_frz = jnp.where(t_k <= T_HOM, ql_u, dq_frz)
        frac_frz = dq_frz / jnp.maximum(ql_u, eps)
        dn_l = jnp.minimum(nl_u * frac_frz, nl_u)    # droplets lost
        # crystals gained: frozen droplets, plus any extra
        # deposition-nucleated crystals beyond them
        dn_i = dn_l + jnp.maximum(dn_nuc - dn_l, 0.0)
        ql_u = ql_u - dq_frz
        qi_u = qi_u + dq_frz
        nl_u = nl_u - dn_l
        ni_u = ni_u + dn_i

        # 3. autoconversion to rain, KK2000: 1350 qc^2.47 Nc^-1.79 (Nc cm-3)
        nc_cm3 = jnp.maximum(nl_u * rho_k * 1.0e-6, 1.0)
        auto = KK_A * jnp.maximum(ql_u, 0.0) ** 2.47 * nc_cm3 ** (-1.79)
        dq_rain = jnp.minimum(ql_u, auto * tau)
        frac_rain = dq_rain / jnp.maximum(ql_u, eps)
        nl_u = nl_u * (1.0 - frac_rain)
        ql_u = ql_u - dq_rain
        # 3b. accretion of the remaining cloud liquid by this layer's fresh
        # rain, KK2000: 67 (qc qr)^1.15
        accr = KK_ACC * (jnp.maximum(ql_u, 0.0) *
                         jnp.maximum(dq_rain, 0.0)) ** 1.15
        dq_accr = jnp.minimum(ql_u, accr * tau)
        frac_accr = dq_accr / jnp.maximum(ql_u, eps)
        nl_u = nl_u * (1.0 - frac_accr)
        ql_u = ql_u - dq_accr
        dq_rain = dq_rain + dq_accr

        # 4. ice -> snow above the threshold
        conv = jnp.maximum(qi_u - QI0_SNOW, 0.0) / TAU_SNOW
        dq_snow = jnp.minimum(qi_u, conv * tau)
        frac_snow = dq_snow / jnp.maximum(qi_u, eps)
        ni_u = ni_u * (1.0 - frac_snow)
        qi_u = qi_u - dq_snow

        # back to flux units
        f_ql, f_qi = ql_u * mu_s, qi_u * mu_s
        f_nl, f_ni = nl_u * mu_s, ni_u * mu_s

        # 5. detrainment: du-proportional; the plume top sheds everything
        det = jnp.clip(du_k * dp_k / mu_s, 0.0, 1.0)
        det = jnp.where(top_k, 1.0, det)
        d_ql, d_qi = f_ql * det, f_qi * det
        d_nl, d_ni = f_nl * det, f_ni * det
        f_ql, f_qi = f_ql - d_ql, f_qi - d_qi
        f_nl, f_ni = f_nl - d_nl, f_ni - d_ni

        # outside the plume nothing happens and nothing is carried
        live = inp_k
        zero = jnp.zeros_like(f_ql)
        # frz: dq_frz is a mixing ratio (kg/kg) -> *mu_s to flux units;
        # new_i (homogeneous-at-formation) is ALREADY a flux (src_k*dp_k)
        outs = tuple(jnp.where(live, v / dp_k, 0.0)
                     for v in (d_ql, d_qi, d_nl, d_ni,
                               dq_rain * mu_s, dq_snow * mu_s,
                               dq_frz * mu_s + new_i))
        carry = tuple(jnp.where(live, v, zero)
                      for v in (f_ql, f_qi, f_nl, f_ni))
        diag = tuple(jnp.where(live, v, 0.0)
                     for v in (ql_u, qi_u, nl_u, ni_u))
        return carry, (outs, diag)

    # scan bottom (pver-1) -> top (0)
    rev = lambda a: jnp.flip(a.T, axis=0)              # (pver, ncol)
    xs = (rev(t), rev(dp), rev(mu), rev(du), rev(src), rev(rho),
          rev(nact_2d), rev(in_plume),
          jnp.flip((karr[None, :] == jt[:, None]).T, axis=0))
    zero = jnp.zeros((ncol,), dtype)
    (_, _, _, _), (outs, diag) = jax.lax.scan(
        step, (zero, zero, zero, zero), xs)

    unrev = lambda a: jnp.flip(a, axis=0).T            # back to (ncol, pver)
    dlf, dif, dnlf, dnif, rain, snow, frzm = (unrev(o) for o in outs)
    qliq, qice, qnl, qni = (unrev(d) for d in diag)

    return ZMMicroOut(
        qliq=qliq, qice=qice, qnl=qnl, qni=qni,
        dlf=dlf, dif=dif, dnlf=dnlf, dnif=dnif,
        rprd=rain, sprd=snow,
        frz=c.LATICE * frzm)
