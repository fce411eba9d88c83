"""Gray-atmosphere radiation — a working radiation_tend for the radheat slot.

The reference's radiation is upstream RRTMG (called at
/root/reference/physics/physpkg.F90:2030-2051) and is not shadowed in the
reference repo; its slot here accepts either the stub ("rrtmg", awaiting a
port) or this gray two-stream scheme ("gray", Frierson et al. 2006): a
complete, energetically consistent LW+SW treatment that closes the GCM loop
(solar heating in, IR cooling out, surface fluxes to cam_out).

LW: gray gas with prescribed optical-depth profile
  τ(φ, σ) = [τ_e + (τ_p − τ_e) sin²φ] · [f σ + (1−f) σ⁴]
two-stream without scattering, D (down) and U (up) marched with lax.scan
over the on-chip level axis (linear-in-τ emission per layer).
SW: collimated beam, absorptivity ∝ water-vapor path; remainder deposited at
the surface with albedo. Optional aerosol LW absorption from modal optics
adds to the gray optical depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import constants as c

SB = 5.670374419e-8       # Stefan-Boltzmann
S0 = 1360.0               # solar constant (W/m2)
TAU_EQ = 4.0              # LW optical depth at the equator (chosen so the
                          # fixed-SST aquaplanet equilibrates inside the
                          # physics' valid range; 6.0 runs away hot)
TAU_POLE = 1.5            # at the poles
F_LIN = 0.1               # linear fraction of the tau profile
SW_TAU_REF = 0.12         # SW absorption optical depth scale (moist column)
ALBEDO = 0.27


def lw_gray_fluxes(t, ts, tau_int):
    """Two-stream gray LW. t: (ncol, pver) layer temperatures; ts: (ncol,)
    surface temperature; tau_int: (ncol, pver+1) optical depth at interfaces
    (0 at TOA, increasing downward). Returns (up, dn) at interfaces."""
    ncol, pver = t.shape
    dtau = tau_int[:, 1:] - tau_int[:, :-1]           # (ncol, pver)
    emis = 1.0 - jnp.exp(-dtau)
    b = SB * t ** 4

    # downward march from TOA (D=0)
    def dstep(d, x):
        emis_k, b_k = x
        d_new = d * (1.0 - emis_k) + b_k * emis_k
        return d_new, d_new

    _, dn_below = jax.lax.scan(dstep, jnp.zeros((ncol,), t.dtype),
                               (emis.T, b.T))
    dn = jnp.concatenate([jnp.zeros((ncol, 1), t.dtype), dn_below.T], axis=1)

    # upward march from the surface (U = σTs⁴)
    def ustep(u, x):
        emis_k, b_k = x
        u_new = u * (1.0 - emis_k) + b_k * emis_k
        return u_new, u_new

    u_sfc = SB * ts ** 4
    _, up_above = jax.lax.scan(ustep, u_sfc, (emis.T[::-1], b.T[::-1]))
    up = jnp.concatenate([up_above.T[:, ::-1], u_sfc[:, None]], axis=1)
    return up, dn


def radiation_tend(state, cam_in, coszrs=None, aero_lw_tau=None):
    """Gray radiation heating + boundary fluxes (radiation_tend contract).

    coszrs: (ncol,) cosine solar zenith (default: daily-mean-like
    max(cos(lat)·0.25·π/2-ish) — computed from state.lat when absent).
    aero_lw_tau: optional (ncol, pver) aerosol LW absorption tau to add.
    Returns dict(qrl, qrs (J/kg/s via cp·K/s), net TOA/surface fluxes).
    """
    ncol, pver = state.t.shape
    lat = state.lat
    if coszrs is None:
        # annual-mean insolation: S(φ) = (S0/4)(1 − Δs·P2(sinφ)) with
        # Δs = 0.477 (the standard annual-mean fit) — globally balanced
        # against an OLR of ~240 W/m2 (an unbalanced factor warms the
        # aquaplanet ~1.7 K/day and eventually blows up convection)
        p2 = 0.5 * (3.0 * jnp.sin(lat) ** 2 - 1.0)
        coszrs = jnp.maximum(0.25 * (1.0 - 0.477 * p2), 0.0)

    # ---- LW ----
    sigma = state.pmid / state.ps[:, None]
    tau_inf = TAU_EQ + (TAU_POLE - TAU_EQ) * jnp.sin(lat[:, None]) ** 2
    sig_int = state.pint / state.ps[:, None]
    tau_int = tau_inf * (F_LIN * sig_int + (1.0 - F_LIN) * sig_int ** 4)
    if aero_lw_tau is not None:
        tau_int = tau_int.at[:, 1:].add(jnp.cumsum(aero_lw_tau, axis=1))
    up, dn = lw_gray_fluxes(state.t, cam_in.ts, tau_int)
    net_lw = up - dn                                   # positive upward
    # layer heating = net upward flux entering at the lower interface minus
    # leaving at the upper one
    qrl = c.GRAVIT * (net_lw[:, 1:] - net_lw[:, :-1]) * state.rpdel

    # ---- SW ----
    s_toa = S0 * coszrs
    wvp = jnp.cumsum(state.q[:, :, 0] * state.pdel, axis=1) / c.GRAVIT
    trans = jnp.exp(-SW_TAU_REF * jnp.sqrt(jnp.maximum(wvp, 0.0) / 25.0))
    trans_int = jnp.concatenate(
        [jnp.ones((ncol, 1), state.t.dtype), trans], axis=1)
    sw_dn = s_toa[:, None] * trans_int                 # (ncol, pver+1)
    qrs = c.GRAVIT * (sw_dn[:, :-1] - sw_dn[:, 1:]) * state.rpdel
    sw_sfc = sw_dn[:, -1] * (1.0 - ALBEDO)

    fsnt = s_toa - sw_dn[:, -1] * ALBEDO               # net SW at TOA (abs.)
    flnt = net_lw[:, 0]                                # outgoing LW at TOA
    return dict(
        qrl=qrl, qrs=qrs,
        net_flx=fsnt - flnt,
        FSNT=fsnt, FLNT=flnt, FSNS=sw_sfc, FLNS=net_lw[:, -1],
        FLWDS=dn[:, -1], NETSW_SRF=sw_sfc)
