"""FV dycore grid geometry — grid_vars_init equivalent.

TPU-native re-implementation of the geometry/trig-table layer of
/root/reference/fv/dynamics_vars.F90:729-983 (grid_vars_init). The MPI
decomposition machinery of spmd_vars_init (dynamics_vars.F90:317-723) is
intentionally absent: on TPU one resident `jax.sharding` layout serves the
whole step (SURVEY §7.1.1), so the ~20 decompositions / ghost patterns /
transpose patterns have no equivalent here.

Grid staggering (Arakawa D grid, lat-lon):
  - jm latitude rows, j=0 south pole row, j=jm-1 north pole row; rows are
    cell centers except the pole rows which are the polar caps.
  - cosp/sinp at cell centers (area-averaged discretizations), cose/sine at
    cell edges (edge j = south edge of row j).
  - im longitudes, periodic; cell i center at λ = -π + i·dl.

All tables are numpy float64 computed eagerly at construction (static grid
metadata, traced into jit as constants).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import constants as c


@dataclass(frozen=True)
class FVGrid:
    """FV grid tables.

    Registered as a JAX PYTREE (see register below): the table fields are
    leaves, the shape/spacing scalars are static aux data. Hot-path jits
    must take the grid as an ARGUMENT, not close over it — under the axon
    TPU runtime, ANY array constant embedded in an executable disables its
    fast repeat-execution path (~1 ms/call on a medium graph, ~5 ms on
    dyn/zm-sized ones; measured, see tools/find_constants.py). make_grid
    returns device (jnp) leaves so repeated calls transfer nothing.
    """

    im: int
    jm: int
    km: int
    dl: float            # longitude spacing (rad)
    dp: float            # latitude spacing (rad)
    # trig tables (jm,)
    cosp: np.ndarray
    sinp: np.ndarray
    cose: np.ndarray
    sine: np.ndarray
    acosp: np.ndarray
    acosu: np.ndarray
    # longitude tables (im,)
    coslon: np.ndarray
    sinlon: np.ndarray
    cosl5: np.ndarray
    sinl5: np.ndarray
    # polar cap
    acap: float
    rcap: float
    # Coriolis (jm,)
    f0: np.ndarray       # at cell centers
    fc: np.ndarray       # at cell corners/edges
    # polar filter
    ycrit_deg: float
    pft_center: np.ndarray   # (jm, im//2+1) rfft damping factors, centers
    pft_edge: np.ndarray     # (jm, im//2+1) damping factors, edges
    # coordinate tables
    lats: np.ndarray = None  # (jm,) cell-center latitudes (rad)
    lons: np.ndarray = None  # (im,) cell-center longitudes (rad)
    # real-DFT factor matrices for the in-kernel polar filter
    # (models/fv/cd_pallas.py): filtered = ((A@fc)*r)@gc + ((A@fs)*r)@gs
    dft_fc: np.ndarray = None  # (im, im//2+1) cos(2*pi*i*m/im)
    dft_fs: np.ndarray = None  # (im, im//2+1) sin
    dft_gc: np.ndarray = None  # (im//2+1, im) w_m cos / im
    dft_gs: np.ndarray = None  # (im//2+1, im) w_m sin / im
    # scalars
    rdy: float = 0.0

    # Circulant-matmul forms of the polar filter, memoized per grid so every
    # trace of cd_step shares one host constant per (response, dtype) rather
    # than materializing a fresh (jm, im, im) array at each of the several
    # filter sites (an 8 MB f32 constant at 144x96 — rebuilding it per site
    # measurably slows tracing/compilation).
    def circ_center(self, dtype=np.float32) -> np.ndarray:
        return self._circ_memo("center", np.dtype(dtype))

    def circ_edge(self, dtype=np.float32) -> np.ndarray:
        return self._circ_memo("edge", np.dtype(dtype))

    def _circ_memo(self, which: str, dtype: np.dtype) -> np.ndarray:
        cache = self.__dict__.setdefault("_circ_cache", {})
        key = (which, dtype)
        if key not in cache:
            resp = self.pft_center if which == "center" else self.pft_edge
            if isinstance(resp, jax.core.Tracer):
                raise TypeError(
                    "circ_center/circ_edge need a concrete grid (host "
                    "computation); the matmul polar-filter path cannot run "
                    "with a traced FVGrid — use filter_impl='fft'")
            cache[key] = circulant_filter_matrices(
                np.asarray(resp)).astype(dtype)
        return cache[key]


def _register_fvgrid_pytree() -> None:
    """Leaves = array tables; aux = shape/spacing scalars (static)."""
    data = ("cosp", "sinp", "cose", "sine", "acosp", "acosu",
            "coslon", "sinlon", "cosl5", "sinl5", "f0", "fc",
            "pft_center", "pft_edge", "lats", "lons",
            "dft_fc", "dft_fs", "dft_gc", "dft_gs")
    meta = ("im", "jm", "km", "dl", "dp", "acap", "rcap", "ycrit_deg", "rdy")

    def flatten(g):
        return tuple(getattr(g, f) for f in data), \
            tuple(getattr(g, f) for f in meta)

    def unflatten(aux, children):
        return FVGrid(**dict(zip(meta, aux)), **dict(zip(data, children)))

    jax.tree_util.register_pytree_node(FVGrid, flatten, unflatten)


_register_fvgrid_pytree()


def make_grid(im: int, jm: int, km: int, am_geom_crrct: bool = False,
              ae: float = c.REARTH, om: float = c.OMEGA,
              ycrit_deg: float | None = None) -> FVGrid:
    """Build the FV grid tables (grid_vars_init, dynamics_vars.F90:729-983)."""
    if im % 2 != 0:
        raise ValueError("im must be even (dynamics_vars.F90:858)")
    dl = 2.0 * math.pi / im
    dp = math.pi / (jm - 1)

    j = np.arange(jm, dtype=np.float64)
    # sine(j) = sin of south edge of row j (edge values defined for j>=1)
    sine = np.zeros(jm + 1)
    ph5 = -0.5 * math.pi + (j - 0.5) * dp
    sine[:jm] = np.sin(ph5)            # sine[j] valid for j >= 1
    sine[jm] = np.sin(-0.5 * math.pi + (jm - 0.5) * dp)

    cosp = np.zeros(jm)
    cosp[1:jm - 1] = (sine[2:jm] - sine[1:jm - 1]) / dp

    cose = np.zeros(jm)
    if am_geom_crrct:
        cose[1:] = np.cos(ph5[1:])
    else:
        cose[2:] = 0.5 * (cosp[1:jm - 1] + cosp[2:jm])
        cose[1] = 0.5 * (cosp[0] + cosp[1])
    cose[0] = cose[1]

    acosu = np.zeros(jm)
    acosu[1:jm - 1] = 2.0 / (cose[1:jm - 1] + cose[2:jm])

    sinp = np.zeros(jm)
    sinp[0], sinp[-1] = -1.0, 1.0
    if am_geom_crrct:
        sinp[1:jm - 1] = (cose[1:jm - 1] - cose[2:jm]) / dp
    else:
        sinp[1:jm - 1] = 0.5 * (sine[1:jm - 1] + sine[2:jm])

    acap = im * (1.0 + sine[1]) / dp
    rcap = 1.0 / acap

    acosp = np.empty(jm)
    acosp[0] = acosp[-1] = rcap * im
    acosp[1:jm - 1] = 1.0 / cosp[1:jm - 1]

    i = np.arange(im // 2, dtype=np.float64)
    zam5 = (i - 0.5) * dl
    zamda = i * dl
    cosl5 = np.concatenate([np.cos(zam5), -np.cos(zam5)])
    sinl5 = np.concatenate([np.sin(zam5), -np.sin(zam5)])
    coslon = np.concatenate([np.cos(zamda), -np.cos(zamda)])
    sinlon = np.concatenate([np.sin(zamda), -np.sin(zamda)])

    f0 = 2.0 * om * sinp
    fc = np.zeros(jm)
    if am_geom_crrct:
        fc[1:] = 2.0 * om * sine[1:jm]
    else:
        fc[1:] = 0.5 * (f0[1:] + f0[:-1])
    fc[0] = fc[1]

    # polar filter: ycrit from grid aspect ratio (dynamics_vars.F90:924-927)
    rat = im / (2.0 * (jm - 1.0))
    ycrit = math.acos(min(0.81, rat)) * 180.0 / math.pi
    if ycrit_deg is not None:
        # explicit override (fft_flt/ycrit tuning role): smaller ycrit ⇒
        # stronger, wider filtering; used to trade polar-filter strength
        # against the small-step count (see FVConfig.nsplit notes)
        ycrit = ycrit_deg
    pftc = _pft_coefficients(im, cosp, ycrit, pole_rows_exempt=True)
    pfte = _pft_coefficients(im, cose, ycrit, pole_rows_exempt=False)

    # real-DFT factor matrices for the fused-cd in-kernel polar filter
    mm = np.arange(im // 2 + 1, dtype=np.float64)
    ang = 2.0 * math.pi * np.outer(np.arange(im, dtype=np.float64), mm) / im
    wgt = np.where((mm == 0) | (mm == im // 2), 1.0, 2.0)
    dft_fc = np.cos(ang)
    dft_fs = np.sin(ang)
    dft_gc = (wgt[:, None] * np.cos(ang).T) / im
    dft_gs = (wgt[:, None] * np.sin(ang).T) / im

    dev = jnp.asarray   # device-resident leaves (see FVGrid docstring)
    return FVGrid(im=im, jm=jm, km=km, dl=dl, dp=dp, cosp=dev(cosp),
                  sinp=dev(sinp), cose=dev(cose), sine=dev(sine[:jm]),
                  acosp=dev(acosp), acosu=dev(acosu), coslon=dev(coslon),
                  sinlon=dev(sinlon), cosl5=dev(cosl5), sinl5=dev(sinl5),
                  acap=acap, rcap=rcap, f0=dev(f0), fc=dev(fc),
                  ycrit_deg=ycrit, pft_center=dev(pftc), pft_edge=dev(pfte),
                  lats=dev(np.linspace(-0.5 * math.pi, 0.5 * math.pi, jm)),
                  lons=dev(-math.pi + dl * np.arange(im)),
                  dft_fc=dev(dft_fc), dft_fs=dev(dft_fs),
                  dft_gc=dev(dft_gc), dft_gs=dev(dft_gs),
                  rdy=1.0 / (ae * dp))


def _pft_coefficients(im: int, coslat: np.ndarray, ycrit_deg: float,
                      pole_rows_exempt: bool = True) -> np.ndarray:
    """FFT polar-filter response per (row, zonal wavenumber).

    Equivalent role to upstream pft_cf (contract at dynamics_vars.F90:928-938):
    poleward of ycrit, zonal modes whose effective wavelength is shorter than
    the critical resolved scale are damped so the effective Δx never drops
    below Δx at the critical latitude:
        R(m, φ) = min[1, (cos φ / (cos φc · sin(π m / im)))²]
    Rows equatorward of ycrit get R = 1 (no filtering).
    """
    jm = coslat.shape[0]
    coszc = math.cos(ycrit_deg * math.pi / 180.0)
    m = np.arange(im // 2 + 1, dtype=np.float64)
    s = np.sin(math.pi * m / im)           # s[0] = 0 (mean mode, untouched)
    resp = np.ones((jm, im // 2 + 1))
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = coslat[:, None] / (coszc * np.where(s > 0, s, np.inf)[None, :])
    resp = np.minimum(1.0, ratio ** 2)
    resp[:, 0] = 1.0                        # never damp the zonal mean
    need = coslat < coszc
    resp = np.where(need[:, None], resp, 1.0)
    if pole_rows_exempt:
        # center pole rows are cap means with no zonal structure; exempting
        # them avoids 0/0 from cosp=0. Edge arrays must NOT be exempted: the
        # first/last edge rows sit at ~±(90°-dp/2) and need the strongest
        # filtering (the cd_core polar instability lives exactly there).
        resp[0, :] = 1.0
        resp[-1, :] = 1.0
    return resp


def polar_filter(field, resp):
    """Apply the FFT polar filter along x: field (..., jm, im), resp
    (jm, im//2+1). The damping acts on rfft amplitudes row by row."""
    spec = jnp.fft.rfft(field, axis=-1)
    return jnp.fft.irfft(spec * resp, n=field.shape[-1], axis=-1)


def circulant_filter_matrices(resp: np.ndarray) -> np.ndarray:
    """Materialize the polar filter as per-row circulant matrices (jm, im, im).

    Spectral damping by a real response is exactly circular convolution with
    the kernel h = irfft(resp); M[j, i, m] = h[j, (i-m) mod im]. This form
    runs the filter on the MXU as a batched matmul and sidesteps FFT-layout
    restrictions under SPMD partitioning. Rows with resp==1 yield identity
    rows (the matmul is still exact there).
    """
    im = 2 * (resp.shape[1] - 1)
    h = np.fft.irfft(resp, im, axis=1)              # (jm, im)
    i = np.arange(im)
    idx = (i[:, None] - i[None, :]) % im            # (im, im)
    return h[:, idx]


def polar_filter_matmul(field, circ):
    """Circulant-matmul polar filter: field (..., jm, im), circ (jm, im, im).
    Identical (to roundoff) to `polar_filter` with the generating resp."""
    return jnp.einsum('jim,...jm->...ji', circ, field)


def ffsl_flags(grid: FVGrid, crx, cosa=None):
    """Rows where flux-form semi-Lagrangian (integer-CFL) x-transport is
    needed: |c| > 1 anywhere in the row (cd_core's ffsl determination).
    crx: (..., jm, im). Returns boolean (..., jm)."""
    return jnp.max(jnp.abs(crx), axis=-1) > 1.0
