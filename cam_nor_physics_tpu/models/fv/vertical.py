"""Hybrid vertical coordinate (hycoef equivalent).

The reference obtains ak/bk from the IC/restart file ("ak, bk, now read from
restart", /root/reference/fv/dynamics_vars.F90:11) via the upstream `hycoef`
module (contract at /root/reference/fv/ctem.F90:36, grid%ak/bk at
dynamics_vars.F90:240-241). Here: explicit arrays can be supplied (e.g. read
from a CAM IC netCDF), or a standard smooth hybrid set is generated
analytically — pure pressure near the top, terrain-following near the surface,
with the usual p(k) = ak + bk * ps form (ps0-scaled).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np


@dataclass(frozen=True)
class HybridCoord:
    """Hybrid ak/bk set. Registered as a JAX pytree (ak/bk are leaves) so
    hot jits can take the coordinate as an argument — embedded array
    constants disable the axon runtime's fast execution path (FVGrid note).
    `ptop`/`ps0` are static aux scalars usable under tracing."""

    ak: np.ndarray       # (km+1,) Pa
    bk: np.ndarray       # (km+1,) dimensionless
    ps0: float = 1.0e5
    ptop: float = None   # snapshot of ak[0]; set at construction

    def __post_init__(self):
        if self.ptop is None:
            object.__setattr__(self, "ptop", float(np.asarray(self.ak)[0]))
        if isinstance(self.ak, np.ndarray):
            import jax.numpy as jnp
            object.__setattr__(self, "ak", jnp.asarray(self.ak))
            object.__setattr__(self, "bk", jnp.asarray(self.bk))

    @property
    def km(self) -> int:
        return self.ak.shape[0] - 1

    def pint(self, ps):
        """Interface pressures (..., km+1) from surface pressure (...,)."""
        return self.ak + self.bk * ps[..., None]

    def pdel(self, ps):
        p = self.pint(ps)
        return p[..., 1:] - p[..., :-1]


def hybrid_coefficients(km: int, ptop: float = 219.4, ps0: float = 1.0e5,
                        p_sigma_switch: float = 0.18) -> HybridCoord:
    """Generate a smooth CAM-like hybrid set.

    Interfaces follow a stretched profile eta(k) = (k/km)^1.6 mapped so
    eta(0) = ptop/ps0; above `p_sigma_switch` (in eta units) the coordinate is
    pure pressure (bk=0), transitioning smoothly to near-sigma at the surface
    with bk(1) = 1 (so pint(surface) == ps exactly).
    """
    k = np.arange(km + 1, dtype=np.float64) / km
    etat = ptop / ps0
    eta = etat + (1.0 - etat) * k ** 1.6
    bk = np.where(eta > p_sigma_switch,
                  ((eta - p_sigma_switch) / (1.0 - p_sigma_switch)) ** 2,
                  0.0)
    bk[-1] = 1.0
    ak = (eta - bk) * ps0
    ak[0] = etat * ps0
    ak[-1] = 0.0
    return HybridCoord(ak=ak, bk=bk, ps0=ps0)


def sigma_coefficients(km: int, ptop: float = 100.0, ps0: float = 1.0e5
                       ) -> HybridCoord:
    """Pure sigma-like hybrid (Held-Suarez style): evenly spaced in sigma."""
    k = np.arange(km + 1, dtype=np.float64) / km
    bk = k
    ak = ptop * (1.0 - k)
    return HybridCoord(ak=ak, bk=bk, ps0=ps0)


def _register_hybridcoord_pytree() -> None:
    def flatten(h):
        return (h.ak, h.bk), (h.ps0, h.ptop)

    def unflatten(aux, children):
        return HybridCoord(ak=children[0], bk=children[1],
                           ps0=aux[0], ptop=aux[1])

    jax.tree_util.register_pytree_node(HybridCoord, flatten, unflatten)


_register_hybridcoord_pytree()
