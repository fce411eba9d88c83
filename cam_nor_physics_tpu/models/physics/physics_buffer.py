"""Physics buffer — named, lifetime-tagged field store (pbuf equivalent).

Equivalent of the upstream `physics_buffer` used ~30x in the reference (e.g.
/root/reference/physics/zm_conv_intr.F90:101-172): parameterizations share
named fields with 'global' (persists across steps; part of the restart
payload, SURVEY §5.4) or 'physpkg' (scratch within one physics step) lifetime.

Here the buffer is an immutable pytree (dict of arrays) wrapped with lifetime
metadata; `global_fields()` extracts the restart payload. Registration happens
eagerly (fields are zero-initialized arrays), so the buffer is jit-traceable.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PhysicsBuffer:
    fields: dict                                   # name -> array
    lifetimes: dict = struct.field(pytree_node=False, default_factory=dict)

    def get(self, name: str):
        return self.fields[name]

    def has(self, name: str) -> bool:
        return name in self.fields

    def set(self, name: str, value) -> "PhysicsBuffer":
        if name not in self.fields:
            raise KeyError(f"pbuf field {name!r} not registered")
        new = dict(self.fields)
        new[name] = value
        return self.replace(fields=new)

    def update(self, **kv) -> "PhysicsBuffer":
        out = self
        for k, v in kv.items():
            out = out.set(k, v)
        return out

    def global_fields(self) -> dict:
        """The persistent ('global') subset — the restart payload."""
        return {k: v for k, v in self.fields.items()
                if self.lifetimes.get(k) == "global"}

    def reset_physpkg(self) -> "PhysicsBuffer":
        """Zero the per-step ('physpkg') fields at step start."""
        new = {k: (jnp.zeros_like(v) if self.lifetimes.get(k) == "physpkg"
                   else v) for k, v in self.fields.items()}
        return self.replace(fields=new)


def pbuf_register(specs: Mapping[str, tuple], dtype=jnp.float64
                  ) -> PhysicsBuffer:
    """Build a buffer from {name: (shape, lifetime)} specs
    (pbuf_add_field equivalent)."""
    fields = {}
    lifetimes = {}
    for name, (shape, lifetime) in specs.items():
        fields[name] = jnp.zeros(shape, dtype)
        lifetimes[name] = lifetime
    return PhysicsBuffer(fields=fields, lifetimes=lifetimes)


def zm_pbuf_specs(ncol: int, pver: int) -> dict:
    """The ZM pbuf registration set (zm_conv_register,
    /root/reference/physics/zm_conv_intr.F90:101-172)."""
    mid = ((ncol, pver), "physpkg")
    edge = ((ncol, pver + 1), "physpkg")
    srf = ((ncol,), "physpkg")
    return {
        "ZM_MU": mid, "ZM_EU": mid, "ZM_DU": mid, "ZM_MD": mid, "ZM_ED": mid,
        "ZM_DP": mid, "ZM_DSUBCLD": srf, "ZM_JT": srf, "ZM_MAXG": srf,
        "ZM_IDEEP": srf,
        "DP_FLXPRC": edge, "DP_FLXSNW": edge,
        "DP_CLDLIQ": mid, "DP_CLDICE": mid,
        "ICWMRDP": mid, "RPRDDP": mid, "NEVAPR_DPCU": mid,
        "PREC_DP": srf, "SNOW_DP": srf,
        "DLFZM": mid, "DIFZM": mid, "DNLFZM": mid, "DNIFZM": mid,
        "CMFMC_DP": edge,
        "CLD": ((ncol, pver), "global"),
        "FRACIS": ((ncol, pver), "physpkg"),
        "TPERT": srf, "PBLH": ((ncol,), "global"),
    }
