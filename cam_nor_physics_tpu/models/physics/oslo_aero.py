"""Oslo aerosol interface shims — oslo_aero_{microp,ocean,share} equivalents.

The reference ships these as deliberately EMPTY stubs "to replace the need
for OSLO_AERO ifdef in NorESM physics"
(/root/reference/physics/oslo_aero_microp.F90:3): the real OSLO_AERO package
lives in a separate NorESM repository, and the physics driver branches on
`use_oslo_aero` (/root/reference/physics/physpkg.F90:1801-1809, 2914-2920).
This module reproduces that contract exactly: the interfaces exist with the
CAM signatures, `use_oslo_aero` defaults False, and calls are no-ops.
"""

from __future__ import annotations

# oslo_aero_share equivalents (/root/reference/physics/oslo_aero_share.F90:8-9)
USE_OSLO_AERO: bool = False
NBMODES: int = 0


def oslo_aero_microp_run(state, ptend_all, dt, pbuf):
    """No-op with the CAM microp_aero_run interface
    (/root/reference/physics/oslo_aero_microp.F90:16-25). Returns the inputs
    unchanged — the branch `use_oslo_aero` in tphysac selects this instead of
    `microp_aero_run` (physpkg.F90:1801-1809)."""
    return state, ptend_all, pbuf


def oslo_aero_ocean_adv(state, pbuf):
    """No-op (/root/reference/physics/oslo_aero_ocean.F90): ocean DMS/aerosol
    advance hook."""
    return pbuf
