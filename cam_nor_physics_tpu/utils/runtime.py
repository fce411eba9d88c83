"""Runtime capability probes for the active JAX backend.

The axon TPU tunnel (the dev harness's single-chip relay) executes plain
and Pallas programs but REJECTS executables compiled with buffer donation
for non-trivial programs: the first donated execution fails and every
fetch of its outputs raises ``INVALID_ARGUMENT: TPU backend error``
(trivial one-op donated programs pass, so a cheap probe cannot detect
this). Donation is a pure optimization — x(n) is dead once x(n+1)
exists, XLA reuses the HBM in place — so the driver and bench simply
skip it on that runtime and keep it for CPU and direct-attached TPUs.
"""

from __future__ import annotations

import os


def donation_ok() -> bool:
    """True when jit buffer donation is safe on the active runtime.

    CAM_FORCE_DONATE=1 overrides (for testing a fixed tunnel);
    CAM_NO_DONATE=1 disables everywhere.
    """
    if os.environ.get("CAM_NO_DONATE") == "1":
        return False
    if os.environ.get("CAM_FORCE_DONATE") == "1":
        return True
    return "axon" not in os.environ.get("JAX_PLATFORMS", "")
