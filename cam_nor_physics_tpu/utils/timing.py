"""Phase timing / tracing — perf_mod (GPTL t_startf/t_stopf) equivalent.

The reference wraps every phase in `t_startf/t_stopf` with named regions
(cd_core, trac2d, te_map, bc_physics, ac_physics, zm_convr, ...;
SURVEY §5.1). Here: `named_scope` tags the XLA profile (visible in
`jax.profiler` traces), and `PhaseTimer` gives the host-side per-region
walltime table the reference prints — correct around jitted calls because it
blocks on the returned arrays.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class PhaseTimer:
    """Accumulating region timer (t_startf/t_stopf role)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def region(self, name: str, block_on=None):
        """Time a region. Pass the region's output pytree via `block_on`
        from the caller when timing jitted code (see `timed`)."""
        with jax.named_scope(name):
            t0 = time.perf_counter()
            yield
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block until its outputs are ready, record walltime."""
        with jax.named_scope(name):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
        return out

    def table(self) -> str:
        """The per-region report (the reference's GPTL timing table role)."""
        lines = [f"{'region':<24}{'calls':>8}{'total_s':>12}{'ms/call':>12}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot, n = self.totals[name], self.counts[name]
            lines.append(f"{name:<24}{n:>8}{tot:>12.3f}{tot/n*1e3:>12.2f}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
