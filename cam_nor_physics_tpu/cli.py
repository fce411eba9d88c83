"""Console entry points (pyproject [project.scripts]).

`cam-nor-bench` — the repo-root bench harness (one JSON line, BASELINE.md
metric). `cam-nor-run` — a Held-Suarez run of the coupled driver with
history/checkpoint output, the quickest end-to-end driver invocation
(driver.py::quick_run); flags are deliberately minimal — production runs
configure via the typed config dataclasses (utils/config.py, the
namelist-equivalent surface).
"""

from __future__ import annotations

import argparse
import sys


def bench_main() -> None:
    """Run the benchmark harness as an installed script.

    The harness itself lives at the repo root as `bench.py` for the
    driver contract; installed environments get it on the path here."""
    import importlib.util
    import os
    root_bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    if os.path.exists(root_bench):
        spec = importlib.util.spec_from_file_location("bench", root_bench)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    else:  # installed without the repo checkout
        print("bench.py not found next to the package — run from a repo "
              "checkout (the bench drives repo-local tools)",
              file=sys.stderr)
        sys.exit(2)


def run_main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Held-Suarez run of the coupled TPU-native driver")
    p.add_argument("--im", type=int, default=48)
    p.add_argument("--jm", type=int, default=24)
    p.add_argument("--km", type=int, default=10)
    p.add_argument("--nsteps", type=int, default=8)
    p.add_argument("--chunk", type=int, default=1,
                   help="steps per device dispatch (driver chunked loop)")
    p.add_argument("--hist-every", type=int, default=0)
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--out", default="output")
    args = p.parse_args(argv)

    from .driver import quick_run
    state, timer = quick_run(
        im=args.im, jm=args.jm, km=args.km, nsteps=args.nsteps,
        out_dir=args.out, hist_every=args.hist_every,
        ckpt_every=args.ckpt_every, chunk=args.chunk)
    print(timer.table())
    print(f"completed step {int(state.nstep)}; output in {args.out}")


if __name__ == "__main__":
    run_main()
