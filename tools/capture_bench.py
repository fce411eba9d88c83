"""On-chip benchmark capture with provenance (round-4 ADVICE item).

Runs `python bench.py` under a set of configurations, each in its own
subprocess with a hard timeout (the axon tunnel wedges unpredictably —
round 3/4 incidents), and writes one JSON artifact per configuration to
`bench_captures/`. Doc tables (README.md / VALIDATION.md) must cite these
committed artifacts instead of unretained ad-hoc numbers.

Usage:  python tools/capture_bench.py [--tag r4] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # name, env overrides, timeout_s
    ("f19_chunk8", {"BENCH_PHASES": "1", "BENCH_ROOFLINE": "1"}, 2400),
    ("f19_chunk16", {"BENCH_CHUNK": "16"}, 1800),
    ("f19_chunk32", {"BENCH_CHUNK": "32"}, 1800),
    ("f09_chunk8", {"BENCH_GRID": "f09", "BENCH_ROOFLINE": "1"}, 2400),
    ("f05_chunk8", {"BENCH_GRID": "f05", "BENCH_ROOFLINE": "1"}, 3000),
    # full coupled atm_step (round-4 VERDICT #1): config-4b aquaplanet
    ("coupled_f19", {"BENCH_COUPLED": "1"}, 3000),
    ("coupled_f09", {"BENCH_COUPLED": "1", "BENCH_GRID": "f09"}, 3600),
    ("coupled_f19_microp", {"BENCH_COUPLED": "1", "BENCH_MICROP": "1"},
     3000),
]


def run_one(name: str, env_over: dict, timeout: float, tag: str) -> dict:
    env = dict(os.environ)
    env.update(env_over)
    # capture runs have their own per-config timeout + retry policy, so
    # bypass the bench's supervised-child orchestration (CAM_BENCH_CHILD)
    # and keep its tunnel-wait short
    env.setdefault("CAM_BENCH_CHILD", "1")
    env.setdefault("BENCH_TUNNEL_RETRIES", "2")
    t0 = time.time()
    rec = {"name": name, "tag": tag, "env": env_over,
           "started_unix": int(t0)}
    try:
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           timeout=timeout, capture_output=True, text=True,
                           cwd=REPO, env=env)
        rec["rc"] = r.returncode
        rec["stderr_tail"] = r.stderr[-4000:]
        for line in r.stdout.splitlines()[::-1]:
            line = line.strip()
            if line.startswith("{"):
                rec["result"] = json.loads(line)
                break
    except subprocess.TimeoutExpired:
        rec["rc"] = -1
        rec["error"] = f"timeout after {timeout}s (tunnel wedged?)"
    rec["wall_s"] = round(time.time() - t0, 1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r4")
    ap.add_argument("--quick", action="store_true",
                    help="f19 default config only")
    ap.add_argument("--only", default=None,
                    help="comma-separated config names")
    args = ap.parse_args()

    outdir = os.path.join(REPO, "bench_captures")
    os.makedirs(outdir, exist_ok=True)
    cfgs = CONFIGS[:1] if args.quick else CONFIGS
    if args.only:
        names = set(args.only.split(","))
        cfgs = [c for c in CONFIGS if c[0] in names]
    for name, env_over, timeout in cfgs:
        print(f"== {name} (timeout {timeout}s)", flush=True)
        rec = run_one(name, env_over, timeout, args.tag)
        path = os.path.join(outdir, f"{args.tag}_{name}.json")
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        res = rec.get("result", {})
        print(f"   rc={rec['rc']} value={res.get('value')} "
              f"chunk={res.get('chunk')} wall={rec['wall_s']}s -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
