#!/bin/bash
# Reliable full-suite runner for this 4-CPU host.
#
# One pytest process per test module: a worker crash (sporadic XLA:CPU
# LLVM segfault/abort under load — see repo notes) then costs one module
# retry instead of deadlocking a monolithic xdist controller mid-suite.
# Modules run serially (-p no:xdist would drop the pytest.ini -n flag;
# per-module -n 0 keeps one process and lets XLA use the cores). The
# persistent JAX compilation cache (tests/conftest.py) makes second
# passes nearly compile-free. A module that fails gets ONE retry; the
# retry's verdict is final.
#
# Usage: tools/run_tests.sh [pytest-extra-args...]
set -u
cd "$(dirname "$0")/.."
overall=0
summary=()
for f in tests/test_*.py; do
  t0=$SECONDS
  if timeout 2400 python -m pytest "$f" -q -n 0 "$@" > /tmp/rt_one.log 2>&1; then
    line="$(tail -n 3 /tmp/rt_one.log | grep -Eo '[0-9]+ (passed|skipped)[^=]*' | head -1)"
    summary+=("PASS  $f  (${line:-ok}, $((SECONDS-t0))s)")
  else
    rc1=$?
    echo "RETRY $f (rc=$rc1)" >&2
    if timeout 2400 python -m pytest "$f" -q -n 0 "$@" > /tmp/rt_one.log 2>&1; then
      summary+=("PASS  $f  (on retry, $((SECONDS-t0))s)")
    else
      overall=1
      summary+=("FAIL  $f  ($((SECONDS-t0))s)")
      tail -n 25 /tmp/rt_one.log >&2
    fi
  fi
done
printf '%s\n' "${summary[@]}"
exit $overall
