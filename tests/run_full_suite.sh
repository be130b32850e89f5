#!/bin/bash
# Full-suite runner hardened against the XLA:CPU compile segfault.
#
# This host's XLA:CPU backend sporadically segfaults inside LLVM codegen
# ~40-60 min into a compile-heavy process (observed three times
# 2026-08-21, different tests each time, all pass standalone; serial
# codegen + disabled cache writes in conftest.py reduced but did not
# eliminate it).  Running one pytest process per test module keeps every
# process far below the crash horizon and contains any crash to one
# module, which is retried once.
#
#   bash tests/run_full_suite.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
  for attempt in 1 2; do
    python -m pytest "$f" -q "$@"
    rc=$?
    [ $rc -eq 0 ] && break
    if [ $attempt -eq 1 ]; then
      echo "RETRY $f (exit $rc — possible XLA:CPU codegen crash)" >&2
    else
      echo "FAIL $f (exit $rc)" >&2
      fail=1
    fi
  done
done
exit $fail
