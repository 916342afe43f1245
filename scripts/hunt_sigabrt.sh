#!/bin/bash
# SIGABRT hunt (VERDICT r3 #2): run the full suite under the PRODUCT
# configuration (threaded eval stages everywhere), with
#   * pytest capture OFF (-s) so the native abort message reaches the log
#     (round 3's dumps lost the glibc/XLA message to pytest's fd capture);
#   * faulthandler armed;
#   * core dumps enabled (core lands in the cwd, kernel.core_pattern=core).
# Usage: scripts/hunt_sigabrt.sh <run-tag> [pytest-args...]
set -u
TAG=${1:-hunt}; shift || true
cd "$(dirname "$0")/.."
ulimit -c unlimited
export PYTHONFAULTHANDLER=1
# staged mode is the test default since round 4 (tests/test_parallel.py)
LOG=/tmp/sigabrt_${TAG}.log
echo "[hunt ${TAG}] start $(date -u +%H:%M:%S)" | tee "$LOG"
python -m pytest tests/ -q -s -p no:cacheprovider "$@" >> "$LOG" 2>&1
RC=$?
echo "[hunt ${TAG}] rc=$RC $(date -u +%H:%M:%S)" >> "$LOG"
if [ $RC -ge 128 ]; then
  echo "[hunt ${TAG}] CRASH signal $((RC - 128))" >> "$LOG"
  ls -la core* 2>/dev/null >> "$LOG"
fi
tail -3 "$LOG"
exit $RC
