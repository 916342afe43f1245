#!/bin/bash
# Focused SIGABRT hunt: the modules surrounding the historical crash
# (e2e enables the persistent cache in-process; parallel/wire drive the
# shard_map STAPLE + staged-eval mix), looped N times in fresh processes.
# Usage: scripts/hunt_sigabrt_focused.sh <tag> <iterations>
set -u
TAG=${1:-f}; N=${2:-4}
cd "$(dirname "$0")/.."
ulimit -c unlimited
export PYTHONFAULTHANDLER=1
# staged mode is the test default since round 4 (tests/test_parallel.py)
LOG=/tmp/sigabrt_focused_${TAG}.log
: > "$LOG"
for i in $(seq 1 "$N"); do
  echo "[focused ${TAG}] cycle $i/$N $(date -u +%H:%M:%S)" >> "$LOG"
  python -m pytest tests/test_e2e.py tests/test_parallel.py \
      tests/test_wire_eval.py -q -s -p no:cacheprovider >> "$LOG" 2>&1
  RC=$?
  echo "[focused ${TAG}] cycle $i rc=$RC" >> "$LOG"
  if [ $RC -ge 128 ]; then
    echo "[focused ${TAG}] CRASH signal $((RC - 128)) in cycle $i" >> "$LOG"
    ls -la core* 2>/dev/null >> "$LOG"
    exit $RC
  fi
done
echo "[focused ${TAG}] all $N cycles clean" >> "$LOG"
tail -2 "$LOG"
