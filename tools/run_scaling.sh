#!/bin/bash
# North-rule scaling evidence runs (BASELINE.md protocol): identical job,
# identical input, two parallelism levels, fresh output dirs per trial.
set -u
cd /root/repo
LOG=${1:-/tmp/scaling_r3.log}
CORPUS_REPOS=${2:-100000}
CORPUS_FILES=${3:-40}
: > "$LOG"
run_trial() {
  local n=$1 trial=$2
  rm -rf /dev/shm/scale_r3
  echo "=== N=$n trial $trial $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_SCALE_N=$n sbt -batch \
    "runMain graft.bench.ScalingBench $CORPUS_REPOS $CORPUS_FILES /dev/shm/scale_r3" 2>&1 \
    | grep -a scaling_efficiency >> "$LOG"
}
for t in 1 2 3; do run_trial 2 "$t"; done
for t in 1 2; do run_trial 1 "$t"; done
rm -rf /dev/shm/scale_r3
echo "DONE $(date -u +%H:%M:%S)" >> "$LOG"
