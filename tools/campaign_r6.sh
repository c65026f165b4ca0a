#!/bin/bash
# Round-6 50M-doc (10000x) campaign for the lm-pass/selection heavies
# (VERDICT r5 ask #1). One JVM per query (the round-5 measurement-hygiene
# rule), REPEAT=2 (steady = rep 2), tmpfs scratch, family-sized threads:
# the exact-verification family runs local[16] per the 3 GB/core bound.
set -u
DIR=${1:-target/sf1000_docs}
OUT=${2:-/root/repo/bench/campaign_r6_50m.log}
SCRATCH=/dev/shm/graft_scratch
cd /root/repo

run_one() { # name cpus mem timeout
  local q=$1 cpus=$2 mem=$3 to=$4
  rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"
  echo "=== $q (local[$cpus], $mem, $DIR) $(date +%H:%M:%S) ===" >> "$OUT"
  SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_CPUS=$cpus \
    SPARK_DRIVER_MEM=$mem SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
    timeout "$to" sbt -batch "runMain graft.Bench $q" 2>&1 \
    | grep -aE '"metric"|PRE-PASS|FAILED' >> "$OUT"
  echo "=== $q done $(date +%H:%M:%S), disk free: $(df -h / | tail -1 | awk '{print $4}') ===" >> "$OUT"
}

: > "$OUT"
# q113b's 50M point: RetrievalScale times the index BUILD separately from
# the probe (Bench's pre-pass would hide the build cost); nAppends=0.
rm -rf "$SCRATCH"; mkdir -p "$SCRATCH"
echo "=== retrieval_50m build+probe (local[32], 48g) $(date +%H:%M:%S) ===" >> "$OUT"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  timeout 7200 sbt -batch "runMain graft.RetrievalScale $DIR 0" 2>&1 \
  | grep -a "retrieval-scale" >> "$OUT"
echo "=== retrieval_50m done $(date +%H:%M:%S), disk free: $(df -h / | tail -1 | awk '{print $4}') ===" >> "$OUT"

run_one q110_boilerplate_strip    16 48g 5400
run_one q114_dsir_select          32 48g 7200
run_one q118_contamination_spans  32 48g 9000
run_one q121_ccnet_buckets        32 48g 7200
run_one q120_doremi_mix           32 48g 7200
rm -rf "$SCRATCH"
echo "campaign done $(date)" >> "$OUT"
