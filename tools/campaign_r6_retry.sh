#!/bin/bash
# Retry of the three 50M-doc lm-family OOM casualties with shuffle
# scratch STRIPED across tmpfs + disk (the round-6 GraftSession dial)
# and a 40g heap, leaving tmpfs headroom next to the JVM.
set -u
DIR=target/sf1000_docs
OUT=/root/repo/bench/campaign_r6_retry.log
SCRATCH="/dev/shm/graft_scratch,/root/repo/target/scratch"
cd /root/repo
: > "$OUT"
for q in q118_contamination_spans q121_ccnet_buckets q120_doremi_mix; do
  rm -rf /dev/shm/graft_scratch /root/repo/target/scratch
  echo "=== $q (local[32], 40g, striped scratch) $(date +%H:%M:%S) ===" >> "$OUT"
  SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM=40g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
    timeout 9000 sbt -batch "runMain graft.Bench $q" > /tmp/retry_$q.log 2>&1
  grep -aE '"metric"|PRE-PASS|FAILED|OutOfMemory|Killed' /tmp/retry_$q.log | tail -5 >> "$OUT"
  echo "=== $q done $(date +%H:%M:%S), free: $(free -g|awk 'NR==2{print $4"G"}') ===" >> "$OUT"
done
rm -rf /dev/shm/graft_scratch /root/repo/target/scratch
echo "retry done $(date)" >> "$OUT"
