#!/bin/bash
# Round-10 lineitem-family >1000x point (VERDICT r9 ask #6).
#
# The full 10000x replica never fits this box (lineitem alone ~110 GB vs
# ~80 GB available), so the family gets its first >1000x point from the
# subset that DOES fit: lineitem+orders+customer(+dims) at 4000x
# (lineitem 2.4 B rows / ~43 GB, orders 0.6 B rows / ~11 GB) — the
# round-4 subset-validation methodology (_SUBSET_TABLES marker, same-day
# same-methodology reference at 1000x, steady-state REPEAT in one JVM).
#
# Queries: q01_agg_pricing (lineitem scan+agg), q04_multi_join
# (lineitem x orders x broadcast dims — the engine's biggest fact x fact
# join), q87b_merge_upsert_bucketed / q93b_incremental_agg_bucketed (the
# maintained-bucketed-base CDC forms; their non-bucketed twins got the
# 10000x orders point in round 4, the bucketed forms never ran above
# 1000x).
#
# Disk plan (~80 GB available, resv_strict mount — budget AVAILABLE, not
# free): the 4000x stage generates INTO ~55 GB, benches q01/q04, then
# deletes lineitem.parquet (43 GB back) BEFORE the CDC stage builds its
# two bucketed orders copies (2 x ~11 GB). q87b/q93b read only orders;
# the _SUBSET_TABLES marker plus this ordering keeps every stage inside
# the quota. Both scale stages use striped scratch (tmpfs + disk) and a
# 40 g heap — the family-sized-heap methodology of the round-4 10000x
# runs; the SAME methodology at 1000x keeps the step ratio clean.
set -u
OUT=${1:-/root/repo/bench/campaign_r10c.log}
SCRATCH="/dev/shm/graft_scratch,/root/repo/target/scratch"
TABLES="lineitem,orders,customer,nation,region"
QUERIES="q01_agg_pricing q04_multi_join"
CDCQ="q87b_merge_upsert_bucketed q93b_incremental_agg_bucketed"
REC=/root/repo/bench/bench_li_family_r10.jsonl
cd /root/repo

clean_scratch() { rm -rf /dev/shm/graft_scratch /root/repo/target/scratch; }
clean_cdc() { rm -rf /root/repo/spark-warehouse/graft_cdcbase_*; }
stamp() { echo "=== $1 $(date +%H:%M:%S), avail: $(df -h / | tail -1 | awk '{print $4}') ===" >> "$OUT"; }
run_stage() {
  local name=$1 tmo=$2 marker=$3 log=$4; shift 4
  if [ "${RESUME:-0}" = "1" ] && grep -aq "=== $name done" "$OUT" 2>/dev/null; then
    echo "=== $name skipped (already done, resume) ===" >> "$OUT"
    return 0
  fi
  stamp "$name start"
  timeout "$tmo" sbt -batch "$@" > "$log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "STAGE FAILED: $name rc=$rc (timeout=$tmo) — aborting, artifacts kept" >> "$OUT"
    exit 1
  fi
  if ! grep -aq "$marker" "$log"; then
    echo "STAGE FAILED: $name exited 0 but marker '$marker' absent from $log — aborting" >> "$OUT"
    exit 1
  fi
  stamp "$name done"
}
# the "sf" field in the metric line (sf100_li / sf400_li) plus the query
# keys already identify each point — keep the file valid JSONL
record() { # tag logfile (tag is for the campaign log only)
  grep -a '"metric":"total"' "$2" | tail -1 | sed 's/^\[info\] //' >> "$REC"
  echo "recorded $1" >> "$OUT"
}

[ "${RESUME:-0}" = "1" ] || { : > "$OUT"; : > "$REC"; }

# --- stage 1: the 1000x same-day reference ---
DIR1=/root/repo/target/sf100_li
if [ ! -e "$DIR1/lineitem.parquet" ]; then
  clean_scratch
  SPARK_GRAFT_SCALE_MULTI=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    run_stage gen_1000x 3600 "success.*Total time" /tmp/gen_li1000_r10.log \
    "runMain graft.Scale /root/testdata/sf0.1 $DIR1 1000 $TABLES"
  stamp "1000x subset at $DIR1 ($(du -sh $DIR1 | cut -f1))"
fi
clean_scratch; clean_cdc
SPARK_GRAFT_SF_DIR=$DIR1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g \
SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  run_stage bench_1000x_li 3600 '"metric":"total"' /tmp/bench_li1000_r10.log \
  "runMain graft.Bench $QUERIES"
record li_1000x /tmp/bench_li1000_r10.log
clean_scratch; clean_cdc
SPARK_GRAFT_SF_DIR=$DIR1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g \
SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  run_stage bench_1000x_cdc 3600 '"metric":"total"' /tmp/bench_cdc1000_r10.log \
  "runMain graft.Bench $CDCQ"
record cdc_1000x /tmp/bench_cdc1000_r10.log
rm -rf "$DIR1"; clean_cdc
stamp "1000x artifacts cleaned"

# --- stage 2: the 4000x point ---
DIR4=/root/repo/target/sf400_li
if [ ! -e "$DIR4/orders.parquet" ]; then
  clean_scratch
  SPARK_GRAFT_SCALE_MULTI=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
    run_stage gen_4000x 7200 "success.*Total time" /tmp/gen_li4000_r10.log \
    "runMain graft.Scale /root/testdata/sf0.1 $DIR4 4000 $TABLES"
  stamp "4000x subset at $DIR4 ($(du -sh $DIR4 | cut -f1))"
fi
if [ -e "$DIR4/lineitem.parquet" ]; then
  clean_scratch; clean_cdc
  SPARK_GRAFT_SF_DIR=$DIR4 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g \
  SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
    run_stage bench_4000x_li 7200 '"metric":"total"' /tmp/bench_li4000_r10.log \
    "runMain graft.Bench $QUERIES"
  record li_4000x /tmp/bench_li4000_r10.log
  # q87b/q93b read ONLY orders; reclaim lineitem's 43 GB before the CDC
  # stage stages its two bucketed orders copies (2 x ~11 GB)
  rm -rf "$DIR4/lineitem.parquet"
  stamp "4000x lineitem reclaimed"
fi
clean_scratch; clean_cdc
SPARK_GRAFT_SF_DIR=$DIR4 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g \
SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  run_stage bench_4000x_cdc 7200 '"metric":"total"' /tmp/bench_cdc4000_r10.log \
  "runMain graft.Bench $CDCQ"
record cdc_4000x /tmp/bench_cdc4000_r10.log

# --- cleanup (success only) ---
rm -rf "$DIR4"; clean_cdc; clean_scratch
stamp "campaign artifacts cleaned"
echo "campaign done $(date)" >> "$OUT"
