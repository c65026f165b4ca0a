#!/bin/bash
# Round-10 measurement campaign (VERDICT r9 asks #1 and #2):
#  1. ISOLATED REPEAT=3 references for the STREAMING family — the
#     codegen-cache thrash victims (q30b's +40% r8→r9 in-suite had no
#     isolated number to adjudicate against; ask #2). Lands as
#     bench/bench_isolated_r10.json next to r9's batch-heavy set.
#  2. The round-10 full-suite record (REPEAT=2, SPARK_GRAFT_ROUND=10).
#  3. Generate the 50 M-doc corpus and replay q64s over 20 batches WITH
#     the LSM size-triggered mid-replay fold (compactEvery=-1, now
#     per-kind) — ask #1: the round-8 UNcompacted 50 M run peaked at
#     ~11 GB free on a ~3,300-file batch-partition tail; this measures
#     the fold keeping both bounded at the scale where the tail bit,
#     with the corpus row count required to equal r8's 47,490,000-row
#     shape (uncompacted run's corpus at the same multiplier).
# Stage pattern from campaign_r8.sh: exit code + output marker checked
# before any destructive cleanup; RESUME=1 skips done stages.
set -u
OUT=${1:-/root/repo/bench/campaign_r10.log}
# striped scratch ONLY for the 50 M-class replay (round-6 lesson:
# tmpfs-only next to a 40 g heap OOM-killed); the sf0.1 BENCH stages
# must be tmpfs-only like every prior round's record (round-9 lesson:
# striping them onto vda read a uniform ~2x slowdown)
SCRATCH="/dev/shm/graft_scratch,/root/repo/target/scratch"
BENCH_SCRATCH="/dev/shm/graft_scratch"
CORPUS=/root/repo/target/sf1000_docs
cd /root/repo

clean_scratch() { rm -rf /dev/shm/graft_scratch /root/repo/target/scratch; }
stamp() { echo "=== $1 $(date +%H:%M:%S), disk free: $(df -h / | tail -1 | awk '{print $4}') ===" >> "$OUT"; }
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

[ "${RESUME:-0}" = "1" ] || : > "$OUT"

# the full streaming family (VERDICT r9 names q30b/q36/q34/q31b/q33;
# the rest ride along so the whole thrash-victim family gets the same
# noise-robust reference the batch heavies got in r9)
ISOLATED="q30_stream_windowed_counts q30b_stream_paced q31_stream_dedup \
q31b_stream_dedup_watermark q32_stream_session_window q33_stream_sliding \
q34_stream_stateful q35_stream_static_join q36_stream_stream_join \
q37_stream_flatmap_sessions q38_stream_neardup_suppress \
q64s_stream_training_corpus"

# --- 1. isolated REPEAT=3 streaming references on a quiet machine ---
if [ "${RESUME:-0}" = "1" ] && grep -aq "=== bench_isolated done" "$OUT" 2>/dev/null; then
  echo "=== bench_isolated skipped (already done, resume) ===" >> "$OUT"
else
  clean_scratch
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=24g SPARK_GRAFT_REPEAT=3 \
  SPARK_GRAFT_LOCAL_DIR="$BENCH_SCRATCH" \
    run_stage bench_isolated 3600 '"metric":"total"' /tmp/bench_isolated_r10.log \
    "runMain graft.Bench $ISOLATED"
  grep -a '"metric":"total"' /tmp/bench_isolated_r10.log | tail -1 \
    | sed 's/^\[info\] //' > /root/repo/bench/bench_isolated_r10.json
fi

# --- 2. the canonical round-10 full-suite record ---
clean_scratch
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_DRIVER_MEM=24g SPARK_GRAFT_REPEAT=2 SPARK_GRAFT_ROUND=10 \
SPARK_GRAFT_LOCAL_DIR="$BENCH_SCRATCH" \
  run_stage bench_full_r10 5400 '"metric":"total"' /tmp/bench_full_r10.log \
  "runMain graft.Bench"

# --- 3. the 50 M-doc corpus (generated here, not assumed) ---
if [ ! -d "$CORPUS/documents.parquet" ]; then
  clean_scratch
  SPARK_GRAFT_SCALE_MULTI=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
    run_stage gen_50m_corpus 3600 "success.*Total time" /tmp/gen50m_r10.log \
    "runMain graft.Scale /root/testdata/sf0.1 $CORPUS 10000 documents"
  if [ ! -d "$CORPUS/documents.parquet" ]; then
    echo "STAGE FAILED: gen_50m_corpus left no $CORPUS/documents.parquet — aborting" >> "$OUT"
    exit 1
  fi
  stamp "50m corpus at $CORPUS ($(du -sh $CORPUS | cut -f1))"
fi

# --- 4. q64s replay at 50 M docs / 20 batches with the LSM-triggered
#     per-kind mid-replay fold (vs the round-8 uncompacted 50 M run:
#     20×2.5 M batches 395-524 s flat, total 8924 s, ~61 GB state,
#     ~11 GB free at the tail, ~3,300 state files) ---
clean_scratch
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  run_stage stream_corpus_50m_lsm 16200 '"metric":"stream_corpus_batches"' \
  /tmp/streamcorpus_50m_r10.log \
  "runMain graft.StreamCorpusScale $CORPUS 20 -1"
grep -a "stream-corpus-scale\|stream-corpus\]\|\"metric\"" /tmp/streamcorpus_50m_r10.log >> "$OUT"

# --- cleanup (only reached when every stage passed its checks) ---
rm -rf "$CORPUS" spark-warehouse/graft_strmcorp_* /tmp/graft_stream_corpus_*
clean_scratch
stamp "campaign artifacts cleaned"
echo "campaign done $(date)" >> "$OUT"
