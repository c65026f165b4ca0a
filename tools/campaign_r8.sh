#!/bin/bash
# Round-8 scale campaign (VERDICT r7 ask #6 + ADVICE provenance items):
#  1. Generate the 50 M-doc corpus IN the script (the r7 script required
#     it but never generated it — ADVICE #1).
#  2. ContaminationScale bounded-bench regime at 50 M (committed
#     provenance for the r7-cited 9.6x-linear number — ADVICE #2).
#  3. RetrievalScale build/compact/probe at 50 M, then reattach pricing
#     in a FRESH JVM (nAppends=-1: reattach + first validated registry
#     probe + memoized steady probe — the r7 console-measured numbers,
#     now scripted — ADVICE #2).
#  4. q64s streaming-curation replay at 50 M docs, 20 batches of 2.5 M
#     (2x the r7 state growth at the SAME batch size: the flat-in-state
#     curve's next point — VERDICT ask #6, now that disk fits it).
# Every sbt stage's exit code AND expected output marker are checked
# before any destructive cleanup (ADVICE #1: the r7 script rm -rf'd a
# 1400 s corpus after silently-empty stages).
set -u
OUT=${1:-/root/repo/bench/campaign_r8.log}
SCRATCH="/dev/shm/graft_scratch,/root/repo/target/scratch"
CORPUS=/root/repo/target/sf1000_docs
cd /root/repo

clean_scratch() { rm -rf /dev/shm/graft_scratch /root/repo/target/scratch; }
stamp() { echo "=== $1 $(date +%H:%M:%S), disk free: $(df -h / | tail -1 | awk '{print $4}') ===" >> "$OUT"; }
# run <name> <timeout_s> <marker_regex> <logfile> -- <sbt main + args…>
# Fails the campaign (exit 1, artifacts left for debugging) when the
# stage exits non-zero or its log lacks the expected marker. With
# RESUME=1, a stage whose done-stamp is already in $OUT is skipped —
# a failed campaign re-runs only its incomplete tail.
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

# --- 1. the 50 M-doc corpus (generated here, not assumed) ---
if [ ! -d "$CORPUS" ]; then
  clean_scratch
  SPARK_GRAFT_SCALE_MULTI=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
    run_stage gen_50m_corpus 7200 "success.*Total time" /tmp/gen50m_r8.log \
    "runMain graft.Scale /root/testdata/sf0.1 $CORPUS 10000 documents"
  if [ ! -d "$CORPUS/documents.parquet" ]; then
    echo "STAGE FAILED: gen_50m_corpus left no $CORPUS/documents.parquet — aborting" >> "$OUT"
    exit 1
  fi
  stamp "50m corpus at $CORPUS ($(du -sh $CORPUS | cut -f1))"
fi

# --- 2. bounded-bench contamination regime, 2 reps (r7 provenance) ---
clean_scratch
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  run_stage contamination_bounded_50m 7200 "contamination-scale.*rep2" /tmp/contam50m_r8.log \
  "runMain graft.ContaminationScale $CORPUS 2"
grep -a "contamination-scale" /tmp/contam50m_r8.log >> "$OUT"

# --- 3a. index lifecycle: build -> probe -> compact -> probe ---
clean_scratch
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  run_stage retrieval_50m 10800 "probe_compacted_fresh rep2" /tmp/retrscale_50m_r8.log \
  "runMain graft.RetrievalScale $CORPUS 0"
grep -a "retrieval-scale" /tmp/retrscale_50m_r8.log >> "$OUT"

# --- 3b. reattach pricing in a FRESH JVM over the surviving index ---
clean_scratch
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  run_stage reattach_50m 1800 "registry_probe_steady" /tmp/reattach_50m_r8.log \
  "runMain graft.RetrievalScale $CORPUS -1"
grep -a "retrieval-scale" /tmp/reattach_50m_r8.log >> "$OUT"

# --- free the index before the replay (its ~60 GB state needs the disk;
#     checks above guarantee the numbers are already in $OUT) ---
rm -rf spark-warehouse/graft_invidx_*
clean_scratch
stamp "index artifacts cleaned"

# --- 4. q64s replay at 50 M docs, 20 micro-batches of 2.5 M ---
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  run_stage stream_corpus_50m 14400 '"metric":"stream_corpus_batches"' /tmp/streamcorpus_50m_r8.log \
  "runMain graft.StreamCorpusScale $CORPUS 20"
grep -a "stream-corpus-scale\|\"metric\"" /tmp/streamcorpus_50m_r8.log >> "$OUT"

# --- cleanup (only reached when every stage passed its checks) ---
rm -rf "$CORPUS" spark-warehouse/graft_strmcorp_* /tmp/graft_stream_corpus_*
clean_scratch
stamp "campaign artifacts cleaned"
echo "campaign done $(date)" >> "$OUT"
