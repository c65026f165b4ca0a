#!/bin/bash
# Round-9 appendix: the LSM-style adaptive fold cadence measured at
# 5 M docs (compactEvery = -1). Generates its own corpus, replays 10
# micro-batches with the size-triggered mid-replay fold, and appends
# the per-batch/fold lines + summary JSON to the campaign log.
# Ran 2026-08-16 (bench/campaign_r9.log: folds at batches 1/3/7 at
# 9.6/26.2/48.5 s, corpus_rows 4749000, total 2057 s).
set -u
OUT=${1:-/root/repo/bench/campaign_r9.log}
CORPUS=/root/repo/target/sf100_docs_r9
cd /root/repo
rm -rf /dev/shm/graft_scratch /root/repo/target/scratch
if [ ! -d "$CORPUS/documents.parquet" ]; then
  SPARK_GRAFT_SCALE_MULTI=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
    timeout 1800 sbt -batch "runMain graft.Scale /root/testdata/sf0.1 $CORPUS 1000 documents" \
    > /tmp/gen5m_r9.log 2>&1
  [ -d "$CORPUS/documents.parquet" ] || { echo "gen_5m FAILED" >> "$OUT"; exit 1; }
fi
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g \
SPARK_GRAFT_LOCAL_DIR="/dev/shm/graft_scratch,/root/repo/target/scratch" \
  timeout 5400 sbt -batch "runMain graft.StreamCorpusScale $CORPUS 10 -1" \
  > /tmp/streamcorpus_5m_adaptive_r9.log 2>&1
rc=$?
grep -aq '"metric":"stream_corpus_batches"' /tmp/streamcorpus_5m_adaptive_r9.log || {
  echo "adaptive5m FAILED rc=$rc — artifacts kept" >> "$OUT"; exit 1; }
grep -a "stream-corpus\|\"metric\"" /tmp/streamcorpus_5m_adaptive_r9.log | grep -av INFO >> "$OUT"
rm -rf "$CORPUS" spark-warehouse/graft_strmcorp_* /tmp/graft_stream_corpus_* \
  /dev/shm/graft_scratch /root/repo/target/scratch
echo "adaptive5m done rc=$rc $(date)" >> "$OUT"
