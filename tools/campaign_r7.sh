#!/bin/bash
# Round-7 scale campaign (VERDICT r6 asks #5 and #6):
#  1. Inverted-index compact-right-after-build at 50 M docs: build,
#     fresh probe, compact, probe again (RetrievalScale nAppends=0 —
#     non-mutating). Done = compacted 50 M probe in single-digit seconds.
#  2. The q64s streaming-curation replay at 25 M docs (5× the round-5
#     point): per-batch curve must stay flat as accumulated state grows.
# One JVM per measurement; scratch striped tmpfs+disk (the round-6
# dial); the 50 M corpus + index are deleted before the 25 M state run
# so both campaigns fit the box's disk.
set -u
OUT=${1:-/root/repo/bench/campaign_r7.log}
SCRATCH="/dev/shm/graft_scratch,/root/repo/target/scratch"
cd /root/repo

clean_scratch() { rm -rf /dev/shm/graft_scratch /root/repo/target/scratch; }
stamp() { echo "=== $1 $(date +%H:%M:%S), disk free: $(df -h / | tail -1 | awk '{print $4}') ===" >> "$OUT"; }

: > "$OUT"

# --- 1. 50 M-doc index lifecycle: build -> probe -> compact -> probe ---
clean_scratch
stamp "retrieval_50m compact-after-build start"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  timeout 10800 sbt -batch "runMain graft.RetrievalScale target/sf1000_docs 0" \
  > /tmp/retrscale_50m_r7.log 2>&1
grep -a "retrieval-scale" /tmp/retrscale_50m_r7.log >> "$OUT"
stamp "retrieval_50m done"

# --- free the 50 M artifacts before the 25 M state run ---
rm -rf target/sf1000_docs spark-warehouse/graft_invidx_*
clean_scratch
stamp "50m artifacts cleaned"

# --- 2. generate the 25 M-doc corpus (factor 5000, documents only) ---
SPARK_GRAFT_SCALE_MULTI=1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  timeout 7200 sbt -batch "runMain graft.Scale /root/testdata/sf0.1 target/sf500_docs 5000 documents" \
  > /tmp/gen25m.log 2>&1
stamp "25m corpus generated ($(du -sh target/sf500_docs | cut -f1))"

# --- 3. q64s replay at 25 M docs, 10 micro-batches of 2.5 M ---
clean_scratch
stamp "stream_corpus_25m start"
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=40g SPARK_GRAFT_LOCAL_DIR="$SCRATCH" \
  timeout 14400 sbt -batch "runMain graft.StreamCorpusScale target/sf500_docs 10" \
  > /tmp/streamcorpus_25m_r7.log 2>&1
grep -a '"metric"' /tmp/streamcorpus_25m_r7.log >> "$OUT"
stamp "stream_corpus_25m done"

# --- free the 25 M artifacts (state tables + corpus) ---
rm -rf target/sf500_docs spark-warehouse/graft_strmcorp_* /tmp/graft_stream_corpus_*
clean_scratch
stamp "25m artifacts cleaned"
echo "campaign done $(date)" >> "$OUT"
