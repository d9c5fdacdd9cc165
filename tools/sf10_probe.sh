#!/bin/bash
# Fresh-JVM sf10 probe runner: ONE JVM PER SAMPLE, min taken across JVMs
# by tools/merge_bench.py. In-JVM repeat samples are JIT/page-cache-warm
# and read as a floor, not a representative time (q67's in-JVM min-of-3
# published 27.8x where fresh JVMs deliver ~150x) — fresh JVMs remove the
# warm-floor bias while the min still strips load outliers.
#
# Usage: tools/sf10_probe.sh <out.csv> [query=reps ...]
# Appends lines "query,sample_index,seconds|timeout|error" to <out.csv>.
# Env: SPARK_GRAFT_SF10_DIR (default /root/repo/bench-data/sf10),
#      SPARK_GRAFT_CP (default target/scala-2.13/classes:/opt/spark/jars/*),
#      SPARK_GRAFT_SAMPLE_TIMEOUT seconds (default 2400).
set -u
OUT="${1:?usage: sf10_probe.sh <out.csv> [query=reps ...]}"
shift || true
if [ $# -gt 0 ]; then PROBES=("$@"); else
  PROBES=(q18_minhash_pairs=3 q116_sa_dup_ranges=3 q125_sliding_distinct=3
          q139_label_prop=3 q67_semantic_dedup=3 q219_single_linkage=3
          q222_hdbscan_profile=3 q214_hits=2 q208_max_dup_substring=2
          q113_set_similarity=3 q249_audio_clip_autosig=3)
fi
mkdir -p "$(dirname "$OUT")"
CP="${SPARK_GRAFT_CP:-target/scala-2.13/classes:/opt/spark/jars/*}"
DIR="${SPARK_GRAFT_SF10_DIR:-/root/repo/bench-data/sf10}"
TMO="${SPARK_GRAFT_SAMPLE_TIMEOUT:-2400}"
# JDK 17 module opens Spark needs outside spark-submit (same list as
# build.sbt's jdk17AddOpens — a bare java launch without these dies with
# IllegalAccessException on e.g. sun.util.calendar date paths)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for spec in "${PROBES[@]}"; do
  q="${spec%%=*}"; reps="${spec##*=}"
  for i in $(seq 1 "$reps"); do
    line=$(timeout "$TMO" java $OPENS -cp "$CP" -Xmx100g graft.Once "$DIR" 1 "$q" 2>&1 \
      | grep '^\[once\]' | tail -1)
    rc=$?
    secs=$(echo "$line" | awk '{print $3}')
    if [ -n "$secs" ]; then
      echo "$q,$i,$secs" >> "$OUT"
      echo "[probe] $q sample $i/$reps: ${secs}s" >&2
    elif [ "$rc" = 124 ]; then
      echo "$q,$i,timeout" >> "$OUT"
      echo "[probe] $q sample $i/$reps: TIMEOUT (${TMO}s)" >&2
    else
      echo "$q,$i,error" >> "$OUT"
      echo "[probe] $q sample $i/$reps: ERROR (rc=$rc)" >&2
    fi
  done
done
