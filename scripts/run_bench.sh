#!/usr/bin/env bash
# spark-submit runner for the benchmark / verify mains (the cluster-shaped
# entry; local dev normally uses `sbt "runMain graft.Bench"`).
#
#   ./scripts/run_bench.sh [cores] [scale_rows]
#
# On a real cluster, replace --master local[N] with the cluster master and
# size --num-executors N vs 4N for the two scaling runs (the in-sandbox
# equivalent is the built-in 2->8 / 8->32 core pairs — see BASELINE.md).
set -euo pipefail
CORES="${1:-32}"
ROWS="${2:-40000000}"
sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/geoclimatespark_2.13-*.jar | head -1)
exec /opt/spark/bin/spark-submit \
  --master "local[$CORES]" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --driver-memory "${SPARK_DRIVER_MEM:-16g}" \
  --class graft.Bench "$JAR"
