#!/usr/bin/env bash
# Ship the engine via spark-submit --py-files (north_rule packaging).
#
#   scripts/submit.sh --pages /path/pages.parquet --warehouse /path/wh \
#       --seed http://forum.example/b0/t0 --budget 5
#
# On a cluster, replace --master; the zip carries the whole package.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/bbcrawl_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" bbcrawl_spark -x '*__pycache__*')

exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-64}" \
  --conf spark.driver.memory="${SPARK_GRAFT_DRIVER_MEM:-12g}" \
  --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
  --py-files "$ZIP" \
  "$REPO/scripts/run_crawl.py" "$@"
