#!/usr/bin/env bash
# Ship the engine to a cluster via spark-submit --py-files (north_rule).
# Usage: tools/submit.sh <master-url> <job.py> [job args...]
# Example job: bench.py, or any script importing full_text_index_spark.
set -euo pipefail
MASTER="${1:?master url (e.g. spark://host:7077, yarn, local[32])}"
JOB="${2:?python job file}"
shift 2
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/full_text_index_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" full_text_index_spark -x '*__pycache__*')
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$JOB" "$@"
