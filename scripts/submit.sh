#!/usr/bin/env bash
# Launch the streaming job via spark-submit --py-files (north_rule launch
# mode). On a real cluster add --master yarn/k8s + executor sizing flags;
# here: local[N].
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${2:-8}"
ZIP="$(mktemp -d)/spatialflink_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" spatialflink_spark)
exec "$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')" \
  --master "local[$CORES]" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --py-files "$ZIP" \
  "$REPO/scripts/run_stream_job.py" "${1:-/root/testdata/sf0.001}"
