#!/usr/bin/env bash
# Launch the benchmark via spark-submit --py-files (north-rule launch
# form).  Usage: scripts/submit_bench.sh [cpus]
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${1:-${SPARK_GRAFT_CPUS:-32}}"
ZIP=/tmp/search_engine_spark.zip
rm -f "$ZIP"
python -c "
import shutil
shutil.make_archive('/tmp/search_engine_spark', 'zip', '.', 'search_engine_spark')
"
export SPARK_GRAFT_CPUS="$CPUS"
exec spark-submit \
  --master "local[$CPUS]" \
  --driver-memory "${SPARK_DRIVER_MEMORY:-48g}" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.adaptive.enabled=true \
  --py-files "$ZIP" \
  bench.py
