#!/usr/bin/env bash
# Package sedona_spark and run the pipeline via spark-submit --py-files
# (north rule: the job must be runnable on a multi-executor cluster this
# way; swap --master for yarn/k8s there).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
N_IMAGES="${1:-2000}"
OUT="${2:-/tmp/sedona_spark_submit_out}"
CORES="${SPARK_GRAFT_CPUS:-8}"

cd "$REPO"
rm -f /tmp/sedona_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('/tmp/sedona_spark.zip', 'w') as z:
    for root, _, files in os.walk('sedona_spark'):
        if '__pycache__' in root: continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('packaged /tmp/sedona_spark.zip')
"
rm -rf "$OUT"
exec spark-submit \
  --master "local[$CORES]" \
  --driver-memory 8g \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=64 \
  --conf spark.ui.enabled=false \
  --py-files /tmp/sedona_spark.zip \
  tools/submit_job.py --images "synth:$N_IMAGES" --out "$OUT" \
  --publish-table "$OUT/_table"
