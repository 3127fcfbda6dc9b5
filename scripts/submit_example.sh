#!/usr/bin/env bash
# Example cluster deployment (north rule: spark-submit --py-files on a
# multi-executor cluster). The package is pure Python + numpy; the C scan/
# MinHash/shingle kernels compile on first use per executor (system cc,
# sha256-keyed cache) and fall back to the bit-identical numpy paths when
# no compiler is present — no build step in the artifact.
# Smoke-verified locally: zip + `spark-submit --master local[8]
# --py-files /tmp/fastcdc_rs_spark.zip jobs/dedup_job.py` runs the full
# pipeline from outside the repo checkout.
#
# Build the artifact:
#   cd /root/repo && zip -r /tmp/fastcdc_rs_spark.zip fastcdc_rs_spark
#
# Then (cluster sizing notes in docs/SCALE.md):
set -euo pipefail

ZIP=${1:-/tmp/fastcdc_rs_spark.zip}
JOB=${2:-jobs/dedup_job.py}

spark-submit \
  --deploy-mode cluster \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
  --conf spark.python.worker.reuse=true \
  --conf spark.executor.pyspark.memory=2g \
  --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=1073741824 \
  --conf spark.executorEnv.MALLOC_TRIM_THRESHOLD_=1073741824 \
  --conf spark.sql.files.maxPartitionBytes=268435456 \
  "$JOB"
