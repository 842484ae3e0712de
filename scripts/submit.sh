#!/usr/bin/env bash
# Cluster launch for the extraction pipeline: package the engine and run
# the CLI under spark-submit --py-files (the north-rule launch shape).
#
#   MASTER=spark://host:7077 scripts/submit.sh INPUT --out OUT [...]
#
# MASTER defaults to local[$SPARK_GRAFT_CPUS] so the same script smoke-
# tests in the sandbox. Executor sizing knobs pass through via
# SUBMIT_ARGS (e.g. SUBMIT_ARGS="--num-executors 64 --executor-cores 4").
# For the N vs 4N scaling protocol, run this twice with the two executor
# counts and compare `python bench.py` throughput (see BENCH/BASELINE.md).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"

# pin one interpreter for packaging, the driver, and every executor
# (bare `python` does not exist on python3-only hosts)
PYTHON="${PYSPARK_PYTHON:-$(command -v python3)}"
export PYSPARK_PYTHON="$PYTHON"

ZIP="$("$PYTHON" "$REPO/scripts/package.py")"

# the builder must not force local mode under spark-submit
export SPARK_GRAFT_MASTER=inherit

# driver memory must be set before the driver JVM starts — the in-code
# builder config is inert under spark-submit
exec spark-submit \
  --master "$MASTER" \
  --name docstrange_spark \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-8g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  ${SUBMIT_ARGS:-} \
  "$REPO/scripts/job.py" "$@"
