"""Scan-parallelism floor for heavy map-side operators.

The expensive part of most text operators here (shingle explosion,
n-gram construction, posting-list tokenization, hashed-bigram
features) runs *before* the first exchange — i.e. inside the scan
stage. Scan parallelism is bounded by the input's split count, and a
single-row-group parquet file (or a gzip file, or one fat file among
small ones) yields one task: the whole map-side computation serializes
onto one core no matter how many the cluster has. This is the "input
skew: one huge unsplittable file" case of the optimization playbook
(spark_optimization_guide.md §2.5), whose fix is "repartition
immediately after the read".

``spread`` applies that fix *adaptively*. The gate is the optimizer's
size estimate for the plan, not the plan's partition count: asking a
DataFrame for its partition count (``df.rdd``) forces AQE to finalize
the plan, which *executes* every upstream shuffle stage — measured on
this host: a probe on a join plan ran 2 Spark jobs before answering.
The size estimate is driver-only and free. It is exact for bare file
scans (the case this helper exists for) and wildly *over*-estimated
for joins/checkpoints, which makes overshoot the safe direction: an
operator fed by upstream shuffles skips the extra exchange it does not
need.

The repartition fires only when the estimated input is at most
``parallelism x 4 MiB`` — small enough that the added exchange moves a
trivial number of bytes once, while unlocking every core for the
map-heavy stage above it. At 100 TB (or any healthy multi-split scan)
the estimate is far above the gate and ``spread`` is a no-op; the
threshold scales with the session's parallelism, never a hard-coded
local constant. The key is a deterministic hash (never round-robin,
which pays a sort and has retry-duplication hazards, guide §2.5).

Results are unaffected: every consumer is a grouping/join/aggregation
keyed at least by the repartition key, so per-key row locality and
in-key row order are preserved and partial-aggregation merge order per
key is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-core byte budget under which an extra exchange is considered free
_BYTES_PER_CORE = 4 * 1024 * 1024


def spread(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition ``df`` by ``xxhash64(key_col)`` to the session's
    default parallelism iff the optimizer's size estimate says the
    whole input is tiny (see module docstring). No-op otherwise."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if target <= 1:
        return df
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df  # stats bridge unavailable: never fail the operator
    if est > target * _BYTES_PER_CORE:
        return df
    return df.repartition(target, F.xxhash64(F.col(key_col)))
