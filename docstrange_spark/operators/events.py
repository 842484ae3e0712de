"""Event-stream analytics over the events table: ordered-funnel
conversion and cohort retention — the product-analytics companions to
the gaps-and-islands sessionization (`sessions` contract query) and
``streaming.sessionize_events``.

Both operators are pure DataFrame plans (no UDFs):

- :func:`event_funnel` resolves the sequential "step i strictly after
  step i-1" dependency INSIDE one per-user aggregate: events are
  collected into a time-sorted array (one shuffle, map-side partial
  collect) and a JVM-side ``F.aggregate`` walk advances a struct of
  per-step first-completion timestamps in a single pass. No self-joins:
  the classic S-way "join each step on ts > prev" plan shuffles the
  events table S times, this shuffles it once regardless of S.
- :func:`retention_cohorts` is two hash aggregations and one
  co-partitioned join on user_id.

Scale notes (100 TB): the funnel's per-user array holds only events
whose type participates in the funnel (filter pushed below the
collect), so its size is bounded by per-user funnel activity, not
total activity; the walk is whole-stage-codegen. Retention joins two
user_id-keyed aggregates — AQE picks broadcast when the cohort side is
small, sort-merge co-partitioned otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _funnel_walk(steps: list[str]) -> Column:
    """JVM-side walk over the time-sorted (ts, event_type) array:
    returns a struct t0..t{S-1} where t_i is the FIRST timestamp of
    ``steps[i]`` strictly after t_{i-1} (t_0 unconditional), nulls
    where the user never reaches the step."""
    S = len(steps)
    zero = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i}") for i in range(S)]
    )

    def advance(acc: Column, ev: Column) -> Column:
        fields = []
        for i, step in enumerate(steps):
            prev_ok = (
                F.lit(True) if i == 0
                else (acc[f"t{i-1}"].isNotNull() & (ev["ts"] > acc[f"t{i-1}"]))
            )
            take = (
                acc[f"t{i}"].isNull()
                & (ev["event_type"] == F.lit(step))
                & prev_ok
            )
            fields.append(
                F.when(take, ev["ts"]).otherwise(acc[f"t{i}"]).alias(f"t{i}")
            )
        return F.struct(*fields)

    return F.aggregate(F.col("seq"), zero, advance)


def event_funnel(events: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered funnel: for each step i, how many users completed
    steps[0..i] in temporal order (each step strictly after the
    previous one's first completion). Returns
    (step, event_type, n_users) with step 1-indexed.

    Semantics twin of the SQL chain ``t_i = min(ts) WHERE type =
    step_i AND ts > t_{i-1}`` — the sorted-array walk takes the first
    qualifying occurrence, which IS the minimum.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    S = len(steps)
    per_user = (
        events.where(F.col("event_type").isin(list(set(steps))))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_type"))
            ).alias("seq")
        )
        .select(_funnel_walk(steps).alias("w"))
    )
    reached = per_user.select(
        *[
            F.sum(F.col(f"w.t{i}").isNotNull().cast("long")).alias(f"n{i}")
            for i in range(S)
        ]
    )
    # S is tiny (a funnel definition), so the explode of one 1-row
    # aggregate into S rows is driver-free and constant-sized
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("event_type"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i in range(S)
        ]
    )
    return (
        reached.select(F.explode(pairs).alias("p"))
        .select("p.step", "p.event_type", "p.n_users")
    )


def retention_cohorts(events: DataFrame, max_day: int = 30) -> DataFrame:
    """Classic retention triangle: cohort users by the DATE of their
    first event, count distinct users active at each day offset
    0..max_day from their cohort date. Returns
    (cohort_date, day_offset, n_users) — one row per observed
    (cohort, offset) cell.

    Plan: user-first-date aggregate, co-partitioned join back on
    user_id, distinct (cohort, offset, user) via a count-distinct
    aggregate. Offsets past ``max_day`` are dropped (bounds the
    output to a triangle even over years of logs)."""
    firsts = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    return (
        events.select("user_id", F.to_date("ts").alias("d"))
        .join(firsts, "user_id")
        .select(
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).alias("day_offset"),
            "user_id",
        )
        .where(F.col("day_offset") <= max_day)
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
