"""Distributed logistic-regression training as pure DataFrame
aggregations — the quality-classifier stage a training-data pipeline
runs after the heuristic filters (fastText-style quality classifiers
are standard pre-training practice; logistic regression over heuristic
features is the public-knowledge baseline form).

No MLlib, no Python loops over rows: each gradient-descent iteration is
ONE map-side-combined aggregation over the feature table (a handful of
sums), and only the weight vector (a few floats) ever reaches the
driver — the same bounded per-iteration collect contract as
``similarity.ivf_train``'s centroids. At 100 TB an iteration costs one
scan of the (tiny, materialized) feature table.

Cross-engine bit-exactness: per-row gradient contributions are rounded
to integer MICRO-UNITS (x 1e6, cast to long) before summing, so the sum
is exact integer arithmetic in both Spark and the DuckDB oracle —
float summation order can't drift, and the weight recurrence
``w - lr * (g / (1e6 * n))`` is deterministic double arithmetic on
identical operands. The oracle unrolls the same iterations as nested
SQL CTEs and reproduces every weight bit-for-bit (up to the documented
~1-ulp libm ``exp`` divergence, absorbed by the micro-unit rounding).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000.0


def _z(feature_cols: list[str], w: list[float]):
    """Left-associated dot product ``w0 + w1*f1 + ...`` (bias first) —
    the association order is part of the cross-engine contract."""
    z = F.lit(float(w[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(w[j + 1])) * F.col(c)
    return z


def standardize(
    feats: DataFrame, feature_cols: list[str]
) -> tuple[DataFrame, list[float], list[float]]:
    """Z-score the feature columns — the pass that makes raw heuristic
    ratios (scale ~1e-2) trainable with plain gradient descent. One
    aggregation computes integer micro-unit moment sums (``round(x *
    1e6)`` and its square), so mean/std are deterministic double
    arithmetic on exact integers in both engines; a zero-variance
    column standardizes with std 1 (stays constant). Returns the
    standardized frame plus the (means, stds) actually used.

    The squared micro-unit sums hold ``n * (x * 1e6)^2`` — exact in
    int64 up to corpus sizes ~1e5 with |x| <= ~2; at full web scale
    run the moment pass on a sample or lower the quantization (the
    training loop itself is unaffected).
    """
    aggs = [F.count("*").cast("long").alias("n")]
    for j, c in enumerate(feature_cols):
        xi = F.round(F.col(c) * F.lit(MICRO), 0).cast("long")
        aggs.append(F.sum(xi).alias(f"s{j}"))
        aggs.append(F.sum(xi * xi).alias(f"q{j}"))
    row = feats.agg(*aggs).collect()[0]
    n = row["n"]
    if n == 0:
        raise ValueError("cannot standardize an empty feature table")
    means, stds = [], []
    for j in range(len(feature_cols)):
        if row[f"s{j}"] is None:
            raise ValueError(
                f"feature column {feature_cols[j]!r} is entirely NULL — "
                "coalesce features before standardizing"
            )
        m = row[f"s{j}"] / (MICRO * n)
        var = row[f"q{j}"] / (MICRO * MICRO * n) - m * m
        means.append(m)
        # math.sqrt is the IEEE correctly-rounded sqrt (matching SQL
        # sqrt); x**0.5 routes through pow and may differ by an ulp
        stds.append(1.0 if var <= 0 else math.sqrt(var))
    cols = []
    for c in feats.columns:
        if c in feature_cols:
            j = feature_cols.index(c)
            cols.append(
                ((F.col(c) - F.lit(means[j])) / F.lit(stds[j])).alias(c)
            )
        else:
            cols.append(F.col(c))
    return feats.select(*cols), means, stds


def train_logreg(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 0.5,
) -> list[float]:
    """Batch gradient descent from ``w = 0``: per iteration one
    aggregation computes ``g_j = sum(round(((sigmoid(w.x) - y) * x_j)
    * 1e6))`` in integer micro-units, then
    ``w_j -= lr * (g_j / (1e6 * n))``. Returns ``[bias, w_1, ...]``.

    Feature and label columns must be NON-NULL: a NULL silently drops
    out of its own gradient sum but still counts in ``n``, skewing the
    weights — coalesce upstream (``quality_classifier`` does).

    ``feats`` should be a MATERIALIZED feature table at scale — each
    iteration scans it once (the contract query recomputes it per
    iteration and leans on AQE exchange reuse, same trade as
    quality_bins).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1 (got {iters})")
    w = [0.0] * (len(feature_cols) + 1)
    y = F.col(label_col).cast("double")
    n = None  # rides the first iteration's aggregation — no extra scan
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(feature_cols, w)))
        err = p - y
        sums = [
            F.count("*").cast("long").alias("n"),
            F.sum(F.round(err * F.lit(MICRO), 0).cast("long")).alias("gb"),
        ] + [
            F.sum(
                F.round((err * F.col(c)) * F.lit(MICRO), 0).cast("long")
            ).alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ]
        row = feats.agg(*sums).collect()[0]
        if n is None:
            n = row["n"]
            if n == 0:
                raise ValueError("cannot train on an empty feature table")
        g = [row["gb"]] + [row[f"g{j}"] for j in range(len(feature_cols))]
        w = [wj - lr * (gj / (MICRO * n)) for wj, gj in zip(w, g)]
    return w


def predict_logreg(
    feats: DataFrame,
    feature_cols: list[str],
    w: list[float],
    id_col: str = "doc_id",
    label_col: str | None = None,
) -> DataFrame:
    """Score rows with a trained weight vector: probability (rounded
    6 dp), predicted class via the EXACT decision rule ``z >= 0``
    (sign of the logit — no float sigmoid comparison), and the label
    passed through when given."""
    z = _z(feature_cols, w)
    cols = [
        F.col(id_col).alias("doc_id"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("prob"),
        (z >= F.lit(0.0)).alias("pred"),
    ]
    if label_col is not None:
        cols.append(F.col(label_col).cast("long").alias("label"))
    return feats.select(*cols)


def quality_classifier(
    df: DataFrame,
    label_expr,
    label_keep: tuple = ("lang",),
    id_col: str = "doc_id",
    text_col: str = "text",
    iters: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Train-and-score convenience over the engine's own heuristic
    features (``quality_score``: stopword ratio, punctuation ratio,
    mean word length / 10 — z-scored by ``standardize`` so GD converges
    on ratio-scale inputs): fit ``iters`` GD steps against
    ``label_expr`` (a boolean Column over ``df``'s columns), return
    per-doc (doc_id, prob, pred, label).

    The 100 TB shape: features are a pure projection of the scan (the
    label's source columns ride through ``quality_score``'s ``keep``,
    so there is NO label join); training reads them ``iters`` times
    (materialize them once in production via ``train_logreg``
    directly); scoring is one more projection with the weights folded
    into the plan as literals.
    """
    from . import text_analysis

    feats = text_analysis.quality_score(
        df, id_col=id_col, text_col=text_col, keep=label_keep
    ).select(
        "doc_id",
        # empty text makes punct_ratio 0/0 = NULL (and a fully-empty
        # corpus would NULL the others) — coalesce so NULLs can't skew
        # the gradient sums; the oracle applies the same coalesce
        F.coalesce(F.col("stopword_ratio"), F.lit(0.0)).alias("f1"),
        F.coalesce(F.col("punct_ratio"), F.lit(0.0)).alias("f2"),
        F.coalesce(F.col("mean_word_len") * F.lit(0.1), F.lit(0.0)).alias("f3"),
        # a NULL in label_expr's source column (e.g. NULL lang) must not
        # train as a silent no-op: coalesce to 0.0 so the row counts as a
        # negative, matching the oracle's CASE WHEN ... THEN 1 ELSE 0 END
        # (SQL CASE maps a NULL predicate to the ELSE branch)
        F.coalesce(label_expr.cast("double"), F.lit(0.0)).alias("y"),
    )
    zfeats, _, _ = standardize(feats, ["f1", "f2", "f3"])
    w = train_logreg(zfeats, ["f1", "f2", "f3"], "y", iters=iters, lr=lr)
    return predict_logreg(zfeats, ["f1", "f2", "f3"], w, label_col="y")


def calibration_bins(preds: DataFrame, n_bins: int = 10) -> DataFrame:
    """Reliability diagram for a scored classifier: bucket predictions
    by probability decile and compare the bin's mean predicted
    probability against its empirical positive rate — the standard
    check that a quality classifier's scores are usable as sampling
    weights (an over-confident classifier silently skews any
    probability-weighted corpus selection downstream).

    Input is ``predict_logreg`` output (``doc_id, prob, pred, label``).
    Cross-engine exactness: ``prob`` is already rounded to 6 dp, so
    ``round(prob * 1e6)`` is an exact integer per row and ``mean_prob``
    is an integer-sum ratio; ``pos_rate`` is a count ratio. Bin edges
    use IEEE ``floor(prob * 10)`` on identical doubles in both engines
    (the 1.0 endpoint clamps into the top bin).

    The 100 TB shape: one map-side-combined aggregation over the
    scored table, ``n_bins`` output rows.
    """
    b = F.least(
        F.floor(F.col("prob") * F.lit(float(n_bins))).cast("long"),
        F.lit(n_bins - 1),
    )
    return (
        preds.groupBy(b.alias("prob_bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("label").cast("long")).cast("long").alias("n_pos"),
            F.round(
                F.sum(F.round(F.col("prob") * F.lit(MICRO)).cast("long"))
                / (F.lit(MICRO) * F.count("*")),
                6,
            ).alias("mean_prob"),
            F.round(
                F.sum(F.col("label").cast("long")) / F.count("*"), 6
            ).alias("pos_rate"),
        )
        .select("prob_bin", "n", "n_pos", "mean_prob", "pos_rate")
    )
