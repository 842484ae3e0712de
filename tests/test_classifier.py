"""Distributed logistic regression: learnability, determinism, and the
bounded-collect training contract."""

import pytest
from pyspark.sql import functions as F

from docstrange_spark.operators import classifier


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_learns_separable_labels(spark):
    """A linearly separable feature must be learned essentially
    perfectly within a few iterations."""
    rows = [(i, 1.0 if i % 2 else 0.0, float(i % 2)) for i in range(200)]
    feats = spark.createDataFrame(rows, "doc_id long, f double, y double")
    w = classifier.train_logreg(feats, ["f"], "y", iters=20, lr=2.0)
    preds = classifier.predict_logreg(feats, ["f"], w, label_col="y").collect()
    acc = sum(1 for r in preds if r["pred"] == bool(r["label"])) / len(preds)
    assert acc == 1.0, (acc, w)


def test_quality_classifier_beats_base_rate(docs):
    """A label that IS a (thresholded) function of a feature must be
    learned far beyond the majority-class base rate on the real corpus
    — the end-to-end check that standardization + GD actually train
    (the synthetic corpus encodes lang only weakly in these features,
    so the lang label can't serve as the learnability probe)."""
    out = classifier.quality_classifier(
        docs, F.col("stopword_ratio") >= F.lit(0.06),
        label_keep=(), iters=10, lr=2.0,
    ).collect()
    n = len(out)
    acc = sum(1 for r in out if r["pred"] == bool(r["label"])) / n
    pos = sum(r["label"] for r in out) / n
    base = max(pos, 1 - pos)
    assert acc > base + 0.2, (acc, base)
    assert acc > 0.9, acc


def test_training_is_deterministic(docs):
    a = classifier.quality_classifier(docs, F.col("lang") == F.lit("en"))
    b = classifier.quality_classifier(docs, F.col("lang") == F.lit("en"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_train_logreg_input_validation(spark):
    feats = spark.createDataFrame([(0, 1.0, 1.0)], "doc_id long, f double, y double")
    with pytest.raises(ValueError):
        classifier.train_logreg(feats, ["f"], "y", iters=0)
    empty = feats.where("doc_id < 0")
    with pytest.raises(ValueError):
        classifier.train_logreg(empty, ["f"], "y")


def test_pred_matches_logit_sign(docs):
    out = classifier.quality_classifier(
        docs, F.col("lang") == F.lit("en")
    ).collect()
    for r in out:
        # decision rule is sign(z): consistent with the probability
        # except exactly at 0.5
        if r["prob"] > 0.5:
            assert r["pred"]
        elif r["prob"] < 0.5:
            assert not r["pred"]


def test_empty_text_docs_do_not_poison_training(spark):
    """Empty text makes punct_ratio 0/0 = NULL upstream; the classifier
    must coalesce it so such docs train and predict as zeros rather
    than dropping out of gradient sums / emitting NULL predictions."""
    rows = [(i, "word " * (i + 2), i % 2 == 0) for i in range(20)]
    rows += [(100, "", False), (101, None, False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    out = {r["doc_id"]: r for r in classifier.quality_classifier(
        df, F.col("y"), label_keep=("y",)).collect()}
    assert len(out) == 22
    for d in (100, 101):
        assert out[d]["prob"] is not None and out[d]["pred"] is not None


def test_calibration_bins_partition_and_bounds(docs):
    preds = classifier.quality_classifier(docs, F.col("lang") == F.lit("en"))
    cal = classifier.calibration_bins(preds).collect()
    # bins partition the scored set exactly
    assert sum(r["n"] for r in cal) == preds.count()
    assert len({r["prob_bin"] for r in cal}) == len(cal)
    for r in cal:
        assert 0 <= r["prob_bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n"]
        assert 0.0 <= r["mean_prob"] <= 1.0
        assert abs(r["pos_rate"] - r["n_pos"] / r["n"]) < 1e-6
        # the bin's mean predicted prob lies inside the bin (clamped top)
        lo, hi = r["prob_bin"] / 10.0, (r["prob_bin"] + 1) / 10.0
        assert lo - 1e-6 <= r["mean_prob"] <= (hi + 1e-6 if r["prob_bin"] < 9 else 1.0 + 1e-6)
