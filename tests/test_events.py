"""Event-funnel and retention-cohort semantics on hand-built logs
(the contract queries cover oracle parity at scale; these pin the
ordering edge cases)."""

import datetime as dt

import pytest

from docstrange_spark.operators import events as ev_ops


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (uid, et, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_temporal_order(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # u2 purchases BEFORE clicking: must stop at step 2
        (2, "view", _ts(1)), (2, "purchase", _ts(2)), (2, "click", _ts(3)),
        # u3 only views
        (3, "view", _ts(5)),
        # u4 clicks with no view: reaches no step
        (4, "click", _ts(1)),
    ]
    out = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in ev_ops.event_funnel(
            _events(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_strictly_after_excludes_ties(spark):
    # click at the SAME instant as the first view does not advance
    # (strict >), a later one does
    rows = [
        (1, "view", _ts(1)), (1, "click", _ts(1)),
        (2, "view", _ts(1)), (2, "click", _ts(1)), (2, "click", _ts(2)),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in ev_ops.event_funnel(
            _events(spark, rows), ["view", "click"]
        ).collect()
    }
    assert out == {1: 2, 2: 1}


def test_funnel_uses_first_completion_not_best(spark):
    # the chain anchors on the FIRST view (min ts), so a click that
    # precedes the first view never counts even if a later view exists
    rows = [
        (1, "click", _ts(2)), (1, "view", _ts(3)),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in ev_ops.event_funnel(
            _events(spark, rows), ["view", "click"]
        ).collect()
    }
    assert out == {1: 1, 2: 0}


def test_funnel_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        ev_ops.event_funnel(_events(spark, []), [])


def test_retention_cohorts_triangle(spark):
    rows = [
        # u1 first seen day 1, active days 1 and 3 -> offsets 0, 2
        (1, "view", _ts(1)), (1, "click", _ts(3)),
        # u2 first seen day 2, active day 2 twice -> offset 0 once
        (2, "view", _ts(2, 8)), (2, "view", _ts(2, 9)),
        # u3 first seen day 1, active day 3 -> offsets 0, 2
        (3, "view", _ts(1)), (3, "error", _ts(3)),
    ]
    out = {
        (str(r["cohort_date"]), r["day_offset"]): r["n_users"]
        for r in ev_ops.retention_cohorts(_events(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 2,
        ("2024-01-02", 0): 1,
    }


def test_retention_max_day_bound(spark):
    rows = [(1, "view", _ts(1)), (1, "view", _ts(31))]
    out = ev_ops.retention_cohorts(_events(spark, rows), max_day=7).collect()
    assert {r["day_offset"] for r in out} == {0}
