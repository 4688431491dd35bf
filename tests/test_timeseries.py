"""Gap-filled resampling + ordered funnels — operators/timeseries.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.timeseries import (
    funnel,
    funnel_counts,
    resample_fill,
)


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", _ts(1, 10), 1.0),
        ("a", _ts(1, 40), 2.0),
        ("a", _ts(4, 5), 4.0),   # hours 2,3 are gaps
        ("b", _ts(2, 0), 10.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_resample_fills_gaps_and_forward_fills(series):
    out = resample_fill(
        series, key="k", ts="ts", step="1 hour",
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        fill=["s"],
    )
    rows = {(r["k"], r["bucket"].hour): r for r in out.collect()}
    # a spans hours 1..4 (4 rows), b is a single bucket
    assert {(k, h) for k, h in rows} == {("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 2)}
    assert rows[("a", 1)]["s"] == 3.0 and rows[("a", 1)]["n"] == 2
    assert rows[("a", 2)]["n"] is None  # empty bucket: no events
    assert rows[("a", 2)]["s"] == 3.0  # forward-filled
    assert rows[("a", 3)]["s"] == 3.0
    assert rows[("a", 4)]["s"] == 4.0
    assert rows[("b", 2)]["s"] == 10.0


def test_resample_rejects_unknown_step(series):
    with pytest.raises(ValueError, match="unsupported resample step"):
        resample_fill(series, "k", "ts", "1 fortnight", {"n": F.count(F.lit(1))})


@pytest.fixture(scope="module")
def journeys(spark):
    rows = [
        # u1 completes in order
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2: purchase BEFORE click → chain stops after click
        (2, _ts(1), "view"), (2, _ts(3), "click"), (2, _ts(2), "purchase"),
        # u3: view only
        (3, _ts(5), "view"),
        # u4: click with no view → never enters the funnel
        (4, _ts(1), "click"), (4, _ts(2), "purchase"),
        # u5: same-timestamp click as view → strictly-after excludes it
        (5, _ts(1), "view"), (5, _ts(1), "click"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_chain_semantics(journeys):
    out = {r["user_id"]: r for r in funnel(
        journeys, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert out[1]["t_3_purchase"] == _ts(3)
    assert out[2]["t_2_click"] == _ts(3) and out[2]["t_3_purchase"] is None
    assert out[3]["t_1_view"] == _ts(5) and out[3]["t_2_click"] is None
    assert out[4]["t_1_view"] is None and out[4]["t_2_click"] is None
    assert out[5]["t_2_click"] is None  # strictly-after at equal ts


def test_funnel_counts(journeys):
    rows = {r["step"]: r["n_completed"] for r in funnel_counts(
        journeys, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert rows == {1: 4, 2: 2, 3: 1}
