"""As-of join directions (backward/forward/nearest) + tolerance —
operators/joins.py. Pandas merge_asof is the semantics reference."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.joins import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 12, m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(30)), (3, "v", _ts(5))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts(8), 80.0),
            ("u", _ts(29), 290.0),
            ("u", _ts(31), 310.0),
            ("v", _ts(50), 500.0),
        ],
        "k string, ts timestamp, val double",
    )
    return left, right


def _vals(df):
    return {r.id: r["val_a"] for r in df.collect()}


def test_backward(sides):
    left, right = sides
    out = _vals(asof_join(left, right, on="ts", by="k", suffix="_a"))
    assert out == {1: 80.0, 2: 290.0, 3: None}


def test_forward(sides):
    left, right = sides
    out = _vals(asof_join(left, right, on="ts", by="k", suffix="_a", direction="forward"))
    assert out == {1: 290.0, 2: 310.0, 3: 500.0}


def test_nearest_prefers_closer_and_ties_backward(spark, sides):
    left, right = sides
    out = _vals(asof_join(left, right, on="ts", by="k", suffix="_a", direction="nearest"))
    # id=2 at :30 — backward :29 (1 min) vs forward :31 (1 min): tie → backward
    assert out == {1: 80.0, 2: 290.0, 3: 500.0}


def test_tolerance_nulls_far_matches(sides):
    left, right = sides
    out = _vals(
        asof_join(
            left, right, on="ts", by="k", suffix="_a",
            tolerance=F.expr("INTERVAL 1 MINUTE"),
        )
    )
    # backward: id=1 match at -2min > tol → NULL; id=2 at -1min ok
    assert out == {1: None, 2: 290.0, 3: None}

    out_n = _vals(
        asof_join(
            left, right, on="ts", by="k", suffix="_a", direction="nearest",
            tolerance=F.expr("INTERVAL 2 MINUTES"),
        )
    )
    assert out_n == {1: 80.0, 2: 290.0, 3: None}


def test_equal_timestamp_is_inclusive_both_directions(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("u", _ts(10), 7.0)], "k string, ts timestamp, val double")
    for d in ("backward", "forward", "nearest"):
        got = _vals(asof_join(left, right, on="ts", by="k", suffix="_a", direction=d))
        assert got == {1: 7.0}, d


def test_keep_match_col(sides):
    left, right = sides
    out = asof_join(
        left, right, on="ts", by="k", suffix="_a", keep_match_col=True
    ).collect()
    row = {r.id: r for r in out}
    assert row[1]["ts_a"] == _ts(8)
    assert row[3]["ts_a"] is None
