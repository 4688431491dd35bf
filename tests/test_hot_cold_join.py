"""hot_cold_split_join / hot_keys (operators/skew.py): the split must
return EXACTLY the plain join's rows for every join type, including
null keys and unmatched rows."""

from __future__ import annotations

import pytest

from parquet_rewriter_spark.operators.skew import hot_cold_split_join, hot_keys


def _skewed(spark):
    # 70% of rows on key 0, rest over 1..9; key 99 has no match in small
    rows = [(0 if i % 10 < 7 else 1 + i % 9, i) for i in range(1000)] + [(99, -1)]
    big = spark.createDataFrame(rows, "k long, payload long")
    small = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k long, val string")
    return big, small


def _rowset(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def test_hot_keys_detection(spark):
    big, _ = _skewed(spark)
    assert hot_keys(big, "k", min_count=500) == [0]


def test_split_join_matches_plain_inner(spark):
    big, small = _skewed(spark)
    plain = big.join(small, "k")
    split = hot_cold_split_join(big, small, "k", hot_min_count=500)
    assert _rowset(split.select(*plain.columns)) == _rowset(plain)


def test_split_left_join_keeps_null_and_unmatched(spark):
    big, small = _skewed(spark)
    big = big.unionByName(spark.createDataFrame([(None, -2)], big.schema))
    plain = big.join(small, "k", "left")
    split = hot_cold_split_join(big, small, "k", hot=[0], how="left")
    assert _rowset(split.select(*plain.columns)) == _rowset(plain)


def test_split_full_join_matches(spark):
    big, small = _skewed(spark)
    small = small.unionByName(spark.createDataFrame([(1000, "only-small")], small.schema))
    plain = big.join(small, "k", "full")
    split = hot_cold_split_join(big, small, "k", hot=[0], how="full")
    assert _rowset(split.select(*plain.columns)) == _rowset(plain)


def test_empty_hot_set_degenerates(spark):
    big, small = _skewed(spark)
    plain = big.join(small, "k")
    split = hot_cold_split_join(big, small, "k", hot=[])
    assert _rowset(split.select(*plain.columns)) == _rowset(plain)


def test_requires_hot_or_threshold(spark):
    big, small = _skewed(spark)
    with pytest.raises(ValueError, match="hot"):
        hot_cold_split_join(big, small, "k")
