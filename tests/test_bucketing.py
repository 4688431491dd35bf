"""Bucketed co-located joins: same-bucketed tables must join with no
Exchange on either side (the 100 TB fact-fact join strategy)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.bucketing import bucketed_join, write_bucketed
from parquet_rewriter_spark.sources.readers import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "okey")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "okey")
    write_bucketed(orders, "b_orders", "okey", 8)
    write_bucketed(lineitem, "b_lineitem", "okey", 8)
    # the fixture is small enough to auto-broadcast, which would hide
    # the property under test — force the shuffle-join path the way a
    # real fact-fact join would plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", on="okey")
        p = _plan(joined)
        assert "Exchange" not in p, p  # co-located: no shuffle on either side
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p

        # and it computes the right thing
        expected = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregation_avoids_shuffle(spark, sf_dir):
    """groupBy on the bucket key of a bucketed table needs no exchange."""
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(orders, "b_orders_agg", "o_custkey", 8)
    try:
        agg = (
            spark.table("b_orders_agg")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("rev"))
        )
        assert "Exchange" not in _plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_agg")
