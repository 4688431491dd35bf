"""Salting utilities: results must equal the unsalted equivalents, and
the salted join must spread a hot key across salt partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.skew import salted_join, skew_safe_count_distinct
from parquet_rewriter_spark.sources.readers import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    # make custkey 0 artificially hot: everything maps to few keys
    hot = orders.withColumn("ck", F.col("o_custkey") % 3)
    dim = (
        load_table(spark, sf_dir, "customer")
        .withColumn("ck", F.col("c_custkey") % 3)
        .select("ck", "c_nationkey")
        .distinct()
    )
    plain = hot.join(dim, "ck").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    ).first()
    salted = salted_join(hot, dim, "ck", salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    ).first()
    assert salted.n == plain.n
    assert abs(salted.s - plain.s) < 1e-6 * abs(plain.s)


def test_salted_join_outer_matches(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    dim = spark.range(0, 10).withColumnRenamed("id", "user_id")
    plain = ev.join(dim, "user_id", "left").count()
    salted = salted_join(ev, dim, "user_id", how="left", salt=4).count()
    assert salted == plain


def test_skew_safe_count_distinct_matches_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        (r.event_type): r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    safe = {
        (r.event_type): r.n_distinct
        for r in skew_safe_count_distinct(ev, "event_type", "user_id").collect()
    }
    assert safe == exact
