"""Table readers over the driver's Parquet fixtures.

The reference opens one Parquet file and inherits its footer schema
(ParquetRewriter.java:100-115). Spark equivalent: ``spark.read.parquet``
(schema from footer, vectorized reader, row-group stats skipping under
``spark.sql.parquet.filterPushdown``).

One normalization lives here: ``events.ts`` is physical
INT64 TIMESTAMP(NANOS), which Spark's reader rejects. We read it as
long (``spark.sql.legacy.parquet.nanosAsLong``) and convert to a
microsecond timestamp, truncating exactly the way DuckDB/pyarrow
truncate ns → µs, so oracle comparisons agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes events.ts ns-long → timestamp."""
    from parquet_rewriter_spark.ship import ensure_shipped

    ensure_shipped(spark)  # caller sessions: make the package importable on workers
    if name == "events":
        ensure_nanos_as_long(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet columns readable on ANY session.

    The engine's own session factory sets this at build time, but callers
    (the correctness driver in particular) hand us vanilla sessions —
    ``spark.sql.legacy.parquet.nanosAsLong`` is a runtime SQL conf, so we
    set it here, right before the read that needs it.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """events.ts ns-long → µs timestamp (shared by batch + stream readers)."""
    if dict(df.dtypes).get("ts") == "bigint":
        # integer-divide ns → µs: `/` would be double division, and at
        # ~1.7e18 ns a double only carries ~µs*100 precision — `div`
        # keeps it exact (ts is post-epoch, so trunc == floor)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register each fixture as a temp view for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
