"""Table readers over the driver's Parquet fixtures.

The reference opens one Parquet file and inherits its footer schema
(ParquetRewriter.java:100-115). Spark equivalent: ``spark.read.parquet``
(schema from footer, vectorized reader, row-group stats skipping under
``spark.sql.parquet.filterPushdown``).

One normalization lives here: ``events.ts``. Depending on how the
fixture generator wrote it, the physical column is either INT64
TIMESTAMP(NANOS) (Spark's reader rejects it outright — we read it as a
long via ``spark.sql.legacy.parquet.nanosAsLong`` and truncate ns → µs
the way DuckDB/pyarrow do) or INT64 TIMESTAMP(MICROS, adjusted=false)
(Spark reads it as TIMESTAMP_NTZ, which ``withWatermark`` /
``unix_micros`` / interval arithmetic reject). Both shapes are
normalized to a session-UTC TIMESTAMP so every downstream operator and
the DuckDB oracle (which sees a naive micros timestamp) agree on wall
clock values.
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
        ensure_events_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def ensure_events_readable(spark: SparkSession) -> None:
    """Make the events fixture read identically on ANY session.

    The engine's own session factory sets these at build time, but
    callers (the correctness driver in particular) hand us vanilla
    sessions; both are runtime SQL confs, so set them right before the
    read that needs them:

    - ``nanosAsLong`` — required when the fixture is TIMESTAMP(NANOS),
      which the vectorized reader otherwise refuses to load;
    - session timezone UTC — the fixture timestamps are timezone-naive,
      and ``normalize_events_ts`` casts NTZ → TIMESTAMP via the session
      zone; pinning UTC makes the wall-clock values identical to what
      the (naive) DuckDB oracle sees, on any host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# Backwards-compatible alias (round-2 name).
ensure_nanos_as_long = ensure_events_readable


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """events.ts (ns-long or TIMESTAMP_NTZ) → µs TIMESTAMP.

    Shared by batch + stream readers. Downstream operators need the
    TIMESTAMP type: ``withWatermark`` and ``unix_micros`` reject
    TIMESTAMP_NTZ outright.
    """
    from pyspark.sql.types import TimestampType

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # integer-divide ns → µs: `/` would be double division, and at
        # ~1.7e18 ns a double only carries ~µs*100 precision — `div`
        # keeps it exact (ts is post-epoch, so trunc == floor)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt != "timestamp":
        # NTZ → LTZ via the session zone (pinned UTC by
        # ensure_events_readable): same wall clock, watermark-capable.
        # Cast via the TYPE OBJECT, not the "timestamp" keyword — under
        # spark.sql.timestampType=TIMESTAMP_NTZ (which the correctness
        # driver sets) the keyword resolves to NTZ and the cast becomes
        # a no-op, leaving downstream unix_micros/withWatermark broken.
        df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register each fixture as a temp view for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
