"""Reader contract: the engine must work on a SparkSession it did not build.

The correctness driver passes its own vanilla session; round 1 died on
events.parquet (TIMESTAMP(NANOS)) because the nanosAsLong conf lived only
in the engine's session factory. ``load_table`` / ``stream_events`` now
set it on the session they are handed — these tests pin that on a session
whose SQL confs start clean (``newSession`` shares the context but not
runtime SQL confs).
"""

from __future__ import annotations

from parquet_rewriter_spark.sources.readers import load_table
from parquet_rewriter_spark.streaming.ops import run_to_memory, stream_events, tumbling_counts


def _vanilla(spark):
    fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    fresh.conf.unset("spark.sql.session.timeZone")
    return fresh


def test_load_events_on_vanilla_session(spark, sf_dir):
    fresh = _vanilla(spark)
    df = load_table(fresh, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_stream_events_on_vanilla_session(spark, sf_dir):
    fresh = _vanilla(spark)
    out = run_to_memory(tumbling_counts(stream_events(fresh, sf_dir)), "complete")
    assert out.count() > 0
