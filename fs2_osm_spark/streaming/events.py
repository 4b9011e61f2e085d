"""Structured Streaming over the events table.

The reference's stream is bounded with no time semantics (SURVEY.md §2.3
notes: no watermarks/windows/state), so this module is target-side surface:
the same events relation consumed as a stream — file source with bounded
trigger, event-time watermark, tumbling-window aggregation, and
watermarked stream dedupe — with results identical to the batch plan
(which is what the DuckDB oracle checks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


_STAGED: dict[str, str] = {}


def _stage_dir(spark: SparkSession, sf_dir: str) -> str:
    """The file stream source wants a directory of files; stage the single
    events.parquet as 4 files so maxFilesPerTrigger=1 yields real
    incremental micro-batches."""
    key = os.path.abspath(sf_dir)
    if key not in _STAGED:
        import tempfile

        out = tempfile.mkdtemp(prefix="events_stream_")
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        # stage as 4 time-ordered files written sequentially (increasing
        # mtime): the file source replays them oldest-first, so event time
        # advances monotonically-ish and the watermark behaves as it would
        # on a live stream instead of discarding "late" shuffled rows
        qs = ev.approxQuantile("event_id", [0.25, 0.5, 0.75], 0.001)
        bounds = [float("-inf"), *qs, float("inf")]
        for i in range(4):
            ev.filter(
                (F.col("event_id") > bounds[i]) & (F.col("event_id") <= bounds[i + 1])
            ).coalesce(1).write.mode("append").parquet(out)
        _STAGED[key] = out
    return _STAGED[key]


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_stage_dir(spark, sf_dir))
    )
    # the parquet column is TIMESTAMP_NTZ; watermarks require TIMESTAMP
    # (session TZ is pinned to UTC so the instant is unchanged)
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Execute a bounded stream fully (processAllAvailable) into a memory
    sink and return the materialized result."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {name}")


def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type.

    Complete output mode so trailing windows emit on a bounded stream (in
    append mode the watermark never passes the final window once the file
    source is exhausted — the classic bounded-replay pitfall)."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).cast("double").alias("total_value"),
        )
    )
    out = run_to_memory(agg, "windowed_event_counts", "complete")
    return out.select(
        F.col("win.start").alias("win_start"), "event_type", "n", "total_value"
    )


def stream_dedupe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dropDuplicates on (user_id, event_type, hour),
    then a batch aggregate over the materialized deduped stream (keeps a
    single stateful operator per streaming query)."""
    stream = _events_stream(spark, sf_dir)
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    dedup = (
        stream.select("user_id", "event_type", "ts", hour)
        .withWatermark("ts", "2 hours")
        .dropDuplicates(["user_id", "event_type", "hour"])
    )
    out = run_to_memory(dedup, "stream_dedupe_rows", "append")
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))
