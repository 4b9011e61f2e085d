"""Temporal joins over the events table, hard-oracled.

The as-of query's DuckDB twin uses DuckDB's NATIVE ASOF JOIN — a fully
independent implementation of the semantics — while the Spark side runs the
engine's union + ordered-window formulation (operators/temporal.py), so the
two can only agree if the operator is actually correct. The range join's
twin is the plain inequality join DuckDB evaluates via IEJoin; the Spark
side must reproduce it through bin-and-refine blocking.

Time arithmetic is integer-exact on both engines. The join queries use
epoch-MICROSECOND bigints (F.unix_micros / epoch_us); the gap-fill query
alone works on epoch-SECOND longs (hour-truncated grid — cast long /
floor(epoch())). The two granularities must never be mixed: an h value
from the gap-fill grid is 1e6 off from a ts_us.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fs2_osm_spark.io import load
from fs2_osm_spark.queries.registry import register

_MIN_US = 60_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


_ASOF_ORACLE = """
    WITH e AS (
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        FROM events
    ),
    l AS (
        SELECT event_id, user_id, ts_us, value FROM e
        WHERE event_type = 'click'
    ),
    r0 AS (
        SELECT user_id, ts_us AS r_ts,
               max(event_id) AS r_event_id,
               arg_max(value, event_id) AS r_value
        FROM e WHERE event_type = 'view'
        GROUP BY user_id, ts_us
    )
    SELECT l.event_id AS click_id,
           l.user_id,
           l.ts_us AS click_ts_us,
           r0.r_event_id,
           r0.r_value,
           r0.r_ts,
           l.ts_us - r0.r_ts AS gap_us
    FROM l ASOF LEFT JOIN r0
      ON l.user_id = r0.user_id AND l.ts_us >= r0.r_ts
"""


@register("temporal_asof_join", oracle=_ASOF_ORACLE)
def temporal_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click matched to the user's latest earlier
    (or simultaneous) view. Spark side = union + ordered window +
    last(ignorenulls) (one shuffle, no join node); oracle = DuckDB's native
    ASOF JOIN. Right side pre-deduped per (user, ts) by max event_id so the
    match is deterministic."""
    from fs2_osm_spark.operators.temporal import asof_join

    e = _events_us(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts_us").alias("click_ts_us"), "value",
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts_us")
        .agg(
            F.max("event_id").alias("event_id"),
            F.max_by("value", "event_id").alias("value"),
        )
    )
    out = asof_join(
        clicks, views, "user_id", "click_ts_us", "ts_us",
        right_cols=["event_id", "value"],
    )
    return out.select(
        "click_id",
        "user_id",
        "click_ts_us",
        F.col("r_event_id"),
        F.col("r_value"),
        F.col("r_ts"),
        (F.col("click_ts_us") - F.col("r_ts")).alias("gap_us"),
    )


_ASOF_FWD_ORACLE = """
    WITH e AS (
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        FROM events
    ),
    l AS (
        SELECT event_id, user_id, ts_us FROM e
        WHERE event_type = 'click'
    ),
    r0 AS (
        SELECT user_id, ts_us AS r_ts,
               max(event_id) AS r_event_id,
               CASE WHEN max(event_id) % 10 = 0 THEN NULL
                    ELSE arg_max(value, event_id) END AS r_value
        FROM e WHERE event_type = 'view'
        GROUP BY user_id, ts_us
    )
    SELECT l.event_id AS click_id,
           l.user_id,
           l.ts_us AS click_ts_us,
           r0.r_event_id,
           r0.r_value,
           r0.r_ts,
           r0.r_ts - l.ts_us AS gap_us
    FROM l ASOF LEFT JOIN r0
      ON l.user_id = r0.user_id AND l.ts_us <= r0.r_ts
"""


@register("temporal_asof_forward", oracle=_ASOF_FWD_ORACLE)
def temporal_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click matched to the user's EARLIEST later
    (or simultaneous) view — the window formulation with the sort order
    flipped. Every 10th view's value is nulled on BOTH sides so the oracle
    also pins the struct-carry semantics: the matched row's legitimately
    NULL value must come through as NULL, never backfilled from another
    right row (pandas merge_asof / DuckDB ASOF contract)."""
    from fs2_osm_spark.operators.temporal import asof_join

    e = _events_us(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts_us").alias("click_ts_us"),
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts_us")
        .agg(
            F.max("event_id").alias("event_id"),
            F.when(
                F.max("event_id") % 10 != 0, F.max_by("value", "event_id")
            ).alias("value"),
        )
    )
    out = asof_join(
        clicks, views, "user_id", "click_ts_us", "ts_us",
        right_cols=["event_id", "value"],
        direction="forward",
    )
    return out.select(
        "click_id",
        "user_id",
        "click_ts_us",
        F.col("r_event_id"),
        F.col("r_value"),
        F.col("r_ts"),
        (F.col("r_ts") - F.col("click_ts_us")).alias("gap_us"),
    )


_RANGE_ORACLE = f"""
    WITH e AS (
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
        FROM events
    ),
    l AS (
        SELECT user_id, event_id AS id, ts_us AS start,
               ts_us + (1 + event_id % 5) * {_MIN_US} AS "end"
        FROM e WHERE event_type = 'click'
    ),
    r AS (
        SELECT user_id, event_id AS id, ts_us AS start,
               ts_us + (1 + event_id % 7) * {_MIN_US} AS "end"
        FROM e WHERE event_type = 'view'
    )
    SELECT l.id AS l_id, r.id AS r_id,
           least(l."end", r."end") - greatest(l.start, r.start) AS overlap
    FROM l JOIN r
      ON l.user_id = r.user_id
     AND l.start <= r."end" AND r.start <= l."end"
"""


@register("temporal_range_join", oracle=_RANGE_ORACLE)
def temporal_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: click sessions [ts, ts + 1-5 min] x view
    sessions [ts, ts + 1-7 min] per user. Spark side = bin-and-refine
    blocking (5-minute bins, equi-join on (user, bin), exact inequality
    refine, pair dedupe); oracle = DuckDB's plain inequality join."""
    from fs2_osm_spark.operators.temporal import interval_overlap_join

    e = _events_us(spark, sf_dir)

    def intervals(etype: str, mod: int) -> DataFrame:
        return e.filter(F.col("event_type") == etype).select(
            "user_id",
            F.col("event_id").alias("id"),
            F.col("ts_us").alias("start"),
            (F.col("ts_us") + (1 + F.col("event_id") % mod) * _MIN_US).alias("end"),
        )

    out = interval_overlap_join(
        intervals("click", 5), intervals("view", 7),
        key_col="user_id", bin_width=5 * _MIN_US,
    )
    return out.select("l_id", "r_id", "overlap")


_GAPFILL_ORACLE = """
    WITH hourly AS (
        SELECT user_id,
               CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
               arg_max(value, event_id) AS v
        FROM events GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_id, min(h) AS h_lo, max(h) AS h_hi FROM hourly
        GROUP BY user_id
    ),
    grid AS (
        SELECT s.user_id, CAST(t.g AS BIGINT) AS h
        FROM spans s, unnest(range(s.h_lo, s.h_hi + 3600, 3600)) AS t(g)
    ),
    joined AS (
        SELECT g.user_id, g.h, hr.v
        FROM grid g LEFT JOIN hourly hr
          ON hr.user_id = g.user_id AND hr.h = g.h
    )
    SELECT user_id, h AS hour_epoch,
           CAST(round(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS UNBOUNDED PRECEDING), 4) AS DOUBLE) AS value_locf,
           v IS NULL AS is_gap
    FROM joined
"""


@register("temporal_gapfill_locf", oracle=_GAPFILL_ORACLE)
def temporal_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + last-observation-carried-forward (r06) — the
    hypertable regularization op: per user, an HOURLY grid spans their
    observed range (sequence + explode, distributed per key — no global
    grid materialization), hourly observations left-join onto it, and
    LOCF fills gaps with a per-key ordered window (bounded state: one
    partition per user). is_gap marks synthesized rows. The oracle
    re-derives grid + fill with generate_series and an IGNORE NULLS
    window in DuckDB."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "value",
            "event_id",
        )
        .groupBy(
            "user_id",
            F.date_trunc("hour", "ts").cast("long").alias("h"),
        )
        .agg(F.max_by("value", "event_id").alias("v"))
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h_lo"), F.max("h").alias("h_hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h_lo"), F.col("h_hi"), F.lit(3600))
        ).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour_epoch"),
        F.round(F.last("v", ignorenulls=True).over(w), 4)
        .cast("double")
        .alias("value_locf"),
        F.col("v").isNull().alias("is_gap"),
    )
