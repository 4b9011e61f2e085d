"""Lakehouse evolution queries: plan shape + structural checks the DuckDB
oracles cannot express (the oracle verifies VALUES; these pin that the
incremental path is actually incremental and the merged read actually
merges schemas)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_mv_refresh_delta_scan_is_pushed_down(spark):
    """The refresh's events scan must carry the ts >= cutoff predicate in
    PushedFilters — the proof the nightly refresh reads the delta range's
    row groups only, never rescanning history."""
    from fs2_osm_spark.io import load
    from fs2_osm_spark.queries.lakehouse import MV_CUTOFF

    events = load(spark, SF_SMOKE, "events")
    cutoff = F.lit(MV_CUTOFF).cast(events.schema["ts"].dataType)
    delta_agg = (
        events.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    plan = delta_agg._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts" in plan, plan


def test_schema_evolution_merged_read_has_both_eras(spark):
    """The registered query's merged table must contain a NULL-priority
    group exactly as large as the pre-evolution file set."""
    from fs2_osm_spark.queries.registry import QUERIES

    rows = {
        r.priority: (r.n_orders, r.key_sum)
        for r in QUERIES["table_schema_evolution"].fn(spark, SF_SMOKE).collect()
    }
    assert "<pre-evolution>" in rows, rows
    n_pre = rows["<pre-evolution>"][0]
    n_post = sum(n for p, (n, _) in rows.items() if p != "<pre-evolution>")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert n_pre == orders.filter(F.col("o_orderkey") % 2 == 0).count()
    assert n_post == orders.filter(F.col("o_orderkey") % 2 == 1).count()
