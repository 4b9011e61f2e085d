"""Lakehouse table-evolution operations (r07): schema evolution on read and
incremental materialized-view refresh.

The reference writes into Postgres and gets ALTER TABLE + trigger-style
refresh from the database; a lake-table engine must provide both itself.
Both queries follow the staging conventions of table_compaction: temp
trees are removed after the result is materialized, and the DuckDB twin
re-derives the answer from the raw source tables so a lost column, a
double-counted delta, or a stale MV row breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_osm_spark.io import load
from fs2_osm_spark.queries.registry import register


@register(
    "table_schema_evolution",
    oracle="""
    SELECT coalesce(CASE WHEN o_orderkey % 2 = 0 THEN NULL
                         ELSE o_orderpriority END, '<pre-evolution>')
               AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY 1
    """,
)
def table_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: a table whose OLDER files predate a column
    addition (even keys written with 2 columns, odd keys with 3) is read
    back through parquet schema merging — pre-evolution rows surface the
    added column as NULL, no rewrite of old files. The aggregate over the
    merged read is re-derived by the oracle from the source table with the
    same even/odd split, so dropped rows, a lost column, or misaligned
    merge-by-name all break the hash. (Spark reads `mergeSchema=true`;
    file-footer schemas differ per file, which is exactly the state a
    long-lived 100 TB table is in after any ALTER TABLE ADD COLUMN.)"""
    import shutil
    import tempfile

    orders = load(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="schema_evo_")
    try:
        v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        )
        v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        v1.write.mode("overwrite").parquet(f"{root}/v1")
        v2.write.mode("overwrite").parquet(f"{root}/v2")
        merged = spark.read.option("mergeSchema", "true").parquet(
            f"{root}/v1", f"{root}/v2"
        )
        pdf = (
            merged.groupBy(
                F.coalesce(
                    F.col("o_orderpriority"), F.lit("<pre-evolution>")
                ).alias("priority")
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_orderkey").cast("bigint").alias("key_sum"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "priority string, n_orders long, key_sum long"
    )


MV_CUTOFF = "2024-01-24 00:00:00"


@register(
    "mv_incremental_refresh",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(value), 4) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: a per-user (count, sum) MV is
    built from events BEFORE the cutoff and persisted as a lake table;
    the refresh then aggregates ONLY the delta (ts >= cutoff — the filter
    is pushed to the parquet scan, so the base range's row groups are
    skipped by footer stats) and merges it with the stored MV by unioning
    partial aggregates — count/sum are decomposable, so merge = one more
    groupBy over MV ∪ delta-agg rows, never a rescan of history. The
    oracle recomputes every user's totals from the FULL events table, so
    double-counted deltas, missed users, or stale MV rows break the hash.
    At 100 TB this is the nightly-refresh pattern: cost tracks the delta,
    not the table."""
    import shutil
    import tempfile

    from fs2_osm_spark.catalog import read_table, swap_durable_result, write_table

    events = load(spark, sf_dir, "events")
    # match the column's own timestamp flavor (events.ts is TIMESTAMP_NTZ)
    cutoff = F.lit(MV_CUTOFF).cast(events.schema["ts"].dataType)
    mv_path = tempfile.mkdtemp(prefix="mv_state_")
    try:
        # day-1 build: everything before the cutoff, persisted as the MV
        base_agg = (
            events.filter(F.col("ts") < cutoff)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            )
        )
        write_table(base_agg, mv_path)

        # refresh: aggregate the DELTA only, merge partials with the MV
        delta_agg = (
            events.filter(F.col("ts") >= cutoff)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
            )
        )
        refreshed = (
            read_table(spark, mv_path)
            .unionByName(delta_agg)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").cast("bigint").alias("n_events"),
                F.round(F.sum("total_value"), 4)
                .cast("double")
                .alias("total_value"),
            )
        )
        # durable-table swap (NOT toPandas: the refreshed MV is
        # user-cardinality — unbounded at scale — so it must land
        # distributed; the returned plan is a plain scan of the new MV)
        out = swap_durable_result(refreshed, "mv_incremental_refresh")
    finally:
        shutil.rmtree(mv_path, ignore_errors=True)
    return out