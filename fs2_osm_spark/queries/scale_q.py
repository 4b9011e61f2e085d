"""Scale-layer queries: explicit salting and Hilbert range partitioning.

The salted plans must produce EXACTLY the unsalted results — the oracle is
the plain GROUP BY / plain join. The Hilbert key is checked against the
same nested-subquery transform executed by DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_osm_spark.functions import geo
from fs2_osm_spark.io import load
from fs2_osm_spark.operators.partitioning import hilbert_sql_layers
from fs2_osm_spark.operators.skew import salted_broadcast_join, salted_count_sum
from fs2_osm_spark.queries.registry import register


@register(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS s
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a 3-value (maximally hot) key —
    result must equal the plain groupBy."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), "l_quantity", "l_orderkey"
    )
    out = salted_count_sum(
        li, ["flag"], "l_quantity", identity_col="l_orderkey", salt_factor=8
    )
    return out.select("flag", "n", F.round("s", 2).cast("double").alias("s"))


@register(
    "skew_salted_join",
    oracle="""
    SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_cust,
           CAST(round(sum(c.c_acctbal), 2) AS DOUBLE) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join (hot probe key spread over 8 replicas) — result
    must equal the plain equi-join."""
    cust = load(spark, sf_dir, "customer").withColumn(
        "key", F.col("c_nationkey").cast("bigint")
    )
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("key"), "n_name"
    )
    joined = salted_broadcast_join(
        cust, nation, "key", salt_factor=8, identity_col="c_custkey"
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).cast("double").alias("total_bal"),
    )


_HILBERT_ORDER = 8
_hx_sql, _hy_sql = geo.tile_xyz_sql(
    geo.synth_lon_sql("o_orderkey"), geo.synth_lat_sql("o_orderkey"), _HILBERT_ORDER
)
_HILBERT_SRC = (
    f"(SELECT o_orderkey AS point_id, {_hx_sql} AS hx, {_hy_sql} AS hy FROM orders)"
)


@register(
    "part_hilbert_key",
    oracle=hilbert_sql_layers(["point_id"], _HILBERT_ORDER).replace(
        "__h0", _HILBERT_SRC, 1
    ),
)
def part_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert key per point (order 8) — the range-partitioning sort key;
    oracle executes the identical nested transform in DuckDB."""
    from fs2_osm_spark.functions.geo import synth_lat, synth_lon, tile_xyz

    orders = load(spark, sf_dir, "orders")
    tx, ty = tile_xyz(
        synth_lon(F.col("o_orderkey")), synth_lat(F.col("o_orderkey")), _HILBERT_ORDER
    )
    base = orders.select(
        F.col("o_orderkey").alias("point_id"), tx.alias("hx"), ty.alias("hy")
    )
    base.createOrReplaceTempView("__h0")
    return spark.sql(hilbert_sql_layers(["point_id"], _HILBERT_ORDER))


_HB_DIV = 1024
_HB_LO, _HB_HI = 10, 13


@register(
    "part_hilbert_pruned_scan",
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs/derived
    # tables, and referencing `hilbert` twice (SELECT + WHERE) through the
    # 8-level nested transform makes the optimizer's expression tree blow
    # up (measured: 0.05s single-reference chain -> >100s wrapped; 0.04s
    # with the materialization barrier).
    oracle=f"""
    WITH keyed AS MATERIALIZED ({hilbert_sql_layers(["point_id"],
        _HILBERT_ORDER).replace("__h0", _HILBERT_SRC, 1)})
    SELECT point_id, CAST(floor(hilbert / {_HB_DIV}) AS BIGINT) AS h_bucket
    FROM keyed
    WHERE CAST(floor(hilbert / {_HB_DIV}) AS BIGINT)
          BETWEEN {_HB_LO} AND {_HB_HI}
    """,
)
def part_hilbert_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAYOUT half of Hilbert partitioning (r06): write the point set
    as a Hilbert-bucket-partitioned parquet table (hive h_bucket= dirs),
    then read back one contiguous bucket range — the filter is a
    partition-column predicate, so the scan prunes at file-listing time
    (tests/test_scale_operators.py asserts inputFiles shrink and the plan
    carries the PartitionFilters entry). The oracle re-derives every
    point's bucket arithmetically in DuckDB and applies the same range, so
    a mis-bucketed write OR an over/under-pruned read breaks the hash."""
    import shutil
    import tempfile

    from fs2_osm_spark.catalog import swap_durable_result
    from fs2_osm_spark.functions.geo import synth_lat, synth_lon
    from fs2_osm_spark.operators.partitioning import (
        read_hilbert_bucket_range,
        write_hilbert_clustered,
    )

    orders = load(spark, sf_dir, "orders")
    pts = orders.select(
        F.col("o_orderkey").alias("point_id"),
        synth_lon(F.col("o_orderkey")).alias("lon"),
        synth_lat(F.col("o_orderkey")).alias("lat"),
    )
    path = tempfile.mkdtemp(prefix="hilbert_layout_")
    try:
        write_hilbert_clustered(
            pts, path, "lon", "lat", _HILBERT_ORDER, ["point_id"],
            bucket_div=_HB_DIV,
        )
        # materialize the pruned slice DISTRIBUTED (durable-table swap, the
        # stream_cdc_state pattern) before removing the staged layout the
        # plan reads from — r07 round-tripped it through toPandas(), a
        # driver-side collect of a data-cardinality result. The pruned-scan
        # PLAN shape — PartitionFilters, shrunken inputFiles — stays pinned
        # by tests/test_scale_operators.py on the operator itself.
        out = swap_durable_result(
            read_hilbert_bucket_range(spark, path, _HB_LO, _HB_HI).select(
                "point_id", F.col("h_bucket").cast("bigint").alias("h_bucket")
            ),
            "part_hilbert_pruned_scan",
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out
