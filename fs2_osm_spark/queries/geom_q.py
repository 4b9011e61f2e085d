"""Geometry scalar queries (ST_Length / ST_Centroid / ST_Area / ST_Simplify
equivalents). Column formulations are oracled via identical lag-window SQL;
the packed-array kernel pass over real OSM lines is rows-only with
invariants pinned in tests/test_geom_ops.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fs2_osm_spark.functions import geo
from fs2_osm_spark.io import load
from fs2_osm_spark.queries.registry import register

_px = geo.synth_lon_sql("l_partkey")
_py = geo.synth_lat_sql("l_partkey")
_seg = geo.haversine_m_sql("lag_x", "lag_y", "x", "y")


@register(
    "geom_line_length",
    oracle=f"""
    WITH pts AS (
        SELECT l_orderkey AS order_id,
               {_px} AS x, {_py} AS y,
               lag({_px}) OVER w AS lag_x,
               lag({_py}) OVER w AS lag_y
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
    )
    SELECT order_id,
           CAST(round(sum(CASE WHEN lag_x IS NULL THEN 0.0 ELSE {_seg} END), 3)
                AS DOUBLE) AS length_m,
           CAST(count(*) AS BIGINT) AS n_pts
    FROM pts GROUP BY order_id
    """,
)
def geom_line_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Length over the per-order polyline (ordered synth points):
    haversine sum of consecutive segments via a lag window."""
    li = load(spark, sf_dir, "lineitem")
    x = geo.synth_lon(F.col("l_partkey"))
    y = geo.synth_lat(F.col("l_partkey"))
    pts = li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber"),
        F.col("l_partkey"),
        x.alias("x"),
        y.alias("y"),
    )
    w = Window.partitionBy("order_id").orderBy("l_linenumber", "l_partkey")
    pts = pts.select(
        "order_id",
        "x",
        "y",
        F.lag("x").over(w).alias("lag_x"),
        F.lag("y").over(w).alias("lag_y"),
    )
    seg = geo.haversine_m(F.col("lag_x"), F.col("lag_y"), F.col("x"), F.col("y"))
    return pts.groupBy("order_id").agg(
        F.round(F.sum(F.when(F.col("lag_x").isNull(), 0.0).otherwise(seg)), 3)
        .cast("double")
        .alias("length_m"),
        F.count(F.lit(1)).alias("n_pts"),
    )


@register(
    "geom_centroid",
    oracle=f"""
    SELECT l_orderkey AS order_id,
           CAST(round(avg({_px}), 6) AS DOUBLE) AS centroid_lon,
           CAST(round(avg({_py}), 6) AS DOUBLE) AS centroid_lat
    FROM lineitem GROUP BY l_orderkey
    """,
)
def geom_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = geo.synth_lon(F.col("l_partkey"))
    y = geo.synth_lat(F.col("l_partkey"))
    return li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.round(F.avg(x), 6).cast("double").alias("centroid_lon"),
        F.round(F.avg(y), 6).cast("double").alias("centroid_lat"),
    )


@register("geom_stats_osm_lines", oracle=None)
def geom_stats_osm_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-array geometry kernel pass (length/area/centroid/simplify)
    over assembled osm_lines — rows-only; kernel invariants are pytest-pinned."""
    from fs2_osm_spark.functions.geom_ops import geometry_stats
    from fs2_osm_spark.operators.assembly import build_osm_lines
    from fs2_osm_spark.synth.osm import osm_tables

    t = osm_tables(spark, 256)
    lines = build_osm_lines(t["ways"], t["nodes"])
    return geometry_stats(lines)


@register(
    "geom_polygon_area",
    oracle=f"""
    WITH pts AS (
        SELECT l_orderkey AS order_id,
               {_px} AS x, {_py} AS y,
               lag({_px}) OVER w AS lag_x,
               lag({_py}) OVER w AS lag_y,
               CAST(row_number() OVER w AS BIGINT) AS rn
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey)
    )
    SELECT order_id,
           CAST(round(abs(
               sum(CASE WHEN lag_x IS NULL THEN 0.0
                        ELSE lag_x * y - x * lag_y END)
               + max_by(x, rn) * min_by(y, rn)
               - min_by(x, rn) * max_by(y, rn)
           ) / 2, 9) AS DOUBLE) AS area_deg2,
           CAST(count(*) AS BIGINT) AS n_vertices
    FROM pts GROUP BY order_id
    """,
)
def geom_polygon_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Area (planar shoelace) over the per-order ring: cyclic cross-term
    sum via a lag window plus the closing edge from the ordered first/last
    vertices — the same formula operators/assembly.py::ring_area applies to
    packed rings during multipolygon hole assignment."""
    li = load(spark, sf_dir, "lineitem")
    x = geo.synth_lon(F.col("l_partkey"))
    y = geo.synth_lat(F.col("l_partkey"))
    w = Window.partitionBy("order_id").orderBy("l_linenumber", "l_partkey")
    pts = li.select(
        F.col("l_orderkey").alias("order_id"),
        "l_linenumber",
        "l_partkey",
        x.alias("x"),
        y.alias("y"),
    ).select(
        "order_id",
        "x",
        "y",
        F.lag("x").over(w).alias("lag_x"),
        F.lag("y").over(w).alias("lag_y"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )
    cross = F.when(
        F.col("lag_x").isNull(), F.lit(0.0)
    ).otherwise(F.col("lag_x") * F.col("y") - F.col("x") * F.col("lag_y"))
    return pts.groupBy("order_id").agg(
        F.round(
            F.abs(
                F.sum(cross)
                + F.max_by("x", "rn") * F.min_by("y", "rn")
                - F.min_by("x", "rn") * F.max_by("y", "rn")
            )
            / 2,
            9,
        )
        .cast("double")
        .alias("area_deg2"),
        F.count(F.lit(1)).alias("n_vertices"),
    )
