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


def _geom_stats_oracle() -> str:
    """Independent SQL re-derivation of the packed-array geometry kernels
    over the staged OSM fixture: haversine length (lead-window pairwise),
    signed shoelace area and vertex-mean centroid with the closure vertex
    dropped (exact-double first==last, as the numpy kernels do), n_points.
    n_points_simplified is the one recorded column (Douglas-Peucker is
    iterative — no SQL twin), staged driver-side into geom_extra.parquet."""
    from fs2_osm_spark.functions.geom_ops import EARTH_RADIUS_M
    from fs2_osm_spark.synth.staging import osm_fixture_path

    return f"""
    WITH pts AS (
        SELECT wn.way_id, wn.idx, n.lon, n.lat,
               lead(n.lon) OVER w AS nlon,
               lead(n.lat) OVER w AS nlat,
               row_number() OVER w AS rn,
               count(*) OVER (PARTITION BY wn.way_id) AS n_pts,
               first_value(n.lon) OVER w AS flon,
               first_value(n.lat) OVER w AS flat
        FROM read_parquet('{osm_fixture_path("ways_nodes")}') wn
        JOIN read_parquet('{osm_fixture_path("nodes")}') n
          ON wn.node_id = n.osm_id
        WINDOW w AS (PARTITION BY wn.way_id ORDER BY wn.idx)
    ),
    len AS (
        SELECT way_id,
               coalesce(sum(
                   2.0 * {EARTH_RADIUS_M} * asin(sqrt(
                       pow(sin((radians(nlat) - radians(lat)) / 2), 2)
                       + cos(radians(lat)) * cos(radians(nlat))
                         * pow(sin((radians(nlon) - radians(lon)) / 2), 2)
                   ))
               ), 0.0) AS length_m
        FROM pts WHERE nlon IS NOT NULL GROUP BY way_id
    ),
    -- drop the closing vertex iff first == last EXACTLY (numpy kernels'
    -- rule) before area/centroid; re-wrap the shoelace with first_value
    kept AS (
        SELECT * FROM pts
        WHERE NOT (n_pts >= 2 AND rn = n_pts AND lon = flon AND lat = flat)
    ),
    ring AS (
        SELECT way_id, lon, lat,
               coalesce(lead(lon) OVER w2, first_value(lon) OVER w2) AS wlon,
               coalesce(lead(lat) OVER w2, first_value(lat) OVER w2) AS wlat,
               count(*) OVER (PARTITION BY way_id) AS m
        FROM kept
        WINDOW w2 AS (PARTITION BY way_id ORDER BY idx)
    ),
    geo AS (
        SELECT way_id,
               CASE WHEN max(m) >= 3
                    THEN 0.5 * sum(lon * wlat - wlon * lat)
                    ELSE 0.0 END AS area_deg2,
               avg(lon) AS centroid_lon,
               avg(lat) AS centroid_lat
        FROM ring GROUP BY way_id
    ),
    np AS (SELECT way_id, CAST(max(n_pts) AS BIGINT) AS n_points FROM pts GROUP BY way_id)
    SELECT np.way_id,
           CAST(round(coalesce(len.length_m, 0.0), 4) AS DOUBLE) AS length_m,
           CAST(round(geo.area_deg2, 9) AS DOUBLE) AS area_deg2,
           CAST(round(geo.centroid_lon, 6) AS DOUBLE) AS centroid_lon,
           CAST(round(geo.centroid_lat, 6) AS DOUBLE) AS centroid_lat,
           np.n_points,
           CAST(ge.n_points_simplified AS BIGINT) AS n_points_simplified
    FROM np
    LEFT JOIN len USING (way_id)
    JOIN geo USING (way_id)
    JOIN read_parquet('{osm_fixture_path("geom_extra")}') ge USING (way_id)
    """


@register("geom_stats_osm_lines", oracle=_geom_stats_oracle())
def geom_stats_osm_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-array geometry kernel pass (length/area/centroid/simplify)
    over assembled osm_lines. Hard-oracled (r05): DuckDB recomputes
    haversine length, signed shoelace area, and the closure-dropping
    centroid independently from the staged fixture tables;
    n_points_simplified joins the staged driver-side Douglas-Peucker
    column. Kernel invariants stay pytest-pinned."""
    from fs2_osm_spark.functions.geom_ops import geometry_stats
    from fs2_osm_spark.operators.assembly import build_osm_lines
    from fs2_osm_spark.synth.osm import osm_tables
    from fs2_osm_spark.synth.staging import ensure_osm_fixture

    ensure_osm_fixture(spark)
    t = osm_tables(spark, 256)
    lines = build_osm_lines(t["ways"], t["nodes"])
    st = geometry_stats(lines)
    return st.select(
        "way_id",
        F.round("length_m", 4).cast("double").alias("length_m"),
        F.round("area_deg2", 9).cast("double").alias("area_deg2"),
        F.round("centroid_lon", 6).cast("double").alias("centroid_lon"),
        F.round("centroid_lat", 6).cast("double").alias("centroid_lat"),
        F.col("n_points").cast("bigint").alias("n_points"),
        F.col("n_points_simplified").cast("bigint").alias("n_points_simplified"),
    )


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
