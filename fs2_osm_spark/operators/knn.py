"""Geospatial kNN: hex k-ring candidate expansion + haversine refine + top-k.

The north-rule operator (SURVEY.md §4.2): instead of a cross join, target
points are bucketed by hex cell and each query point expands its cell to the
k-ring — candidate generation is an equi-join on cell id (array join via
explode), refinement is pure Column haversine, selection is the window
top-k. Ring radius pairs with the hex resolution: targets farther than one
ring are farther than one hex inradius, so with ring >= ceil(search_radius /
inradius) the result equals the exact kNN whenever enough candidates exist
in the ring (the test pins this against the brute-force oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fs2_osm_spark.functions.geo import haversine_m
from fs2_osm_spark.functions.hex import hex_cell, hex_cell_ea, hex_kring


def knn_kring(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    res: int = 7,
    ring: int = 2,
    query_id_col: str = "query_id",
    target_id_col: str = "target_id",
    equal_area: bool = False,
) -> DataFrame:
    """queries(query_id, lon, lat) x targets(target_id, lon, lat)
    -> (query_id, rank, target_id, dist_m) with rank <= k.

    Plan: targets keyed by their cell (one shuffle); queries explode their
    k-ring (3r²+3r+1 literal offsets, pure Column math) and equi-join on
    cell. Incomplete results (query in a sparse region) are a recall/ring
    trade-off, exactly like IVF n_probe.

    Grid choice: the default planar grid's east-west GROUND coverage per
    ring shrinks by cos(lat) — fine inside a narrow latitude band, but the
    effective search radius varies on globally-spread data. equal_area=True
    indexes on the lon*cos(lat) grid (hex_cell_ea): k-ring offsets are the
    same axial lattice, and the ring's ground radius stays ~uniform across
    latitudes. Refinement is exact haversine either way, so the grid only
    affects candidate recall, never the distances."""
    cell_of = hex_cell_ea if equal_area else hex_cell
    t = targets.select(
        F.col(target_id_col),
        F.col("lon").alias("t_lon"),
        F.col("lat").alias("t_lat"),
        cell_of(F.col("lon"), F.col("lat"), res).alias("cell"),
    )
    # materialize the cell id once before expanding the ring: hex_kring adds
    # 3r²+3r+1 literal offsets, and inlining hex_cell would replicate its
    # whole expression tree per offset (codegen blowup)
    q = queries.select(
        F.col(query_id_col),
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
        cell_of(F.col("lon"), F.col("lat"), res).alias("cell0"),
    ).select(
        query_id_col,
        "q_lon",
        "q_lat",
        F.explode(hex_kring(F.col("cell0"), ring)).alias("cell"),
    )
    dist = haversine_m(F.col("q_lon"), F.col("q_lat"), F.col("t_lon"), F.col("t_lat"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.round(dist, 3), F.col(target_id_col)
    )
    return (
        q.join(t, "cell")
        .select(
            query_id_col,
            F.row_number().over(w).cast("bigint").alias("rank"),
            F.col(target_id_col),
            F.round(dist, 3).alias("dist_m"),
        )
        .filter(F.col("rank") <= k)
    )


def knn_brute_force(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    target_id_col: str = "target_id",
) -> DataFrame:
    """Exact kNN by cross join — the correctness oracle for knn_kring."""
    t = targets.select(
        F.col(target_id_col),
        F.col("lon").alias("t_lon"),
        F.col("lat").alias("t_lat"),
    )
    q = queries.select(
        F.col(query_id_col), F.col("lon").alias("q_lon"), F.col("lat").alias("q_lat")
    )
    dist = haversine_m(F.col("q_lon"), F.col("q_lat"), F.col("t_lon"), F.col("t_lat"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.round(dist, 3), F.col(target_id_col)
    )
    return (
        q.crossJoin(t)
        .select(
            query_id_col,
            F.row_number().over(w).cast("bigint").alias("rank"),
            F.col(target_id_col),
            F.round(dist, 3).alias("dist_m"),
        )
        .filter(F.col("rank") <= k)
    )
