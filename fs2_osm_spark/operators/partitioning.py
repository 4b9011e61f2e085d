"""Hilbert-order range partitioning (spatial locality layout).

The north rule calls for range partitioning by Hilbert-sorted cell id:
points that are close on the plane get close Hilbert keys, so
repartitionByRange on the key gives each output partition a spatially
compact extent (better scan pruning + join locality than row-major tile
order, which tears rows at stripe boundaries).

Three consistent implementations of the classic xy2d Hilbert transform
(iterative quadrant rotation over `order` bit levels):
- numpy (hilbert_d_np) — used inside pandas kernels and pinned by tests
  (bijectivity + unit-step adjacency);
- nested-subquery SQL (hilbert_sql_layers) — one subquery per bit level, so
  the expression stays linear in `order`; the same text runs on Spark and
  DuckDB, giving the oracle an exact check;
- the DataFrame entry point hilbert_range_partition built on the SQL form.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_osm_spark.functions.geo import tile_xyz


def hilbert_d_np(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """(x, y) tile coords in [0, 2^order) -> Hilbert distance d.

    Quadrant-local formulation: x,y are reduced into [0, s) before the
    rotation each level, so every intermediate stays nonnegative — making
    the arithmetic portable to SQL (no negative-modulo divergence)."""
    x = np.asarray(x, np.int64).copy()
    y = np.asarray(y, np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (order - 1)
    while s > 0:
        rx = (x >= s).astype(np.int64)
        ry = (y >= s).astype(np.int64)
        x = x - s * rx
        y = y - s * ry
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def hilbert_sql_layers(id_cols: list[str], order: int) -> str:
    """Subquery chain computing `hilbert` from columns hx, hy.

    Wrap around a source alias `__h0` that must SELECT: <id_cols...>, hx, hy
    (with 0 <= hx, hy < 2^order). Uses only +,-,*, %, CASE and integer
    floor-division via CAST(floor(a / b)), portable Spark SQL + DuckDB.
    """
    ids = ", ".join(id_cols)
    sql = "__h0"
    for lvl in range(order):
        s = 1 << (order - 1 - lvl)
        # invariant: 0 <= hx, hy < 2*s entering this level
        rx = f"(CASE WHEN hx >= {s} THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN hy >= {s} THEN 1 ELSE 0 END)"
        lx = f"(hx - {s} * {rx})"
        ly = f"(hy - {s} * {ry})"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
            f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
        )
        flip = f"({ry} = 0 AND {rx} = 1)"
        swap = f"({ry} = 0)"
        x_f = f"(CASE WHEN {flip} THEN {s} - 1 - {lx} ELSE {lx} END)"
        y_f = f"(CASE WHEN {flip} THEN {s} - 1 - {ly} ELSE {ly} END)"
        new_x = f"(CASE WHEN {swap} THEN {y_f} ELSE {x_f} END)"
        new_y = f"(CASE WHEN {swap} THEN {x_f} ELSE {y_f} END)"
        prev = sql if lvl == 0 else f"({sql})"
        base_d = "CAST(0 AS BIGINT)" if lvl == 0 else "d"
        new_d = f"{base_d} + {s} * {s} * {quad}"
        sql = (
            f"SELECT {ids}, {new_x} AS hx, {new_y} AS hy, {new_d} AS d "
            f"FROM {prev}"
        )
    return f"SELECT {ids}, d AS hilbert FROM ({sql})"


def hilbert_range_partition(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    order: int,
    n_partitions: int,
    id_cols: list[str],
) -> DataFrame:
    """Assign hilbert keys (via the shared SQL form) and range-partition."""
    keyed = hilbert_keys(df, lon_col, lat_col, order, id_cols)
    return keyed.repartitionByRange(n_partitions, "hilbert")


def hilbert_keys(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    order: int,
    id_cols: list[str],
) -> DataFrame:
    """Hilbert key per row via the shared SQL form (no repartition)."""
    spark = df.sparkSession
    tx, ty = tile_xyz(F.col(lon_col), F.col(lat_col), order)
    base = df.select(*id_cols, tx.alias("hx"), ty.alias("hy"))
    base.createOrReplaceTempView("__h0")
    return spark.sql(hilbert_sql_layers(id_cols, order))


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    lon_col: str,
    lat_col: str,
    order: int,
    id_cols: list[str],
    bucket_div: int = 1024,
) -> int:
    """Materialize a spatially CLUSTERED layout: rows keyed by Hilbert
    distance, bucketed by `hilbert // bucket_div`, written as one parquet
    partition directory per bucket (hive `h_bucket=` layout). Because the
    Hilbert curve is locality-preserving, a spatial range predicate maps
    to a CONTIGUOUS bucket range, and a reader filtering on h_bucket gets
    partition pruning straight from the file listing — at 100 TB this is
    the difference between listing a few directories and scanning the
    world. Returns the number of buckets written."""
    keyed = hilbert_keys(df, lon_col, lat_col, order, id_cols).withColumn(
        "h_bucket", (F.col("hilbert") / bucket_div).cast("bigint")
    )
    # one shuffle by bucket so each partition dir is written by few tasks
    keyed.repartition("h_bucket").write.partitionBy("h_bucket").mode(
        "overwrite"
    ).parquet(path)
    # bucket count from the WRITTEN layout's file paths (metadata only) —
    # a distinct() over the keyed frame would re-execute the whole
    # tile+hilbert plan a second time just for this number
    spark = df.sparkSession
    paths = spark.read.parquet(path).inputFiles()
    return len({p.split("h_bucket=")[1].split("/")[0] for p in paths})


def read_hilbert_bucket_range(
    spark, path: str, lo: int, hi: int
) -> DataFrame:
    """Scan only the bucket directories in [lo, hi] — the h_bucket filter
    is a partition-column predicate, so Spark prunes at file listing time
    (plan shows it in PartitionFilters; tests assert inputFiles shrink)."""
    df = spark.read.parquet(path)
    return df.filter((F.col("h_bucket") >= lo) & (F.col("h_bucket") <= hi))
