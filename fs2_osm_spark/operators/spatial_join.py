"""Point-in-polygon spatial joins — the engine's core operator.

Two physical strategies, chosen by polygon-corpus size (SURVEY.md §4.2):

1. broadcast_pip_join — small corpus: the PolygonSet (packed coord arrays +
   bboxes) is broadcast to executors; each Arrow batch is tested with the
   vectorized ray-cast kernel inside mapInPandas. One narrow stage, no
   shuffle of the point side at all. This replaces the reference's
   per-relation correlated PostGIS lookups
   (/root/reference/postgres/src/main/scala/fs2/osm/postgres/ComplexPolygonBuilder.scala:52-56)
   with a set-based, shuffle-free pass.

2. cell_pip_join — large corpus: polygons are pre-exploded to covering hex
   cells, points keyed by the same cell; an equi-join on cell id produces
   candidates, refined by the exact kernel. Both sides shuffle-partition on
   the cell key, so the join is a plain sort-merge/shuffled-hash equi-join
   that AQE can skew-split; hot cells can additionally be salted (see
   operators/skew.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fs2_osm_spark.functions.hex import hex_cell, hex_cell_np, hex_size
from fs2_osm_spark.functions.pip import PolygonSet, polygon_contains


def broadcast_pip_join(
    points: DataFrame,
    polygons: PolygonSet,
    lon_col: str,
    lat_col: str,
    keep_cols: list[str],
) -> DataFrame:
    """Inner join points->polygons; output keep_cols + polygon_id (bigint).

    A point inside k overlapping polygons yields k rows (same as SQL
    ST_Contains join semantics).
    """
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(polygons)

    in_cols = list(dict.fromkeys(keep_cols + [lon_col, lat_col]))
    out_schema = T.StructType(
        [points.schema[c] for c in keep_cols]
        + [T.StructField("polygon_id", T.LongType(), False)]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ps = bc.value
        for pdf in batches:
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            pt_idx, poly_id = ps.match(px, py)
            out = pdf.iloc[pt_idx][keep_cols].copy()
            out["polygon_id"] = poly_id.astype(np.int64)
            yield out

    return points.select(*in_cols).mapInPandas(fn, out_schema)


def polygons_to_cells(
    polygons: DataFrame,
    id_col: str,
    outer_col: str,
    res: int,
) -> DataFrame:
    """Explode each polygon into the hex cells covering its bbox.

    Output: (polygon_id, cell). Coarse cover (bbox, not exact rasterize) —
    false positives are removed by the exact refine step. Runs as a
    pandas-vectorized flatMap; output size is sum of per-polygon cover
    sizes, so choose res such that typical polygon span / hex size is small.
    """
    out_schema = T.StructType(
        [
            T.StructField("polygon_id", T.LongType(), False),
            T.StructField("cell", T.LongType(), False),
        ]
    )
    size = hex_size(res)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            cells: list[int] = []
            for pid, packed in zip(pdf[id_col], pdf[outer_col]):
                ring = np.asarray(packed, np.float64)
                xs, ys = ring[0::2], ring[1::2]
                # sample the bbox on a grid finer than the hex pitch, map to
                # cells, dedupe — guaranteed superset of intersecting cells
                # when step < inradius (sqrt(3)/2 * size).
                step = size * 0.8
                gx = np.arange(xs.min() - size, xs.max() + size + step, step)
                gy = np.arange(ys.min() - size, ys.max() + size + step, step)
                mx, my = np.meshgrid(gx, gy)
                cc = np.unique(hex_cell_np(mx.ravel(), my.ravel(), res))
                ids.extend([int(pid)] * len(cc))
                cells.extend(cc.tolist())
            yield pd.DataFrame({"polygon_id": ids, "cell": cells})

    return polygons.select(id_col, outer_col).mapInPandas(fn, out_schema)


def cell_pip_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int,
    lon_col: str,
    lat_col: str,
    point_keep: list[str],
    polygon_id_col: str = "polygon_id",
    outer_col: str = "outer",
    inners_col: str | None = "inners",
) -> DataFrame:
    """Large-corpus PIP: cell-keyed equi-join + exact refine.

    points:   ... lon, lat
    polygons: polygon_id, outer (array<double>), [inners array<array<double>>]

    Plan shape: both sides get a `cell` key (pure Column math on the point
    side), equi-join on cell (shuffle partitioned by cell — AQE skew-split
    applies), then a vectorized exact ray-cast refine via mapInPandas.
    Duplicate (point, polygon) candidates from multi-cell polygons are
    impossible: a point belongs to exactly one cell.
    """
    pts = points.withColumn("cell", hex_cell(F.col(lon_col), F.col(lat_col), res))
    poly_cells = polygons_to_cells(polygons, polygon_id_col, outer_col, res)

    sel = [polygons[polygon_id_col].alias("polygon_id"), polygons[outer_col].alias("outer")]
    if inners_col is not None and inners_col in polygons.columns:
        sel.append(polygons[inners_col].alias("inners"))
    else:
        sel.append(F.array().cast("array<array<double>>").alias("inners"))
    poly_geo = polygons.select(*sel)

    cand = (
        pts.join(poly_cells, "cell")
        .join(poly_geo, "polygon_id")
        .select(*point_keep, lon_col, lat_col, "polygon_id", "outer", "inners")
    )

    out_schema = T.StructType(
        [points.schema[c] for c in point_keep]
        + [T.StructField("polygon_id", T.LongType(), False)]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            px = pdf[lon_col].to_numpy(np.float64)
            py = pdf[lat_col].to_numpy(np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            # group rows by polygon so each ring is tested vectorized over
            # all its candidate points
            for pid, grp in pdf.groupby("polygon_id", sort=False):
                idx = grp.index.to_numpy()
                loc = pdf.index.get_indexer(idx)
                outer = np.asarray(grp["outer"].iloc[0], np.float64)
                raw_inners = grp["inners"].iloc[0]
                # arrives as a numpy object array from Arrow — no `or []`
                # (truth value of an array is ambiguous)
                inners = [
                    np.asarray(h, np.float64)
                    for h in (raw_inners if raw_inners is not None else [])
                ]
                keep[loc] = polygon_contains(outer, inners, px[loc], py[loc])
            out = pdf.loc[keep, point_keep + ["polygon_id"]]
            yield out

    return cand.mapInPandas(refine, out_schema)
