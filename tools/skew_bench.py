"""Hot-cell skew harness for the cell-keyed PIP join (r07, VERDICT item 4).

The flagship's broadcast path is skew-immune (points never shuffle), but the
large-corpus fallback `cell_pip_join` shuffles BOTH sides on the cell key —
and a real photo corpus is violently hot-celled (everyone photographs the
same landmark). This harness builds a deliberately skewed point set at the
sf0.1 scale — `hot_frac` of all points jittered inside ONE res-8 cell
centred on a polygon interior, the rest spread uniformly over the synthetic
city band — and times the identical shuffle join (auto-broadcast disabled,
the corpus-outgrows-broadcast regime the fallback exists for) with AQE
skew-join splitting ON vs OFF, plus the broadcast flagship path on the same
input as the skew-immune reference. Join rows must be byte-identical across
all three; wall times land in BENCH/skew.json and the BENCH/SKEW.md table.

Run: python tools/skew_bench.py [--cpus 32] [--hot-frac 0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(REPO, "BENCH", "skew.json")

N_POINTS = 16_000_000  # sf0.1 flagship scale
N_ZONES = 5_120


def skewed_points(spark, hot_lon: float, hot_lat: float, hot_frac: float):
    """Deterministic skewed point table: `hot_frac` of ids cluster within
    ~±0.0008° of (hot_lon, hot_lat) — inside one res-8 cell (0.0042°) —
    the rest spread over the synthetic city band EXTENT (7-15E, 51-55N).
    Pure Column math; no Python in the row path."""
    from pyspark.sql import functions as F

    ids = spark.range(0, N_POINTS, 1, 128)
    mod = 1_000_000
    u = (F.col("id") * 2654435761 % mod) / float(mod)  # Knuth-hash uniform
    v = (F.col("id") * 2246822519 % mod) / float(mod)
    is_hot = (F.col("id") % 100) < int(round(hot_frac * 100))
    lon = F.when(is_hot, hot_lon + (u - 0.5) * 0.0016).otherwise(7.0 + u * 8.0)
    lat = F.when(is_hot, hot_lat + (v - 0.5) * 0.0016).otherwise(51.0 + v * 4.0)
    return ids.select(
        F.col("id").alias("image_id"), lon.alias("lon"), lat.alias("lat")
    )


def interior_center(spark, poly_path: str) -> tuple[float, float]:
    """A point safely inside some polygon AND safely inside one res-8 cell:
    start from the vertex-mean of the first polygon's outer ring (synthetic
    zone rectangles are convex, so the mean is interior), then nudge in
    small steps until the whole ±0.0008° jitter box maps to a single hex
    cell — without the snap, a center within 0.0008° of a cell boundary
    splits the hot mass over 2-4 cells and dilutes the single-partition
    skew this harness exists to measure."""
    import numpy as np

    from fs2_osm_spark.functions.hex import hex_cell_np
    from fs2_osm_spark.plans.flagship import JOIN_RES

    row = (
        spark.read.parquet(poly_path)
        .orderBy("polygon_id")
        .select("outer")
        .first()
    )
    ring = np.asarray(row.outer, np.float64).reshape(-1, 2)
    cx, cy = float(ring[:, 0].mean()), float(ring[:, 1].mean())
    j = 0.0008
    for k in range(16):
        lon = cx + (k % 4) * 0.0011
        lat = cy + (k // 4) * 0.0011
        corners_lon = np.array([lon - j, lon + j, lon - j, lon + j, lon])
        corners_lat = np.array([lat - j, lat - j, lat + j, lat + j, lat])
        cells = hex_cell_np(corners_lon, corners_lat, JOIN_RES)
        if len(set(cells.tolist())) == 1:
            return lon, lat
    return cx, cy  # fall back; harness still records whatever skew results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--hot-frac", type=float, default=0.5)
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: F401

    import bench
    from fs2_osm_spark.operators.spatial_join import cell_pip_join
    from fs2_osm_spark.plans.flagship import JOIN_RES, prepare_corpus
    from fs2_osm_spark.session import get_spark

    spark = get_spark(cores=args.cpus, app_name="skew_bench")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _, poly_path = bench.stage_inputs(spark, sf_dir)
    hot_lon, hot_lat = interior_center(spark, poly_path)
    pts = skewed_points(spark, hot_lon, hot_lat, args.hot_frac)
    polys = spark.read.parquet(poly_path)

    # force the shuffle-join regime (at real scale the cover outgrows the
    # broadcast threshold; locally it would auto-broadcast and hide the
    # skew) and keep AQE's split sizes meaningful for a ~300 MB hot cell
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")

    def timed(thunk):
        runs = []
        for _ in range(3):
            t0 = time.time()
            rows = thunk()
            runs.append(round(time.time() - t0, 3))
        return rows, runs[0], min(runs[1:])

    results: dict[str, dict] = {}
    stat0 = bench.read_cpu_stat()
    for setting in ("on", "off"):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if setting == "on" else "false",
        )
        rows, cold, warm = timed(
            lambda: cell_pip_join(
                pts, polys, res=JOIN_RES, lon_col="lon", lat_col="lat",
                point_keep=["image_id"],
            ).count()
        )
        results[f"skew_{setting}"] = {"rows": rows, "cold_sec": cold, "warm_sec": warm}

    # skew-immune reference: broadcast cover path on the SAME skewed input
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    from fs2_osm_spark.operators.spatial_join import apply_cell_pip

    cover = prepare_corpus(spark, polys)
    rows_b, cold_b, warm_b = timed(
        lambda: apply_cell_pip(
            pts, cover, "lon", "lat", ["image_id"]
        ).count()
    )
    results["broadcast_path"] = {"rows": rows_b, "cold_sec": cold_b, "warm_sec": warm_b}
    stat1 = bench.read_cpu_stat()

    rows_set = {v["rows"] for v in results.values()}
    assert len(rows_set) == 1, f"join rows diverged across strategies: {results}"

    out = {
        "n_points": N_POINTS,
        "n_zones": N_ZONES,
        "hot_frac": args.hot_frac,
        "hot_center": [hot_lon, hot_lat],
        "cpus": args.cpus,
        "join_rows": rows_set.pop(),
        "results": results,
        "skew_speedup_warm": round(
            results["skew_off"]["warm_sec"] / results["skew_on"]["warm_sec"], 3
        ),
        "confs": {
            "autoBroadcastJoinThreshold": "-1 (shuffle-join regime)",
            "skewedPartitionThresholdInBytes": "64m",
            "advisoryPartitionSizeInBytes": "16m",
        },
        "host": {
            "steal_pct": (
                round(100.0 * (stat1[1] - stat0[1]) / max(1, stat1[0] - stat0[0]), 2)
                if stat1[0] > stat0[0]
                else None
            ),
            "null_probe_sec": round(bench.null_probe(spark), 3),
        },
    }
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    tmp = OUT_JSON + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, OUT_JSON)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
