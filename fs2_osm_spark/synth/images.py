"""Deterministic synthetic image+caption table (BASELINE.json input_hint).

Schema: (image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint).

Generation is id-derived and partition-count-invariant: `spark.range(n)`
feeds mapInPandas, and every field of row i is a pure function of (seed, i)
— integer hashing for placement, a per-row seeded Generator for pixels.
This is the pattern that scales to 10^12 rows on a cluster: no driver-side
materialization, no collect, generation parallelism = partitions.

Spatial distribution exercises the skew machinery: HOT_FRACTION of images
cluster tightly around CITIES (hot hex cells), the rest are uniform in the
polygon-covered extent.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from fs2_osm_spark.codecs.png import encode_lossy, encode_png, phash64

SEED = 42
CITIES = [  # (lon, lat) synthetic hot spots, inside the synthetic polygons
    (10.00, 53.55),
    (13.40, 52.52),
    (8.80, 53.08),
]
HOT_FRACTION = 0.7
CITY_SIGMA = 0.05  # degrees
EXTENT = (7.0, 51.0, 15.0, 55.0)  # lon_min, lat_min, lon_max, lat_max

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """64-bit integer hash (splitmix64 finalizer), deterministic."""
    inc = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))  # wraparound intended
    z = ids.astype(np.uint64) + inc
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _unit(ids: np.ndarray, salt: int) -> np.ndarray:
    """uniform [0,1) doubles from ids."""
    return (_mix(ids, salt) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def coords_for_ids(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lon, lat) per id with hot-cluster skew."""
    u_sel = _unit(ids, 1)
    city_idx = (_mix(ids, 2) % np.uint64(len(CITIES))).astype(np.int64)
    # Box-Muller from two id-derived uniforms for the cluster scatter
    u1 = np.maximum(_unit(ids, 3), 1e-12)
    u2 = _unit(ids, 4)
    r = np.sqrt(-2.0 * np.log(u1)) * CITY_SIGMA
    dx = r * np.cos(2 * np.pi * u2)
    dy = r * np.sin(2 * np.pi * u2)
    clons = np.array([c[0] for c in CITIES])
    clats = np.array([c[1] for c in CITIES])
    hot_lon = clons[city_idx] + dx
    hot_lat = clats[city_idx] + dy
    uni_lon = EXTENT[0] + _unit(ids, 5) * (EXTENT[2] - EXTENT[0])
    uni_lat = EXTENT[1] + _unit(ids, 6) * (EXTENT[3] - EXTENT[1])
    hot = u_sel < HOT_FRACTION
    return np.where(hot, hot_lon, uni_lon), np.where(hot, hot_lat, uni_lat)


def _make_pixels(i: int, w: int, h: int) -> np.ndarray:
    rng = np.random.default_rng(SEED * 1_000_003 + i)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 / max(w - 1, 1)),
            (yy * 255 / max(h - 1, 1)),
            ((xx + yy) * 127 / max(w + h - 2, 1)),
        ],
        axis=2,
    )
    noise = rng.integers(0, 32, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def generate_batch(ids: np.ndarray, slim: bool = False) -> pd.DataFrame:
    lon, lat = coords_for_ids(ids)
    ws = (16 + (_mix(ids, 7) % np.uint64(3)).astype(np.int64) * 8).astype(np.int32)
    hs = (16 + (_mix(ids, 8) % np.uint64(2)).astype(np.int64) * 8).astype(np.int32)
    fmt_png = (_mix(ids, 9) % np.uint64(3)) == 0
    if slim:
        # same schema/metadata, 1-byte pixel payload: for scaling runs whose
        # plans provably never read `bytes` (tests/test_plan_hygiene.py) —
        # full-size payloads would only add I/O noise to the measurement
        return pd.DataFrame(
            {
                "image_id": [f"img_{i:012d}" for i in ids.tolist()],
                "bytes": [b"\x00"] * len(ids),
                "w": ws,
                "h": hs,
                "fmt": np.where(fmt_png, "png", "jpeg"),
                "caption": [
                    f"img {i} taken at {la:.6f},{lo:.6f} near city"
                    for i, la, lo in zip(ids.tolist(), lat.tolist(), lon.tolist())
                ],
                "phash": _mix(ids, 10).astype(np.int64),
            }
        )
    rows = []
    for k, i in enumerate(ids.tolist()):
        img = _make_pixels(i, int(ws[k]), int(hs[k]))
        fmt = "png" if fmt_png[k] else "jpeg"
        payload = encode_png(img) if fmt == "png" else encode_lossy(img)
        caption = f"img {i} taken at {lat[k]:.6f},{lon[k]:.6f} near city"
        rows.append(
            (
                f"img_{i:012d}",
                payload,
                int(ws[k]),
                int(hs[k]),
                fmt,
                caption,
                phash64(img),
            )
        )
    return pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    )


def images_table(
    spark: SparkSession, n: int, partitions: int | None = None, slim: bool = False
) -> DataFrame:
    """Distributed deterministic generation of n images."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield generate_batch(pdf["id"].to_numpy(np.int64), slim=slim)

    return spark.range(0, n, 1, parts).mapInPandas(gen, IMAGES_SCHEMA)
