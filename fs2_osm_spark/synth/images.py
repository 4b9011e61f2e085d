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


# --- phash near-dup corpus --------------------------------------------------
# aHash only discriminates when block means sit far from the global mean.
# The flagship corpus above shares ONE gradient base across every image
# (measured median pairwise hamming = 3 — phash-hostile by construction), so
# near-dup detection gets its own synthesis: a per-image random 8x8
# dark/bright block pattern (margin +-85 around the global mean) upsampled to
# 32x32 plus low-amplitude noise. Unrelated patterns differ in
# ~Binomial(64, 1/2) hash bits (median 32); each derived variant below stays
# within a few bits of its base, so a hamming threshold of 6 separates the
# classes with enormous margin.

ND_SIZE = 32  # square images; 8x8 aHash blocks = 4x4 px each
ND_DARK, ND_BRIGHT = 40, 210
ND_NOISE = 16  # < half the 85 margin even stacked with +8 brightness
ND_BRIGHTNESS_SHIFT = 8
ND_FLIP_CELLS = 4  # 'fl' variant: exactly 4 hash bits flip
ND_VARIANTS = ("o", "re", "jq", "br", "fl")


def _neardup_streams(i: int) -> tuple[np.ndarray, np.ndarray]:
    """(8x8 0/1 pattern, 32x32x3 noise) for base image i — one seeded
    stream so pattern and noise are jointly reproducible."""
    rng = np.random.default_rng(SEED * 7_000_003 + i)
    pattern = rng.integers(0, 2, size=(8, 8))
    noise = rng.integers(0, ND_NOISE, size=(ND_SIZE, ND_SIZE, 3))
    return pattern, noise


def _pattern_pixels(pattern: np.ndarray, noise: np.ndarray) -> np.ndarray:
    cell = ND_SIZE // 8
    base = np.where(pattern == 1, ND_BRIGHT, ND_DARK)
    img = np.kron(base, np.ones((cell, cell), dtype=np.int64))
    # max ND_BRIGHT + ND_NOISE - 1 + ND_BRIGHTNESS_SHIFT = 233: no clipping
    # anywhere in the corpus, so the brightness variant shifts every block
    # mean AND the global mean by exactly the same amount (phash-invariant).
    return np.clip(img[:, :, None] + noise, 0, 255).astype(np.uint8)


def neardup_batch(ids: np.ndarray) -> pd.DataFrame:
    """5 rows per base id: original, lossless re-encode (byte-identical —
    the classic stored-twice exact dup), default-quality lossy re-encode,
    +8 brightness, and a 4-cell pattern flip (hamming exactly 4, just under
    the threshold). Columns (img_id, src_id, variant, bytes, fmt, phash);
    phash is recorded from the DECODED payload so the committed fixture is
    ground truth for the live decode->hash path."""
    from fs2_osm_spark.codecs.png import decode_image

    rows = []
    for i in ids.tolist():
        pattern, noise = _neardup_streams(i)
        pix = _pattern_pixels(pattern, noise)
        src = f"img_{i:012d}"
        variants = {
            "o": (encode_png(pix), "png"),
            "re": (encode_png(decode_image(encode_png(pix), "png")), "png"),
            "jq": (encode_lossy(pix), "jpeg"),
            "br": (
                encode_png((pix.astype(np.int64) + ND_BRIGHTNESS_SHIFT).astype(np.uint8)),
                "png",
            ),
        }
        flip_rng = np.random.default_rng(SEED * 7_000_003 + i + 500_000_011)
        flip = flip_rng.choice(64, size=ND_FLIP_CELLS, replace=False)
        flipped = pattern.copy().ravel()
        flipped[flip] ^= 1
        variants["fl"] = (encode_png(_pattern_pixels(flipped.reshape(8, 8), noise)), "png")
        for v in ND_VARIANTS:
            payload, fmt = variants[v]
            rows.append(
                (
                    f"{src}~{v}",
                    src,
                    v,
                    payload,
                    fmt,
                    phash64(decode_image(payload, fmt)),
                )
            )
    return pd.DataFrame(
        rows, columns=["img_id", "src_id", "variant", "bytes", "fmt", "phash"]
    )


def neardup_table(
    spark: SparkSession, n_base: int, partitions: int | None = None
) -> DataFrame:
    """Distributed near-dup corpus: 5 variant rows per base id (see
    neardup_batch). Same driver-free generation pattern as images_table —
    row content is a pure function of the base id, so this scales to any
    corpus size at generation parallelism = partitions."""
    parts = partitions or spark.sparkContext.defaultParallelism

    schema = T.StructType(
        [
            T.StructField("img_id", T.StringType(), False),
            T.StructField("src_id", T.StringType(), False),
            T.StructField("variant", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield neardup_batch(pdf["id"].to_numpy(np.int64))

    return spark.range(0, n_base, 1, parts).mapInPandas(gen, schema)
