"""Multimodal (image) queries — rows-only driver checks (binary decode is
not expressible in the DuckDB oracle); invariants (PSNR >= 40 dB, caption
equality, phash match) are enforced inside the queries themselves and
asserted in tests/test_images_flagship.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_osm_spark.operators.multimodal import (
    decode_stats,
    geotag,
    pixel_roundtrip,
    resize_block_mean,
)
from fs2_osm_spark.plans.flagship import flagship_query
from fs2_osm_spark.queries.registry import register
from fs2_osm_spark.synth.images import images_table

N_IMAGES = 2_000


@register("img_flagship_spatial_join", oracle=None)
def img_flagship_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geotag -> hex cell -> PIP join -> tile assignment (the north-star
    pipeline end-to-end)."""
    return flagship_query(spark, sf_dir)


@register("img_decode_stats", oracle=None)
def img_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    images = images_table(spark, N_IMAGES)
    return decode_stats(images).filter(F.col("phash_match"))


@register("img_pixel_roundtrip", oracle=None)
def img_pixel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows violating the input_hint invariant would be excluded here, so
    the rows-only count doubles as the PSNR/caption gate (tests assert the
    count equals N)."""
    images = images_table(spark, N_IMAGES)
    rt = pixel_roundtrip(images)
    # lossless rows have psnr = +inf, which satisfies >= 40 as well
    ok = rt.filter(F.col("psnr_db") >= 40.0)
    return ok.select("image_id", "psnr_db", "lossless")


def _geotag_cells_oracle() -> str:
    from fs2_osm_spark.functions.hex import hex_cell_sql
    from fs2_osm_spark.synth.staging import IMAGES_FIXTURE

    return f"""
    WITH pts AS (
        SELECT CAST(regexp_extract(caption, 'at (-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 1)
                    AS DOUBLE) AS lat,
               CAST(regexp_extract(caption, 'at (-?\\d+\\.\\d+),(-?\\d+\\.\\d+)', 2)
                    AS DOUBLE) AS lon
        FROM read_parquet('{IMAGES_FIXTURE}')
    )
    SELECT {hex_cell_sql("lon", "lat", 6)} AS cell,
           CAST(count(*) AS BIGINT) AS n
    FROM pts GROUP BY 1
    """


@register("img_geotag_cells", oracle=_geotag_cells_oracle())
def img_geotag_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption geotag + hex cell histogram — the skew profile of the hot
    cities (drives the salting factor). Hard-oracled: both engines read the
    staged image fixture (synth/staging.py) and evaluate the same regexp +
    formula-identical hex-cell SQL."""
    from fs2_osm_spark.functions.hex import hex_cell
    from fs2_osm_spark.synth.staging import ensure_images_fixture

    images = spark.read.parquet(ensure_images_fixture())
    pts = geotag(images)
    return (
        pts.select(hex_cell(F.col("lon"), F.col("lat"), 6).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _decode_dims_oracle() -> str:
    from fs2_osm_spark.synth.staging import IMAGES_FIXTURE

    return f"""
    SELECT image_id, CAST(w AS BIGINT) AS dec_w, CAST(h AS BIGINT) AS dec_h,
           true AS phash_match
    FROM read_parquet('{IMAGES_FIXTURE}')
    """


@register("img_decode_dims", oracle=_decode_dims_oracle())
def img_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode cross-checked against independent metadata: the Spark
    side DECODES every image (PNG + JQ01 paths) and reports the decoded
    dimensions and phash agreement; the oracle reads the staged fixture's
    stored (w, h) columns and asserts phash_match for every row. A decoder
    that mis-sizes, crops, or distorts any image breaks the value hash.
    (The pixel-mean stats stay rows-only in img_decode_stats — means of
    decoded bytes have no SQL twin.)"""
    from fs2_osm_spark.synth.staging import ensure_images_fixture

    images = spark.read.parquet(ensure_images_fixture())
    return decode_stats(images).select(
        "image_id",
        F.col("dec_w").cast("bigint"),
        F.col("dec_h").cast("bigint"),
        "phash_match",
    )


@register("img_resize", oracle=None)
def img_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    images = images_table(spark, 500)
    return resize_block_mean(images, 8, 8).select("image_id", "w", "h")


@register("img_frame_sample", oracle=None)
def img_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (decode stubbed behind a deterministic fake
    container — no codec libs here; Spark plumbing real): 200 fake videos
    x 16 frames, every 4th sampled -> 800 frame rows."""
    import pandas as pd

    from fs2_osm_spark.operators.multimodal import make_fake_video, sample_frames

    media = spark.createDataFrame(
        pd.DataFrame(
            [(f"vid_{i:06d}", make_fake_video(i), "fakevideo") for i in range(200)],
            columns=["media_id", "bytes", "fmt"],
        )
    )
    return sample_frames(media, every_n=4).select(
        "media_id", "frame_idx", "frame_w", "frame_h"
    )


@register("img_rasterize_vectorize", oracle=None)
def img_rasterize_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rasterize the OSM polygon corpus into z12 tile masks (PNG) and
    re-vectorize each mask in the same pass (north-star round trip).
    Tiles = the z12 tiles containing the hot-city centers + neighbors."""
    import pandas as pd

    from fs2_osm_spark.functions.geo import MERCATOR_LAT_MAX  # noqa: F401
    from fs2_osm_spark.operators.raster import rasterize_tiles
    from fs2_osm_spark.plans.flagship import polygon_corpus
    from fs2_osm_spark.synth.images import CITIES

    import math

    z = 12
    n = 1 << z
    tiles = set()
    for lon, lat in CITIES:
        tx = int((lon + 180.0) / 360.0 * n)
        lr = math.radians(lat)
        ty = int((1 - math.log(math.tan(lr) + 1 / math.cos(lr)) / math.pi) / 2 * n)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tiles.add((tx + dx, ty + dy))
    tiles_df = spark.createDataFrame(
        pd.DataFrame(sorted(tiles), columns=["x", "y"])
    )
    ps = polygon_corpus(spark, 256)
    return rasterize_tiles(tiles_df, ps, z, size=64).select(
        "z", "x", "y", "covered_px", "n_rings_vectorized"
    )
