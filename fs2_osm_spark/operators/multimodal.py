"""Multimodal (image) operators over binary columns.

Images travel as opaque `bytes` columns with typed metadata (input_hint
schema). All pixel work happens in Arrow-batched mapInPandas with the
pure-numpy codecs — no per-row Python UDFs, no image libs required.

Scale notes: the binary column is the widest thing in the table, so these
operators keep it out of shuffles — geotag/cell/tile derivation works on
metadata only; pixel passes are narrow (no shuffle at all); anything that
joins re-attaches bytes late by image_id (SURVEY.md §7.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fs2_osm_spark.codecs.png import (
    decode_image,
    encode_lossy,
    encode_png,
    phash64,
    psnr,
)

CAPTION_COORD_RE = r"at (-?\d+\.\d+),(-?\d+\.\d+)"


def _coord_pair(caption: Column) -> Column:
    """The 'LAT,LON' token of a caption ('... taken at LAT,LON near ...').

    r08: substring_index parsing instead of two regexp_extract passes —
    one regex evaluation per coordinate doubled the per-row string cost
    (measured 1.58s -> 0.86s for the parse stage over 16M captions), and
    geotag sits on every flagship/pyramid/mosaic path. Exactly equivalent
    to CAPTION_COORD_RE on the caption grammar every corpus in this
    engine emits (one ' at ' delimiter, coords as D.D,D.D followed by a
    space) — verified value-identical across the staged corpora; the
    DuckDB twins keep the regexp form, so the oracles would catch drift.
    """
    return F.substring_index(F.substring_index(caption, " at ", -1), " ", 1)


def hamming64(a: int, b: int) -> int:
    """Two's-complement 64-bit Hamming distance between signed int64
    hashes. The mask matters: ``bin(a ^ b).count('1')`` on a negative XOR
    counts magnitude bits, so a sign-bit-only difference (true distance 1)
    would read as 63 without it."""
    return ((int(a) ^ int(b)) & ((1 << 64) - 1)).bit_count()


def caption_lat(caption: Column) -> Column:
    return F.substring_index(_coord_pair(caption), ",", 1).cast("double")


def caption_lon(caption: Column) -> Column:
    return F.substring_index(_coord_pair(caption), ",", -1).cast("double")


def geotag(images: DataFrame) -> DataFrame:
    """Caption -> (lon, lat) columns. Pure Column regexp — JVM-side."""
    return images.withColumn("lat", caption_lat(F.col("caption"))).withColumn(
        "lon", caption_lon(F.col("caption"))
    )


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("dec_w", T.IntegerType(), False),
        T.StructField("dec_h", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("std_r", T.DoubleType(), False),
        T.StructField("std_g", T.DoubleType(), False),
        T.StructField("std_b", T.DoubleType(), False),
        T.StructField("phash_match", T.BooleanType(), False),
    ]
)

# phash is designed to survive high-quality lossy compression: the JQ01
# path decodes within a few bits of the stored hash (measured max 4 over
# the synth corpus, which is noise-like and therefore phash-hostile);
# lossless decode must reproduce the hash exactly.
PHASH_LOSSY_TOLERANCE = 6


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image, emit per-channel pixel stats + phash
    verification. phash_match is a REAL check on both codec paths: exact
    for lossless PNG, hamming <= PHASH_LOSSY_TOLERANCE for the lossy JQ01
    decode — a distorting decoder breaks it either way."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = decode_image(bytes(r.bytes), r.fmt)
                flat = img.reshape(-1, 3).astype(np.float64)
                means = flat.mean(axis=0)
                stds = flat.std(axis=0)
                dist = hamming64(phash64(img), r.phash)
                ph_ok = dist == 0 if r.fmt == "png" else dist <= PHASH_LOSSY_TOLERANCE
                rows.append(
                    (
                        r.image_id,
                        img.shape[1],
                        img.shape[0],
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        float(stds[0]),
                        float(stds[1]),
                        float(stds[2]),
                        bool(ph_ok),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "dec_w", "dec_h", "mean_r", "mean_g", "mean_b",
                    "std_r", "std_g", "std_b", "phash_match",
                ],
            )

    return images.select("image_id", "bytes", "fmt", "phash").mapInPandas(
        fn, DECODE_STATS_SCHEMA
    )


def decode_channel_means(
    images: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Decode every image and emit ONLY the per-channel pixel means — the
    slim pixel pass for consumers that aggregate brightness (tile pyramid,
    cell mosaic). decode_stats additionally computes stds + the phash
    verification per image, which column pruning cannot remove through an
    opaque mapInPandas (guide §4.1) — profiled at 77% of that pass's
    per-image Python time. The mean expression is byte-for-byte the one
    decode_stats uses, so derived luma values are bit-identical.

    ``carry`` names extra input columns to pass through unchanged (e.g.
    the caption): consumers that need decode output AND row metadata then
    read both off this one pass instead of equi-joining two scans of the
    corpus — at 250k images that join was its own shuffle plus a second
    full parquet scan."""
    schema = T.StructType(
        [T.StructField("image_id", T.StringType(), False)]
        + [images.schema[c] for c in carry]
        + [
            T.StructField("mean_r", T.DoubleType(), False),
            T.StructField("mean_g", T.DoubleType(), False),
            T.StructField("mean_b", T.DoubleType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means = np.empty((len(pdf), 3), np.float64)
            for k, (b, f) in enumerate(zip(pdf["bytes"], pdf["fmt"])):
                img = decode_image(bytes(b), f)
                means[k] = img.reshape(-1, 3).astype(np.float64).mean(axis=0)
            out = pdf[["image_id", *carry]].copy()
            out["mean_r"] = means[:, 0]
            out["mean_g"] = means[:, 1]
            out["mean_b"] = means[:, 2]
            yield out

    return images.select("image_id", *carry, "bytes", "fmt").mapInPandas(
        fn, schema
    )


ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("psnr_db", T.DoubleType(), False),
        T.StructField("lossless", T.BooleanType(), False),
    ]
)


def pixel_roundtrip(images: DataFrame) -> DataFrame:
    """decode -> re-encode -> decode, report PSNR (input_hint invariant:
    allclose for lossless, >= 40 dB for lossy) with caption passthrough."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = decode_image(bytes(r.bytes), r.fmt)
                re_bytes = encode_png(img) if r.fmt == "png" else encode_lossy(img)
                again = decode_image(re_bytes, r.fmt)
                rows.append(
                    (r.image_id, r.caption, psnr(img, again), r.fmt == "png")
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "caption", "psnr_db", "lossless"]
            )

    return images.select("image_id", "bytes", "fmt", "caption").mapInPandas(
        fn, ROUNDTRIP_SCHEMA
    )


def block_mean_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized box-mean resample of one HxWx3 array to (out_h, out_w).

    reduceat over both axes: duplicate boundary indices (upscale cells)
    yield the single row/col at that index — the same one-pixel fallback
    the scalar formulation used. Pixel values are small integers in
    float64, so the sums are exact and the output is bit-identical to the
    per-cell mean() loop it replaced."""
    img = img.astype(np.float64)
    h, w = img.shape[:2]
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    row_sum = np.add.reduceat(img, ys[:-1], axis=0)
    cell_sum = np.add.reduceat(row_sum, xs[:-1], axis=1)
    cnt = (
        np.maximum(np.diff(ys), 1)[:, None]
        * np.maximum(np.diff(xs), 1)[None, :]
    ).astype(np.float64)
    out = cell_sum / cnt[:, :, None]
    return out.clip(0, 255).astype(np.uint8)


def resize_block_mean(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Block-mean resample to (out_w, out_h), re-encoded as PNG.

    The rasterize/vectorize round-trip building block (north_star): decode,
    transform on the numpy array, re-encode — all inside one narrow stage.
    """
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = decode_image(bytes(r.bytes), r.fmt)
                small = block_mean_resize(img, out_w, out_h)
                # phash of the DERIVED image rides along: downstream
                # decode_stats can verify the thumbnail losslessly, and
                # thumbnail-level near-dup joins get their key for free
                rows.append(
                    (r.image_id, encode_png(small), out_w, out_h, "png",
                     phash64(small))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "phash"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(fn, schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_png", T.BinaryType(), False),
        T.StructField("frame_w", T.IntegerType(), False),
        T.StructField("frame_h", T.IntegerType(), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 4, n_frames: int = 16) -> DataFrame:
    """Video frame sampling — Spark-side plumbing is real, the video DECODE
    is a STUB (no video codec libs in this container).

    Contract: media(media_id, bytes, fmt) where fmt='fakevideo' payloads are
    a deterministic container of n_frames PNG frames (built by
    make_fake_video below); real deployments swap `_decode_video` for an
    ffmpeg/PyAV call with the same signature. Every `every_n`-th frame is
    emitted as its own row (one row per sampled frame — the explode shape a
    frame-level training pipeline consumes), re-encoded as PNG.
    """

    def _decode_video(payload: bytes, fmt: str) -> list[np.ndarray]:
        if fmt == "fakevideo":
            frames = []
            pos = 0
            while pos < len(payload):
                ln = int.from_bytes(payload[pos : pos + 4], "big")
                frames.append(decode_image(payload[pos + 4 : pos + 4 + ln], "png"))
                pos += 4 + ln
            return frames
        raise NotImplementedError(
            f"real video decode ({fmt}) requires a codec library absent here"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                frames = _decode_video(bytes(r.bytes), r.fmt)
                for i in range(0, len(frames), every_n):
                    img = frames[i]
                    rows.append(
                        (r.media_id, i, encode_png(img), img.shape[1], img.shape[0])
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_png", "frame_w", "frame_h"],
            )

    return media.select("media_id", "bytes", "fmt").mapInPandas(fn, FRAME_SCHEMA)


def make_fake_video(media_id: int, n_frames: int = 16, w: int = 16, h: int = 12) -> bytes:
    """Deterministic fake video payload: length-prefixed PNG frames."""
    out = bytearray()
    for i in range(n_frames):
        rng = np.random.default_rng(media_id * 1000 + i)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        png = encode_png(img)
        out += len(png).to_bytes(4, "big") + png
    return bytes(out)


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_w", T.IntegerType(), False),
        T.StructField("frame_h", T.IntegerType(), False),
        T.StructField("mean_px", T.DoubleType(), False),
    ]
)


def sample_frames_indexed(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Index-driven frame sampling over REAL AVI containers (r06 — this
    retires the fakevideo stub at the container level): the reader walks
    RIFF -> idx1 and decodes ONLY the sampled '00dc' frames, so on a
    petabyte video corpus the skipped frames' bytes are never touched.
    The per-frame codec is the repo's PNG ('MPNG' fourcc, the MJPEG-in-AVI
    layout with PNG payloads); genuinely foreign codecs (h264 etc.) still
    raise — no codec libraries exist in this sandbox."""
    from fs2_osm_spark.synth.video import decode_avi_frame, read_avi_index

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.fmt != "avi":
                    raise NotImplementedError(
                        f"video codec {r.fmt!r} requires libraries absent here"
                    )
                raw = bytes(r.bytes)
                _, idx = read_avi_index(raw)
                for i in range(0, len(idx), every_n):
                    off, size = idx[i]
                    img = decode_avi_frame(raw, off, size)
                    rows.append(
                        (
                            r.media_id, i, img.shape[1], img.shape[0],
                            float(np.mean(img, dtype=np.float64)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_w", "frame_h", "mean_px"],
            )

    return media.select("media_id", "bytes", "fmt").mapInPandas(
        fn, FRAME_STATS_SCHEMA
    )


# --- perceptual-hash near-duplicate detection -------------------------------

PHASH_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("img_id", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def phash_frame(images: DataFrame, id_col: str = "img_id") -> DataFrame:
    """Decode every image and compute its 64-bit perceptual hash — the
    narrow (shuffle-free) pixel pass that turns a binary image table into a
    1-row-per-image hash table the dedup machinery can band and join."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "img_id": pdf[id_col],
                    "phash": [
                        phash64(decode_image(bytes(b), f))
                        for b, f in zip(pdf["bytes"], pdf["fmt"])
                    ],
                }
            )

    return images.select(
        F.col(id_col).alias(id_col), "bytes", "fmt"
    ).mapInPandas(fn, PHASH_FRAME_SCHEMA)


def band_cols(col: str, n_bands: int) -> list[Column]:
    """The (64/n_bands)-bit band values of a 64-bit hash column — ONE
    definition shared by the batch band join below and the streaming
    dedup-on-arrival join (streaming/images.py), so the width/mask
    arithmetic cannot drift between them. Arithmetic shift + mask ==
    logical byte extract (sign bits masked off), mirrored exactly by the
    DuckDB twins' (phash >> s) & mask."""
    if 64 % n_bands:
        raise ValueError(f"n_bands must divide 64, got {n_bands}")
    band_w = 64 // n_bands
    mask = (1 << band_w) - 1
    return [
        F.shiftright(F.col(col), band_w * k).bitwiseAND(F.lit(mask)).alias(f"b{k}")
        for k in range(n_bands)
    ]


def phash_band_pairs(
    hashed: DataFrame,
    id_col: str = "img_id",
    n_bands: int = 8,
    hamming_t: int = 6,
) -> DataFrame:
    """Near-dup candidate pairs by LSH banding over the 64-bit hash, then
    exact hamming verification — (id_a, id_b) with id_a < id_b.

    With 8 bands of 8 bits, pigeonhole guarantees FULL recall for any pair
    within hamming 7 (>= the verify threshold 6): d flipped bits can dirty
    at most d bands, leaving a clean band that collides. The band join
    shuffles only (band_idx, band_val, id, phash) — never the pixel bytes —
    and distinct-s candidates BEFORE the popcount so a pair colliding in
    several bands is verified once. At cluster scale a pathologically hot
    band value (e.g. a flat-white-thumbnail band) is an AQE-skew-split or
    salting case, same as any hot join key.
    """
    if hamming_t > n_bands - 1:
        raise ValueError(
            f"banding recall guarantee needs hamming_t <= n_bands-1; "
            f"got t={hamming_t}, bands={n_bands}"
        )
    # pin the (id, phash) frame before the self-join — otherwise BOTH join
    # sides re-run the whole upstream pipeline (for image corpora that is
    # the full decode+hash pass, the dominant cost). Same share-once persist
    # the minhash banding uses; released by dedup.release_pins().
    from fs2_osm_spark.operators.dedup import persist_pinned

    hashed = persist_pinned(hashed.select(F.col(id_col), "phash"))
    bands = hashed.select(
        F.col(id_col),
        "phash",
        F.posexplode(F.array(*band_cols("phash", n_bands))).alias(
            "band_k", "band_v"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_k") == F.col("b.band_k"),
                F.col("a.band_v") == F.col("b.band_v"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    return cand.where(
        F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))) <= hamming_t
    ).select("id_a", "id_b")


# --- deterministic augmentation ---------------------------------------------

def center_crop(img: np.ndarray) -> np.ndarray:
    """Centered half-size crop — the deterministic anchor of the
    random-resized-crop family (a training run would jitter the window
    per-sample; the fixed anchor is what a value oracle can pin)."""
    h, w = img.shape[:2]
    ch, cw = max(h // 2, 1), max(w // 2, 1)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    return img[y0 : y0 + ch, x0 : x0 + cw]


AUGMENT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fl_phash", T.LongType(), False),
        T.StructField("cr_phash", T.LongType(), False),
        T.StructField("cr_mean_r", T.DoubleType(), False),
        T.StructField("cr_mean_g", T.DoubleType(), False),
        T.StructField("cr_mean_b", T.DoubleType(), False),
    ]
)


def augment_stats(images: DataFrame) -> DataFrame:
    """Deterministic augmentation pass (hflip + centered half crop) with
    verification hashes/stats per image — one narrow mapInPandas, no
    shuffle; the geometry ops are numpy views/slices (zero-copy) so the
    per-image cost is the decode plus two aHashes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                img = decode_image(bytes(r.bytes), r.fmt)
                crop = center_crop(img)
                cm = crop.reshape(-1, 3).astype(np.float64).mean(axis=0)
                rows.append(
                    (
                        r.image_id,
                        phash64(img[:, ::-1]),
                        phash64(crop),
                        float(cm[0]),
                        float(cm[1]),
                        float(cm[2]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUGMENT_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        fn, AUGMENT_SCHEMA
    )


# --- video scene-cut detection ----------------------------------------------

SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("diff_abs_sum", T.LongType(), False),
        T.StructField("is_cut", T.BooleanType(), False),
    ]
)


def scene_cut_stats(media: DataFrame, threshold_per_px: int) -> DataFrame:
    """Temporal segmentation of real AVI clips: decode every frame through
    the container index, emit the sum of absolute per-channel differences
    between consecutive frames (EXACT BIGINT — uint8 pixels, no floats
    anywhere) and the cut flag at threshold_per_px * n_pixel_channels.
    One narrow mapInPandas; a clip's frames never leave their worker."""
    from fs2_osm_spark.synth.video import decode_avi_frame, read_avi_index

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                raw = bytes(r.bytes)
                movi, entries = read_avi_index(raw)
                prev = None
                for i, (off, size) in enumerate(entries):
                    img = decode_avi_frame(raw, off, size).astype(np.int64)
                    if prev is not None:
                        d = int(np.abs(img - prev).sum())
                        rows.append(
                            (r.media_id, i, d, d > threshold_per_px * img.size)
                        )
                    prev = img
            yield pd.DataFrame(rows, columns=[f.name for f in SCENE_CUT_SCHEMA])

    return media.select("media_id", "bytes", "fmt").mapInPandas(
        fn, SCENE_CUT_SCHEMA
    )
