"""Staged parquet fixtures that give DuckDB oracles access to synthesized
(non-star-schema) inputs.

The image corpus is synthesized in-engine (synth/images.py), so the DuckDB
twin of an image query can't see it through the sf_dir views. Staging the
deterministic 2000-image corpus to a committed parquet file lets the oracle
SQL read the SAME rows by absolute path (`read_parquet('<fixture>')`),
turning the geotag/cell and decode-dims queries from rows-only checks into
hard value oracles. The fixture is independent of scale factor — the image
queries always run on the fixed N_IMAGES corpus.

`ensure_images_fixture()` regenerates the file if missing (bit-deterministic
values via generate_batch); tests assert fixture == live synthesis so a
drifting generator can't silently invalidate the oracle.
"""

from __future__ import annotations

import os

import numpy as np

N_FIXTURE_IMAGES = 2_000

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
IMAGES_FIXTURE = os.path.join(_REPO_ROOT, "fixtures", "images_oracle.parquet")


def decoded_stats_columns(pdf) -> dict[str, np.ndarray]:
    """Per-channel mean/std of each row's DECODED pixels (PNG exact, JQ01
    through the lossy decoder) — the recorded ground truth the
    img_decode_stats oracle reads back. Computed once at staging time; the
    anti-drift test recomputes a sample so a silently-changed decoder
    invalidates the fixture loudly instead of the oracle quietly."""
    from fs2_osm_spark.codecs.png import decode_image

    means = np.empty((len(pdf), 3))
    stds = np.empty((len(pdf), 3))
    for k, r in enumerate(pdf.itertuples()):
        flat = decode_image(bytes(r.bytes), r.fmt).reshape(-1, 3).astype(np.float64)
        means[k] = flat.mean(axis=0)
        stds[k] = flat.std(axis=0)
    return {
        "dec_mean_r": means[:, 0], "dec_mean_g": means[:, 1],
        "dec_mean_b": means[:, 2],
        "dec_std_r": stds[:, 0], "dec_std_g": stds[:, 1], "dec_std_b": stds[:, 2],
    }


def derived_image_columns(pdf) -> dict[str, object]:
    """Ground truth for the derived-image oracles, recorded at staging time
    with the SAME kernels the queries run (anti-drift test recomputes a
    sample, so a changed codec/resampler invalidates the fixture loudly):

    - rt_psnr: decode -> re-encode -> decode PSNR (img_pixel_roundtrip).
      NULL for lossless PNG rows (their PSNR is +inf; NULL keeps infinities
      out of the parquet/oracle comparison entirely).
    - rs_mean_r/g/b + rs_phash: per-channel means and phash of the 8x8
      block-mean thumbnail (img_resize_stats).
    """
    from fs2_osm_spark.codecs.png import (
        decode_image,
        encode_lossy,
        phash64,
        psnr,
    )
    from fs2_osm_spark.operators.multimodal import block_mean_resize

    rt_psnr: list[float | None] = []
    rs_means = np.empty((len(pdf), 3))
    rs_phash = np.empty(len(pdf), np.int64)
    for k, r in enumerate(pdf.itertuples()):
        img = decode_image(bytes(r.bytes), r.fmt)
        if r.fmt == "png":
            rt_psnr.append(None)
        else:
            again = decode_image(encode_lossy(img), r.fmt)
            rt_psnr.append(float(psnr(img, again)))
        small = block_mean_resize(img, 8, 8)
        rs_means[k] = small.reshape(-1, 3).mean(axis=0)
        rs_phash[k] = phash64(small)
    return {
        "rt_psnr": rt_psnr,
        "rs_mean_r": rs_means[:, 0], "rs_mean_g": rs_means[:, 1],
        "rs_mean_b": rs_means[:, 2],
        "rs_phash": rs_phash,
    }


def ensure_images_fixture() -> str:
    """Write the staged image corpus if absent; return its absolute path."""
    if not os.path.exists(IMAGES_FIXTURE):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fs2_osm_spark.synth.images import generate_batch

        pdf = generate_batch(np.arange(N_FIXTURE_IMAGES, dtype=np.int64))
        for name, vals in decoded_stats_columns(pdf).items():
            pdf[name] = vals
        for name, vals in derived_image_columns(pdf).items():
            pdf[name] = vals
        os.makedirs(os.path.dirname(IMAGES_FIXTURE), exist_ok=True)
        tmp = IMAGES_FIXTURE + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), tmp)
        os.replace(tmp, IMAGES_FIXTURE)
    return IMAGES_FIXTURE
