"""Image table invariants (input_hint) + flagship query determinism."""

from __future__ import annotations

import numpy as np
import pytest

from fs2_osm_spark.codecs.png import (
    decode_image,
    decode_png,
    encode_lossy,
    encode_png,
    phash64,
    psnr,
)
from fs2_osm_spark.operators.multimodal import geotag, pixel_roundtrip
from fs2_osm_spark.plans.flagship import flagship_query
from fs2_osm_spark.synth.images import coords_for_ids, generate_batch, images_table


# ------------------------------------------------------------- codecs ------
def test_png_roundtrip_lossless():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_lossy_roundtrip_psnr():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    out = decode_image(encode_lossy(img), "jpeg")
    assert psnr(img, out) >= 40.0
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_phash_deterministic_and_locality():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert phash64(img) == phash64(img.copy())
    # tiny perturbation keeps most bits
    img2 = img.copy()
    img2[0, 0] ^= 1
    diff = bin((phash64(img) ^ phash64(img2)) & ((1 << 64) - 1)).count("1")
    assert diff <= 4


# ----------------------------------------------------------- synthesis -----
def test_generate_batch_deterministic():
    ids = np.arange(50, dtype=np.int64)
    a = generate_batch(ids)
    b = generate_batch(ids)
    assert (a["caption"] == b["caption"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["bytes"], b["bytes"]))


def test_coords_hot_cluster_skew():
    ids = np.arange(20_000, dtype=np.int64)
    lon, lat = coords_for_ids(ids)
    near_city = (
        (np.abs(lon[:, None] - np.array([10.0, 13.4, 8.8])[None]) < 0.3)
        & (np.abs(lat[:, None] - np.array([53.55, 52.52, 53.08])[None]) < 0.3)
    ).any(axis=1)
    frac = near_city.mean()
    assert 0.6 < frac < 0.8  # HOT_FRACTION=0.7


def test_images_table_partition_invariant(spark):
    a = images_table(spark, 300, partitions=2).select("image_id", "caption", "phash")
    b = images_table(spark, 300, partitions=7).select("image_id", "caption", "phash")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pixel_roundtrip_all_pass(spark):
    images = images_table(spark, 200)
    rt = pixel_roundtrip(images).collect()
    assert len(rt) == 200
    for r in rt:
        assert r.psnr_db >= 40.0
        assert r.caption.startswith("img ")  # caption passthrough intact


def test_geotag_matches_generation(spark):
    images = images_table(spark, 200)
    got = geotag(images).select("image_id", "lon", "lat").collect()
    ids = np.array([int(r.image_id.split("_")[1]) for r in got])
    lon, lat = coords_for_ids(ids)
    for k, r in enumerate(got):
        # caption carries 6 decimals; geotag must reproduce to that precision
        assert r.lon == pytest.approx(lon[k], abs=1e-6)
        assert r.lat == pytest.approx(lat[k], abs=1e-6)


# ------------------------------------------------------------ flagship -----
def test_flagship_runs_and_is_deterministic(spark):
    out1 = flagship_query(spark, "/root/testdata/sf0.001", n_images=500, n_zones=64)
    rows1 = sorted(map(tuple, out1.collect()))
    assert len(rows1) > 0
    out2 = flagship_query(spark, "/root/testdata/sf0.001", n_images=500, n_zones=64)
    rows2 = sorted(map(tuple, out2.collect()))
    assert rows1 == rows2
    # every matched image has valid tile + cell
    for image_id, polygon_id, cell, tx, ty in rows1:
        assert 0 <= tx < (1 << 12) and 0 <= ty < (1 << 12)
        assert cell > 0 and polygon_id > 0
