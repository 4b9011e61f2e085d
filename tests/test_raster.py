"""Rasterize/vectorize round trip: mask fidelity, PNG carrier, IoU."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fs2_osm_spark.functions.pip import PolygonSet, ring_contains
from fs2_osm_spark.operators.raster import (
    mask_to_png,
    png_to_mask,
    rasterize_mask,
    rasterize_tiles,
    tile_bounds,
    vectorize_mask,
)


def _square_ps(z: int, x: int, y: int, frac: float = 0.6) -> PolygonSet:
    """A square covering the central `frac` of tile (z, x, y)."""
    lon_min, lat_min, lon_max, lat_max = tile_bounds(z, x, y)
    cx, cy = (lon_min + lon_max) / 2, (lat_min + lat_max) / 2
    hw = (lon_max - lon_min) * frac / 2
    hh = (lat_max - lat_min) * frac / 2
    ring = np.array(
        [cx - hw, cy - hh, cx + hw, cy - hh, cx + hw, cy + hh, cx - hw, cy + hh]
    )
    return PolygonSet([1], [ring], [[]])


Z, X, Y = 10, 550, 335


def test_rasterize_coverage_fraction():
    ps = _square_ps(Z, X, Y, frac=0.5)
    mask = rasterize_mask(ps, Z, X, Y, size=64)
    frac = mask.mean()
    # central square of half width/height in lon space; mercator lat warp is
    # tiny within one z10 tile -> area fraction ~ 0.25
    assert 0.2 < frac < 0.3


def test_mask_png_roundtrip():
    ps = _square_ps(Z, X, Y)
    mask = rasterize_mask(ps, Z, X, Y, size=32)
    assert (png_to_mask(mask_to_png(mask)) == mask).all()


def test_vectorize_round_trip_iou():
    ps = _square_ps(Z, X, Y, frac=0.6)
    size = 96
    mask = rasterize_mask(ps, Z, X, Y, size=size)
    rings = vectorize_mask(mask, Z, X, Y)
    assert len(rings) == 1
    # IoU between original mask and the re-rasterized vectorized ring
    lon_min, lat_min, lon_max, lat_max = tile_bounds(Z, X, Y)
    px = lon_min + (np.arange(size) + 0.5) / size * (lon_max - lon_min)
    py = lat_max - (np.arange(size) + 0.5) / size * (lat_max - lat_min)
    gx, gy = np.meshgrid(px, py)
    remask = ring_contains(rings[0], gx.ravel(), gy.ravel()).reshape(size, size)
    inter = (mask & remask).sum()
    union = (mask | remask).sum()
    assert inter / union > 0.9, inter / union


def test_vectorize_two_components():
    ps = _square_ps(Z, X, Y, frac=0.3)
    lon_min, lat_min, lon_max, lat_max = tile_bounds(Z, X, Y)
    # second small square in the NW corner
    hw = (lon_max - lon_min) * 0.1
    hh = (lat_max - lat_min) * 0.1
    x0 = lon_min + hw
    y0 = lat_max - 3 * hh
    ring2 = np.array([x0, y0, x0 + hw, y0, x0 + hw, y0 + hh, x0, y0 + hh])
    ps2 = PolygonSet([1, 2], [ps.outers[0], ring2], [[], []])
    mask = rasterize_mask(ps2, Z, X, Y, size=64)
    rings = vectorize_mask(mask, Z, X, Y)
    assert len(rings) == 2


def test_rasterize_tiles_distributed(spark):
    ps = _square_ps(Z, X, Y, frac=0.5)
    tiles = spark.createDataFrame(
        pd.DataFrame({"x": [X, X + 1], "y": [Y, Y]})
    )
    out = {(r.x, r.y): r for r in rasterize_tiles(tiles, ps, Z, size=32).collect()}
    assert out[(X, Y)].covered_px > 0
    assert out[(X, Y)].n_rings_vectorized == 1
    assert out[(X + 1, Y)].covered_px == 0
    assert png_to_mask(bytes(out[(X, Y)].png)).sum() == out[(X, Y)].covered_px


def test_raster_fixture_anti_drift(spark):
    """The committed fixture's ground truth must match what TODAY'S kernels
    compute — a changed rasterizer/vectorizer invalidates the fixture
    loudly here instead of the img_rasterize_vectorize oracle quietly."""
    import pyarrow.parquet as pq

    from fs2_osm_spark.operators.raster import hot_city_tiles
    from fs2_osm_spark.plans.flagship import polygon_corpus
    from fs2_osm_spark.synth.staging import (
        RASTER_N_ZONES,
        RASTER_SIZE,
        RASTER_Z,
        ensure_raster_fixture,
    )

    tbl = pq.read_table(ensure_raster_fixture(spark)).to_pandas()
    assert list(map(tuple, tbl[["x", "y"]].values)) == hot_city_tiles(RASTER_Z)
    ps = polygon_corpus(spark, RASTER_N_ZONES)
    # recompute a deterministic sample (first/middle/last tile) live
    for k in (0, len(tbl) // 2, len(tbl) - 1):
        r = tbl.iloc[k]
        mask = rasterize_mask(ps, RASTER_Z, int(r.x), int(r.y), RASTER_SIZE)
        rings = vectorize_mask(mask, RASTER_Z, int(r.x), int(r.y))
        assert int(mask.sum()) == int(r.covered_px), (r.x, r.y)
        assert len(rings) == int(r.n_rings_vectorized), (r.x, r.y)
    # the hot-city center tiles must actually be covered (independent
    # sanity: cities sit inside the synthetic polygon corpus)
    assert (tbl.covered_px > 0).any()
