"""Core geospatial scalar kernels, expressed as pure Column expressions.

Everything here stays JVM-side inside whole-stage codegen — no Python UDFs.
Each function has a matching SQL rendering used by the DuckDB oracles (the
formulas are written so double-precision evaluation is bit-identical in both
engines: only +,-,*,/ of doubles, ln/tan/cos/sqrt from libm, and
floor(x+0.5) instead of round() to avoid half-even vs half-up divergence).

Reference semantics preserved:
- quantize(): the reference's Coordinate equality compares (coord*1e6).toInt
  (/root/reference/core/src/main/scala/fs2/osm/core/Coordinate.scala:4-12);
  ring-closure and endpoint stitching depend on it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8  # mean Earth radius (IUGG)
MERCATOR_LAT_MAX = 85.05112878


def quantize(coord: Column) -> Column:
    """Reference 1e-6 coordinate quantization: (coord * 1e6) truncated toward
    zero to int64 — Coordinate.scala:6-11 uses .toInt (truncation)."""
    return (coord * F.lit(1e6)).cast("bigint")


def tile_xyz(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    """Web-Mercator z/x/y tile indices (slippy-map scheme).

    x = floor((lon+180)/360 * 2^z)
    y = floor((1 - asinh(tan(lat))/pi) / 2 * 2^z)
    Latitudes are clamped to the Mercator domain. Pure Column math.
    """
    n = float(1 << z)
    lat_c = F.greatest(F.least(lat, F.lit(MERCATOR_LAT_MAX)), F.lit(-MERCATOR_LAT_MAX))
    lat_rad = F.radians(lat_c)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("bigint")
    # asinh(tan(phi)) written as ln(tan(phi) + 1/cos(phi)) — identical form in
    # the oracle SQL so libm evaluation matches.
    merc = F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad))
    y = F.floor((1.0 - merc / math.pi) / 2.0 * n).cast("bigint")
    x = F.greatest(F.least(x, F.lit((1 << z) - 1)), F.lit(0))
    y = F.greatest(F.least(y, F.lit((1 << z) - 1)), F.lit(0))
    return x, y


def tile_xyz_np(lon, lat, z: int):
    """Numpy twin of tile_xyz (driver-side ground-truth recording)."""
    import numpy as np

    n = float(1 << z)
    lat_c = np.clip(np.asarray(lat, np.float64), -MERCATOR_LAT_MAX, MERCATOR_LAT_MAX)
    lat_rad = np.radians(lat_c)
    x = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    merc = np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad))
    y = np.floor((1.0 - merc / math.pi) / 2.0 * n).astype(np.int64)
    m = (1 << z) - 1
    return np.clip(x, 0, m), np.clip(y, 0, m)


def tile_xyz_sql(lon: str, lat: str, z: int) -> tuple[str, str]:
    """DuckDB SQL rendering of tile_xyz, formula-identical."""
    n = float(1 << z)
    m = (1 << z) - 1
    lat_c = f"greatest(least({lat}, {MERCATOR_LAT_MAX}), {-MERCATOR_LAT_MAX})"
    x = f"greatest(least(CAST(floor(({lon} + 180.0) / 360.0 * {n}) AS BIGINT), {m}), 0)"
    merc = f"ln(tan(radians({lat_c})) + 1.0/cos(radians({lat_c})))"
    y = f"greatest(least(CAST(floor((1.0 - {merc} / pi()) / 2.0 * {n}) AS BIGINT), {m}), 0)"
    return x, y


def quadkey(x: Column, y: Column, z: int) -> Column:
    """Interleaved-bit quadkey (Bing scheme) as int64: prefix-comparable
    across zoom levels — cell-prefix joins sort by this."""
    key = F.lit(0).cast("bigint")
    for i in range(z):
        bx = F.shiftrightunsigned(x, i).bitwiseAND(F.lit(1))
        by = F.shiftrightunsigned(y, i).bitwiseAND(F.lit(1))
        key = key + (bx + by * 2).cast("bigint") * F.lit(4**i).cast("bigint")
    return key


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters, pure Column math."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = F.sin(dphi / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dlmb / 2) ** 2
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_m_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """DuckDB rendering of haversine_m, formula-identical (sin/cos/asin/sqrt)."""
    return (
        f"2.0 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic coordinates from integer keys.
# Used by oracled geospatial queries: both the Spark side and the DuckDB SQL
# derive identical (lon, lat) from a key with pure integer arithmetic, so the
# spatial kernels can be validated on the neutral star-schema tables.
# ---------------------------------------------------------------------------
def synth_lon(key: Column) -> Column:
    return (key * 7919 % 36000).cast("double") / 100.0 - 180.0


def synth_lat(key: Column) -> Column:
    return (key * 104729 % 16000).cast("double") / 100.0 - 80.0


def synth_lon_sql(key: str) -> str:
    return f"CAST(({key}) * 7919 % 36000 AS DOUBLE) / 100.0 - 180.0"


def synth_lat_sql(key: str) -> str:
    return f"CAST(({key}) * 104729 % 16000 AS DOUBLE) / 100.0 - 80.0"
