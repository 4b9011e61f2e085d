"""Golden-output regression anchors (the WaterFeatureSpec ("waters", 2418)
pattern from the reference, SURVEY.md §5): frozen outputs of the flagship
query and the line-assembly pass over the deterministic synthetic world.
Any semantic drift in geotag, hex indexing, PIP, tiling, or assembly shows
up as a diff here — across sessions AND across parallelism levels."""

from __future__ import annotations

import os

from fs2_osm_spark.operators.assembly import build_osm_lines
from fs2_osm_spark.plans.flagship import flagship_query
from fs2_osm_spark.synth.osm import osm_tables

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _read_golden(name):
    with open(os.path.join(GOLDEN, name)) as f:
        header = f.readline()
        return sorted(tuple(line.rstrip("\n").split(",")) for line in f)


def test_flagship_matches_golden(spark):
    out = flagship_query(spark, "/root/testdata/sf0.001", n_images=500, n_zones=64)
    got = sorted(tuple(str(v) for v in r) for r in out.collect())
    assert got == _read_golden("flagship_500img_64z.csv")


def test_osm_lines_match_golden(spark):
    t = osm_tables(spark, 64)
    lines = build_osm_lines(t["ways"], t["nodes"])
    got = sorted(
        (str(r.way_id), str(r.n_pts), str(r.is_closed)) for r in lines.collect()
    )
    assert got == _read_golden("osm_lines_64z.csv")
