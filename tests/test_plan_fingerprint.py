"""Plan-fingerprint regression gate for the flagship pipeline.

Round-3 lesson: bench wall-times swing 15-35% with sandbox contention, so a
plan regression (a new shuffle, a lost broadcast, a Python eval node) could
hide inside the noise indefinitely. This test pins the OPERATOR TREE of the
benched flagship plan — the canonical node sequence must match a committed
fingerprint exactly, so any plan change is a conscious, reviewed edit to
this file rather than a silent bench delta.

Canonicalization keeps operator names and tree order but strips everything
run-specific (expression ids, paths, partition counts, codegen stage ids,
statistics), so the fingerprint is stable across machines and scale
factors.
"""

from __future__ import annotations

import re
import tempfile

import pandas as pd
import pytest

POLYGONS = pd.DataFrame(
    [
        (1, [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0], []),
        (2, [5.0, 5.0, 9.0, 5.0, 9.0, 9.0, 5.0, 9.0],
         [[6.0, 6.0, 7.0, 6.0, 7.0, 7.0, 6.0, 7.0]]),
    ],
    columns=["polygon_id", "outer", "inners"],
)
POLY_SCHEMA = "polygon_id long, outer array<double>, inners array<array<double>>"


def canonical_nodes(df) -> list[str]:
    """Physical-plan operator names, tree order, run-specifics stripped."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    nodes = []
    for line in plan.splitlines():
        # strip tree-drawing prefix and whole-stage-codegen markers
        body = re.sub(r"^[\s:+\-*()0-9]*", "", line)
        m = re.match(r"([A-Za-z][A-Za-z0-9]*)", body)
        if not m:
            continue
        name = m.group(1)
        if name in ("ReadSchema", "Batched", "Location", "PushedFilters",
                    "Output", "Arguments", "Format", "DataFilters",
                    "PartitionFilters"):
            continue  # scan detail lines, not operators
        nodes.append(name)
    return nodes


# The benched plan (bench.py run_flagship: parquet scan -> prepare_corpus
# cover -> apply_cell_pip -> hex/tile projection). Shape notes:
# - ONE image-side scan, NO Exchange anywhere on the image path (both the
#   cell-cover attach and the ring refine are broadcast hash joins)
# - no Python eval nodes (geotag/PIP/hex/tile are all Catalyst expressions)
# - the interior-cell fast path folds into the joins' filter/project
EXPECTED_COVER_PLAN = [
    "AdaptiveSparkPlan",
    "Project",                  # hex cell + tile_x/tile_y projection
    "BroadcastHashJoin",        # boundary-candidate ray-cast refine
    "Project",
    "BroadcastHashJoin",        # (cell -> cover) attach, interior short-circuit
    "Filter",
    "Project",                  # geotag regexp + cell derivation
    "Filter",
    "FileScan",                 # images parquet: pruned columns only
    "BroadcastExchange",
    "LocalTableScan",           # cover (driver-built, tiny)
    "BroadcastExchange",
    "LocalTableScan",           # rings for boundary refine (tiny)
]


@pytest.mark.usefixtures("spark")
def test_flagship_cover_plan_fingerprint(spark):
    from fs2_osm_spark.plans.flagship import flagship_from_tables, prepare_corpus
    from fs2_osm_spark.synth.images import images_table

    with tempfile.TemporaryDirectory() as d:
        images_table(spark, 64, slim=True).write.parquet(f"{d}/img.parquet")
        images = spark.read.parquet(f"{d}/img.parquet")
        polygons = spark.createDataFrame(POLYGONS, POLY_SCHEMA)
        cover = prepare_corpus(spark, polygons)
        got = canonical_nodes(flagship_from_tables(images, cover))
    assert got == EXPECTED_COVER_PLAN, (
        "flagship plan shape changed — if intentional, update the "
        f"fingerprint.\n got: {got}"
    )


def test_flagship_cover_fingerprint_scale_invariant(spark):
    """The fingerprint must not depend on input size or file count —
    otherwise it couldn't stand in for the sf0.1 bench plan."""
    from fs2_osm_spark.plans.flagship import flagship_from_tables, prepare_corpus
    from fs2_osm_spark.synth.images import images_table

    with tempfile.TemporaryDirectory() as d:
        images_table(spark, 500, partitions=8, slim=True).write.parquet(
            f"{d}/img.parquet"
        )
        images = spark.read.parquet(f"{d}/img.parquet")
        cover = prepare_corpus(spark, spark.createDataFrame(POLYGONS, POLY_SCHEMA))
        got = canonical_nodes(flagship_from_tables(images, cover))
    assert got == EXPECTED_COVER_PLAN, got
