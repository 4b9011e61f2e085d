"""Determinism pins for the two CORRECTNESS_r07 red rows (VERDICT item 1c).

Each query's fn runs TWICE in one session with induced cache pressure
(`spark.catalog.clearCache()` between runs — evicting anything the first
run cached) and the order-insensitive value hashes must match. The r07
failure mode was exactly a second evaluation diverging from the first
after cache state changed; the r08 durable-table swap removes the window,
and this test keeps it removed.
"""

from __future__ import annotations

import pytest

from fs2_osm_spark.oracle import value_hash
from fs2_osm_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _hash_of(df) -> tuple[int, str]:
    rows = [tuple(r) for r in df.collect()]
    return len(rows), value_hash(rows, [c.lower() for c in df.columns])


@pytest.mark.parametrize("name", ["img_shard_pack", "graph_pagerank"])
def test_rerun_under_cache_pressure_is_identical(spark, name):
    q = QUERIES[name]
    df1 = q.fn(spark, SF_DIR)
    n1, h1 = _hash_of(df1)
    # simulate driver-session memory pressure: drop every cached block the
    # first run may have relied on, then also re-collect the FIRST result
    # frame (a late re-execution of an already-returned plan — the exact
    # r07 window)
    spark.catalog.clearCache()
    n1b, h1b = _hash_of(df1)
    df2 = q.fn(spark, SF_DIR)
    n2, h2 = _hash_of(df2)
    assert n1 > 0
    assert (n1, h1) == (n1b, h1b), f"{name}: re-collect after clearCache diverged"
    assert (n1, h1) == (n2, h2), f"{name}: second run diverged"
