"""Every registered query must match its DuckDB oracle at sf0.001 (smoke
scale; the driver re-checks at sf0.01). Rows-only queries must be non-empty.

This mirrors the reference's test strategy of golden-output regression
checks (e.g. WaterFeatureSpec.scala:31 pins ("waters", 2418)) but against a
live oracle instead of frozen counts.
"""

from __future__ import annotations

import pytest

from fs2_osm_spark.oracle import compare
from fs2_osm_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_SMOKE)
    if q.oracle is None:
        assert sdf.count() > 0, f"{name}: rows-only query returned 0 rows"
    else:
        problems = compare(sdf, q.oracle, duck)
        assert not problems, f"{name}: {problems}"


def test_broadcast_join_in_plan(spark):
    """r02 must broadcast the dimension side (scale hygiene)."""
    plan = QUERIES["r02_resolve_join"].fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
