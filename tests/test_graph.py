"""Structural checks for the fixed-point PageRank operator."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _star_edges(spark, hub: int = 0, leaves: int = 8):
    rows = []
    for i in range(1, leaves + 1):
        rows.append((hub, i))
        rows.append((i, hub))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["u", "v"]))


def test_hub_outranks_leaves_and_mass_is_conserved(spark):
    from fs2_osm_spark.operators.graph import PR_SCALE, pagerank_fixed_point

    pr = pagerank_fixed_point(_star_edges(spark), n_iters=3).toPandas()
    hub = int(pr.loc[pr.node_id == 0, "pr"].iloc[0])
    leaves = pr.loc[pr.node_id != 0, "pr"]
    assert hub > leaves.max() * 2
    # every leaf sees the identical integer value (symmetric graph)
    assert leaves.nunique() == 1
    # integer truncation only ever LOSES mass, and the loss is tiny
    # (each DIV drops < 1 unit per operand pair; the dominant term is the
    # per-node base truncation, ~n units per round)
    total = int(pr.pr.sum())
    assert total <= PR_SCALE
    assert total >= PR_SCALE - 10**6  # within 1e-6 relative


def test_two_cycle_is_a_fixed_point(spark):
    """On u<->v the uniform vector is stationary: each round must return
    exactly base + 85% of the passed-through half mass."""
    from fs2_osm_spark.operators.graph import PR_SCALE, pagerank_fixed_point

    edges = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 1)], columns=["u", "v"])
    )
    pr = pagerank_fixed_point(edges, n_iters=4).toPandas()
    half = PR_SCALE // 2
    want = (15 * PR_SCALE) // 200 + (85 * half) // 100
    assert set(pr.pr) == {want}


def test_empty_edges_raise(spark):
    import pytest

    from fs2_osm_spark.operators.graph import pagerank_fixed_point

    empty = spark.createDataFrame(pd.DataFrame(columns=["u", "v"]), "u long, v long")
    with pytest.raises(ValueError):
        pagerank_fixed_point(empty)


def test_pagerank_query_plan_is_keyed(spark):
    from fs2_osm_spark.queries import QUERIES

    df = QUERIES["graph_pagerank"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
