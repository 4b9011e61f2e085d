"""As-of join and interval-overlap join: semantics vs hand-built truth."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fs2_osm_spark.operators.temporal import asof_join, interval_overlap_join


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 2, 3],
                "lts": [100, 150, 50, 100, 300, 10],
                "lid": [10, 11, 12, 13, 14, 15],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 9],
                "rts": [100, 120, 40, 250, 5],
                "rid": [20, 21, 22, 23, 24],
                "rv": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        )
    )
    return left, right


def test_asof_join_backward_semantics(asof_frames):
    left, right = asof_frames
    out = {
        r.lid: (r.r_rid, r.r_ts)
        for r in asof_join(
            left, right, "k", "lts", "rts", right_cols=["rid", "rv"]
        ).collect()
    }
    assert out[10] == (20, 100)   # tie at equal ts matches (inclusive)
    assert out[11] == (21, 120)   # latest earlier, not first
    assert out[12] == (22, 40)
    assert out[13] == (None, None)  # right exists later only -> unmatched
    assert out[14] == (23, 250)
    assert out[15] == (None, None)  # key has no right rows at all


def test_asof_join_tolerance(asof_frames):
    left, right = asof_frames
    out = {
        r.lid: r.r_rid
        for r in asof_join(
            left, right, "k", "lts", "rts", right_cols=["rid"], tolerance_us=30
        ).collect()
    }
    # lid=11 at 150: latest view at 120, gap 30 -> kept; lid=14 at 300:
    # match at 250, gap 50 -> nulled by tolerance
    assert out[11] == 21 and out[14] is None
    assert out[10] == 20 and out[12] == 22


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 300),
            "lts": rng.integers(0, 10_000, 300),
            "lid": np.arange(300),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 200),
            "rts": rng.integers(0, 10_000, 200),
            "rid": np.arange(1000, 1200),
        }
    )
    # unique (k, ts) on the right — the operator's determinism contract
    rpdf = rpdf.drop_duplicates(subset=["k", "rts"], keep="last")
    got = {
        r.lid: r.r_rid
        for r in asof_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
            "k", "lts", "rts", right_cols=["rid"],
        ).collect()
    }
    want_df = pd.merge_asof(
        lpdf.sort_values("lts"), rpdf.sort_values("rts"),
        left_on="lts", right_on="rts", by="k", direction="backward",
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in want_df.itertuples()
    }
    assert got == want


def test_interval_overlap_join_matches_brute_force(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    def mk(n, base):
        start = rng.integers(0, 100_000, n)
        return pd.DataFrame(
            {
                "user_id": rng.integers(0, 5, n),
                "id": np.arange(base, base + n),
                "start": start,
                "end": start + rng.integers(0, 15_000, n),
            }
        )

    lpdf, rpdf = mk(150, 0), mk(150, 1000)
    got = {
        (r.l_id, r.r_id): r.overlap
        for r in interval_overlap_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
            key_col="user_id", bin_width=7_000,
        ).collect()
    }
    want = {}
    for a, b in itertools.product(lpdf.itertuples(), rpdf.itertuples()):
        if a.user_id == b.user_id and a.start <= b.end and b.start <= a.end:
            want[(a.id, b.id)] = min(a.end, b.end) - max(a.start, b.start)
    assert got == want and len(want) > 50


def test_temporal_plan_shapes(spark):
    """Scale shapes: the as-of join compiles to window-over-union — no join
    node, exactly one exchange (the key shuffle); the range join never
    degenerates to a nested-loop/cartesian product (candidates come from
    the (key, bin) hash join)."""
    import pandas as pd

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "lts": [10], "lid": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rts": [5], "rid": [2]})
    )
    plan = (
        asof_join(left, right, "k", "lts", "rts", right_cols=["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan

    iv = spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "id": [1], "start": [0], "end": [10]})
    )
    plan2 = (
        interval_overlap_join(iv, iv, key_col="user_id", bin_width=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan2 and "NestedLoop" not in plan2


def test_asof_join_forward_semantics(asof_frames):
    left, right = asof_frames
    out = {
        r.lid: (r.r_rid, r.r_ts)
        for r in asof_join(
            left, right, "k", "lts", "rts", right_cols=["rid", "rv"],
            direction="forward",
        ).collect()
    }
    assert out[10] == (20, 100)     # tie at equal ts matches (inclusive)
    assert out[11] == (None, None)  # no later right row for k=1
    assert out[12] == (20, 100)     # earliest later (100), not latest (120)
    assert out[13] == (23, 250)
    assert out[14] == (None, None)
    assert out[15] == (None, None)


def test_asof_join_forward_matches_pandas(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 300),
            "lts": rng.integers(0, 10_000, 300),
            "lid": np.arange(300),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 6, 200),
            "rts": rng.integers(0, 10_000, 200),
            "rid": np.arange(1000, 1200),
        }
    ).drop_duplicates(subset=["k", "rts"], keep="last")
    got = {
        r.lid: r.r_rid
        for r in asof_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
            "k", "lts", "rts", right_cols=["rid"], direction="forward",
        ).collect()
    }
    want_df = pd.merge_asof(
        lpdf.sort_values("lts"), rpdf.sort_values("rts"),
        left_on="lts", right_on="rts", by="k", direction="forward",
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in want_df.itertuples()
    }
    assert got == want


def test_asof_join_null_member_not_backfilled(spark):
    """A legitimately NULL value in the MATCHED right row must come through
    as NULL — never backfilled from an older right row (all right_cols ride
    one struct; carrying them independently regressed exactly this)."""
    left = spark.createDataFrame(pd.DataFrame({"k": [1, 1], "lts": [12, 30]}))
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1],
                "rts": [5, 10, 25],
                "rid": [100, 101, 102],
                "rv": [7.0, None, None],
            }
        )
    )
    rows = {
        r.lts: (r.r_rid, r.r_rv, r.r_ts)
        for r in asof_join(
            left, right, "k", "lts", "rts", right_cols=["rid", "rv"]
        ).collect()
    }
    # lts=12 matches rts=10 whose rv IS NULL: rid from 101, rv stays None
    assert rows[12] == (101, None, 10)
    assert rows[30] == (102, None, 25)
    fwd = {
        r.lts: (r.r_rid, r.r_rv)
        for r in asof_join(
            left, right, "k", "lts", "rts", right_cols=["rid", "rv"],
            direction="forward",
        ).collect()
    }
    assert fwd[12] == (102, None)


def test_asof_join_rejects_bad_direction(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "lts": [1]}))
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, "k", "lts", "lts", right_cols=[], direction="nearest")
