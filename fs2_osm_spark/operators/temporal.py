"""Temporal join operators Spark lacks as builtins: as-of join and
interval-overlap (range) join — expressed as compositions of DataFrame
ops with scale-safe plan shapes (no cross joins, no per-row Python).

As-of join (the SURVEY brief's canonical "operator Spark lacks"): for each
left row, the latest right row with right_ts <= left_ts per key. The
distributed shape is union + ordered window + last(ignorenulls) — ONE
shuffle on the key, no join node at all, no right-side broadcast needed:
the classic log-merge formulation that scales to arbitrarily large sides.

Range join: interval pairs that overlap. The scale shape is bin-and-refine:
each interval explodes to the fixed-width bins it covers, candidate pairs
come from a (key, bin) equi-join, the exact inequality refines, and
de-duplication collapses pairs that share several bins. Candidate volume is
|pairs that share a bin| — linear-ish for bounded interval lengths — versus
the quadratic cross join a naive inequality join degenerates to.

All timestamps are handled as epoch-microsecond bigints so results are
exact integers on any engine (float epoch seconds would invite last-ulp
hash mismatches against the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left.* plus the right_cols of the nearest right row per
    key — direction='backward' (default) takes the latest right row with
    right_ts <= left_ts; direction='forward' the earliest right row with
    right_ts >= left_ts. Unmatched left rows keep nulls (left-outer
    semantics); ties at equal timestamps match (inclusive). right rows must
    be unique per (key, ts) — pre-dedupe if not (determinism would
    otherwise depend on shuffle order).

    tolerance_us: if set, a match further than this from left_ts is nulled
    out (the pandas merge_asof `tolerance` contract).

    All right_cols travel inside ONE struct carried by a single
    last(ignorenulls=True), so every output row's r_* columns come from the
    SAME right row even when some of its values are legitimately NULL
    (carrying columns independently would backfill a NULL member from an
    older right row — diverging from merge_asof / DuckDB ASOF JOIN).

    Both ts columns must already be bigint epoch-microseconds (use
    F.unix_micros) — integer time keeps every comparison and the oracle
    hash exact.

    Scale note (hot keys): each key's full event stream flows through one
    window task — the standard log-merge formulation, one shuffle, no join
    node. A single pathological key (say one user with 10^8 events) becomes
    a straggler at extreme scale; the known mitigation is time-range
    pre-bucketing (split each key's timeline into coarse buckets, run the
    as-of within each bucket carrying the previous bucket's last right row
    as a seed). Not implemented here — no registered workload is skewed
    enough to need it."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_tagged = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            T.StructType(
                [T.StructField("_ts", T.LongType())]
                + [T.StructField(c, right.schema[c].dataType) for c in right_cols]
            )
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.struct(
            F.col(right_ts).cast("long").alias("_ts"),
            *[F.col(c) for c in right_cols],
        ).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # backward scans time ascending, forward descending; either way the
    # right row (_side 0) must sort before a left row at equal ts so the
    # inclusive match is visible at currentRow
    order = (
        [F.col("_ts").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_ts").desc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the struct is non-null for every right row (even if members are null),
    # so last(ignorenulls) lands on exactly one right row per left row
    out = (
        unioned.select("*", F.last("_r", ignorenulls=True).over(w).alias("_m"))
        .filter(F.col("_side") == 1)
    )
    keep_match = F.col("_m").isNotNull()
    if tolerance_us is not None:
        gap = (
            F.col("_ts") - F.col("_m._ts")
            if direction == "backward"
            else F.col("_m._ts") - F.col("_ts")
        )
        keep_match = keep_match & (gap <= F.lit(tolerance_us))
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.when(keep_match, F.col(f"_m.{c}")).alias(f"r_{c}")
          for c in right_cols],
        F.when(keep_match, F.col("_m._ts")).alias("r_ts"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    bin_width: int,
    l_id: str = "l_id",
    r_id: str = "r_id",
) -> DataFrame:
    """left/right: (key_col, <id>, start, end) with bigint bounds
    (end >= start). Returns (l_id, r_id, overlap) for every pair with the
    same key whose closed intervals overlap; overlap = min(ends) -
    max(starts) (>= 0).

    bin_width trades candidate fan-out (intervals explode to
    len/bin_width + 1 bins) against candidate precision; size it near the
    typical interval length."""
    def binned(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(key_col).alias("_k"),
            F.col("id").alias(f"{prefix}id"),
            F.col("start").alias(f"{prefix}start"),
            F.col("end").alias(f"{prefix}end"),
            F.explode(
                F.sequence(
                    F.floor(F.col("start") / bin_width),
                    F.floor(F.col("end") / bin_width),
                )
            ).alias("_bin"),
        )

    a = binned(left, "l_")
    b = binned(right, "r_")
    overlap = F.least("l_end", "r_end") - F.greatest("l_start", "r_start")
    return (
        a.join(b, ["_k", "_bin"])
        .filter(
            (F.col("l_start") <= F.col("r_end"))
            & (F.col("r_start") <= F.col("l_end"))
        )
        # a pair sharing several bins appears once per shared bin: collapse
        .groupBy(
            F.col("l_id").alias(l_id), F.col("r_id").alias(r_id)
        )
        .agg(F.first(overlap).alias("overlap"))
    )
