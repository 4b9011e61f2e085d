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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: left.* plus the right_cols of the latest right
    row with right_ts <= left_ts (same key). Unmatched left rows keep
    nulls (left-outer semantics); ties at equal timestamps match
    (inclusive). right rows must be unique per (key, ts) — pre-dedupe if
    not (determinism would otherwise depend on shuffle order).

    tolerance_us: if set, a match older than this is nulled out (the
    pandas merge_asof `tolerance` contract).

    Both ts columns must already be bigint epoch-microseconds (use
    F.unix_micros) — integer time keeps every comparison and the oracle
    hash exact."""
    l_tagged = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        F.lit(None).cast("long").alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right (_side 0) sorts before left at equal ts -> inclusive match
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
               for c in right_cols]
    matched_ts = F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts")
    out = unioned.select("*", *carried, matched_ts).filter(F.col("_side") == 1)
    keep_match = F.col("_m_ts").isNotNull()
    if tolerance_us is not None:
        keep_match = keep_match & (
            (F.col("_ts") - F.col("_m_ts")) <= F.lit(tolerance_us)
        )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.when(keep_match, F.col(f"_m_{c}")).alias(f"r_{c}")
          for c in right_cols],
        F.when(keep_match, F.col("_m_ts")).alias("r_ts"),
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
