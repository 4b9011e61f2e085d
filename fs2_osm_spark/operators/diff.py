"""Incremental diff application (OsmChange-style upsert/delete merge).

OSM publishes minutely/daily .osc change files — create/modify/delete
entity sets with bumped versions. The reference ingests full planet
extracts only (no diff path in /root/reference), but any long-lived
mirror needs the merge; it is also the generic lakehouse CDC-apply:

    result = per-key survivor of max (version, change_rank),
             dropped if the survivor is a delete.

Spark-first shape: union(base-as-v1, diff) -> one hash shuffle on the key
-> max_by over a (version, rank) struct -> filter deletes. No window over
a global order, no driver-side state; the shuffle is the same one any
per-key dedupe pays, so the merge scales with executors. At 100 TB the
base side is a partitioned table and the diff is tiny: Catalyst turns the
union-groupBy into a partial-agg-first plan, and storage-side partition
pruning (e.g. the Hilbert bucket layout, operators/partitioning.py)
bounds how much base data a geographically-local diff touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# change-kind ranks: a delete at the same version outranks a modify —
# OsmChange semantics where the tombstone is the final state of a version
_OP_RANK = {"base": 0, "create": 1, "modify": 1, "delete": 2}


def op_rank_col(op_col: str = "op"):
    """Rank per change kind; any op outside the contract RAISES at
    execution (a typo'd 'update' must not silently lose the merge)."""
    c = F.col(op_col)
    expr = F.raise_error(F.concat(F.lit("apply_diff: unknown op "), c)).cast(
        "int"
    )
    for op, rank in _OP_RANK.items():
        expr = F.when(c == op, F.lit(rank)).otherwise(expr)
    return expr


def apply_diff(
    base: DataFrame | None,
    diff: DataFrame,
    key_col: str = "osm_id",
    payload_cols: tuple[str, ...] = ("lon", "lat"),
    seq_col: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Apply a change set to a base table.

    base: key + payload columns (implicit version 1, op 'base'), or None
          for a changes-only merge (streaming state mode — avoids putting
          an empty non-Arrow LocalRelation into every micro-batch plan,
          whose first execution spins up Python workers).
    diff: key + payload + version (int) + op in create|modify|delete
          (anything else raises at execution) + optionally seq_col, a
          monotone change-sequence number from the feed.
    Returns the merged table: per key the highest (version, op-rank[,
    seq]) change wins; keys whose winner is a delete disappear.

    Tie-break contract: at-least-once feeds can deliver two DIFFERENT
    changes at the same (version, op-rank). Pass seq_col so the feed's
    own ordering decides. Without it, remaining ties fall through to
    lexicographic payload comparison — deterministic and engine-portable
    (an independent SQL merge ordering by the same columns picks the same
    survivor), but semantically arbitrary: it is a last resort for exact
    duplicate deliveries, not a substitute for a sequence number.
    """
    d = diff.select(
        key_col, *payload_cols, "version", "op",
        *([seq_col] if seq_col else []),
    )
    if base is None:
        allrows = d
    else:
        b = base.select(
            key_col,
            *payload_cols,
            F.lit(1).alias("version"),
            F.lit("base").alias("op"),
            *([F.lit(0).alias(seq_col)] if seq_col else []),
        )
        allrows = b.unionByName(d)
    winner = F.struct(
        F.col("version").alias("v"),
        op_rank_col().alias("r"),
        *([F.col(seq_col).alias("seq")] if seq_col else []),
        *[F.col(c).alias(c) for c in payload_cols],
        F.col("op").alias("op"),
    )
    merged = allrows.groupBy(key_col).agg(F.max(winner).alias("w"))
    if keep_meta:
        # incremental/streaming state mode: KEEP tombstones and the
        # winning (version, op) so a later merge can compare against them
        # (dropping a delete here would let an out-of-order older modify
        # resurrect the key in the next batch)
        return merged.select(
            key_col,
            *[F.col(f"w.{c}").alias(c) for c in payload_cols],
            F.col("w.v").alias("version"),
            F.col("w.op").alias("op"),
        )
    return merged.filter(F.col("w.op") != "delete").select(
        key_col, *[F.col(f"w.{c}").alias(c) for c in payload_cols]
    )
