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
    c = F.col(op_col)
    expr = F.lit(0)
    for op, rank in _OP_RANK.items():
        expr = F.when(c == op, F.lit(rank)).otherwise(expr)
    return expr


def apply_diff(
    base: DataFrame,
    diff: DataFrame,
    key_col: str = "osm_id",
    payload_cols: tuple[str, ...] = ("lon", "lat"),
) -> DataFrame:
    """Apply a change set to a base table.

    base: key + payload columns (implicit version 1, op 'base').
    diff: key + payload + version (int) + op in create|modify|delete.
    Returns the merged table: per key the highest (version, op-rank)
    change wins; keys whose winner is a delete disappear.
    """
    b = base.select(
        key_col,
        *payload_cols,
        F.lit(1).alias("version"),
        F.lit("base").alias("op"),
    )
    d = diff.select(key_col, *payload_cols, "version", "op")
    allrows = b.unionByName(d)
    winner = F.struct(
        F.col("version").alias("v"),
        op_rank_col().alias("r"),
        *[F.col(c).alias(c) for c in payload_cols],
        F.col("op").alias("op"),
    )
    merged = allrows.groupBy(key_col).agg(F.max(winner).alias("w"))
    return merged.filter(F.col("w.op") != "delete").select(
        key_col, *[F.col(f"w.{c}").alias(c) for c in payload_cols]
    )
