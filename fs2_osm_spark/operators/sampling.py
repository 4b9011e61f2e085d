"""Scale-safe stratified sampling: exact per-class top-k by hash order
without funneling any class through a single reducer.

The direct formulation (row_number over a per-class window) shuffles every
row of a class to one task — the hot-class trap when a majority class holds
10^11 rows. The two-phase decomposition keeps the answer EXACT:

  phase 1: rank within (class, input-partition) — the shuffle key includes
           the partition id, so a giant class spreads over every reducer;
           each partition can contribute at most `keep` rows per class
           (any global top-`keep` row is necessarily a top-`keep` row of
           its own partition), so the survivor set is bounded by
           n_partitions × n_classes × keep — tiny;
  phase 2: exact per-class rank over the survivors only.

The intermediate uses spark_partition_id() but the OUTPUT is partition-
count-invariant: phase 2 re-ranks globally by the same (hash, id) order,
so the result equals the single-window formulation row for row
(pinned by tests/test_sampling.py against queries/text.py's
text_stratified_sample window implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_topk_by_hash(
    df: DataFrame,
    class_col: str,
    order_col: str,
    id_col: str,
    keep: int,
) -> DataFrame:
    """Per-class top-`keep` rows by (order_col, id_col) — two-phase exact.

    Returns df's columns plus `rank` (1-based within class). `order_col`
    is typically a cross-engine hash (deterministic uniform permutation);
    `id_col` breaks ties.
    """
    local_w = Window.partitionBy(class_col, "_pid").orderBy(order_col, id_col)
    survivors = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrank", F.row_number().over(local_w))
        .filter(F.col("_lrank") <= keep)
        .drop("_pid", "_lrank")
    )
    global_w = Window.partitionBy(class_col).orderBy(order_col, id_col)
    return (
        survivors.withColumn(
            "rank", F.row_number().over(global_w).cast("bigint")
        )
        .filter(F.col("rank") <= keep)
    )
