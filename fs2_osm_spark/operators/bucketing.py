"""Bucketed tables + shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated fact-to-fact join is the shuffle
of both sides on the join key. Bucketing pays that shuffle ONCE at write
time: both tables are written CLUSTERED BY the key into the same bucket
count, so every future equi-join on that key is planned as a sort-merge
join over already-co-located buckets — no ShuffleExchange on either side
(asserted by tests/test_scale_operators.py on the physical plan).

Spark-first shape: `DataFrameWriter.bucketBy(...).sortBy(...)` with an
external LOCATION, read back via the session catalog (bucket metadata
lives in the catalog, which is why a plain `spark.read.parquet` of the
same files would NOT get the shuffle-free plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Write df as an external bucketed+sorted parquet table."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: a sort-merge
    join with NO shuffle on either side (bucket counts match, so the
    existing partitioning satisfies the join's distribution requirement).
    The MERGE hint pins the SMJ strategy even when the planner would
    auto-broadcast a small side — without it the write-once-shuffle
    property silently evaporates on small tables under default conf."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), key)
    )


def drop_bucketed(spark: SparkSession, *table_names: str) -> None:
    for t in table_names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
