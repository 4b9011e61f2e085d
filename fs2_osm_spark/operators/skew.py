"""Explicit skew handling: salted aggregation and salted broadcast-probe
joins.

AQE's skew-join splitting handles shuffle-join skew at runtime; what it
cannot fix is (a) hot-key pressure inside a single aggregation task before
partial aggregation kicks in for high-cardinality payloads, and (b)
broadcast-probe hotspots. The classic remedy is salting: spread each hot
key over `salt_factor` synthetic sub-keys, do the heavy work per sub-key,
then merge. Results are exactly equal to the unsalted plan for decomposable
aggregates — which is what the DuckDB oracle checks.

Salt is deterministic (hash of a row-identity column mod factor), keeping
every query partition-count-invariant and resumable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, identity_col: str, salt_factor: int) -> DataFrame:
    """Deterministic salt in [0, salt_factor) from a row-identity column."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(identity_col)), F.lit(salt_factor))
    )


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_col: str,
    identity_col: str,
    salt_factor: int = 8,
) -> DataFrame:
    """Two-stage salted aggregation: groupBy(key, salt) partial -> merge.

    Equivalent to groupBy(key).agg(count, sum) — the salt splits a hot key
    across `salt_factor` reducers in stage 1; stage 2 merges salt_factor
    tiny rows per key.
    """
    salted = with_salt(df, identity_col, salt_factor)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(sum_col).alias("_s")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.sum("_s").alias("s"),
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    identity_col: str | None = None,
) -> DataFrame:
    """Inner equi-join where the small side is replicated salt_factor times
    and the big side picks one deterministic replica — spreading a hot join
    key's probe work across salt_factor tasks.

    Output equals big.join(small, key) exactly.
    """
    ident = identity_col or key
    big_s = with_salt(big, ident, salt_factor)
    small_s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(salt_factor).select(
                F.col("id").cast("bigint").alias("_salt")
            )
        )
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
