"""Table maintenance: small-file compaction + scan-pruning statistics.

Two operational primitives every long-lived 100 TB lakehouse table needs
(the reference writes straight into Postgres and gets them from vacuum /
ANALYZE; a parquet-backed engine must provide them itself):

- compact_table: a fragmented directory (thousands of tiny files from
  incremental batches — e.g. the lineage layout's per-batch appends) is
  rewritten into ~target-sized files. Row-preservation is the correctness
  contract; the distributed shape is one coalesce (NO shuffle — coalesce
  merges co-located splits) unless a shuffle is explicitly requested to
  also restore clustering.

- collect_table_stats: per-column min / max / null count / approximate
  NDV — the file-footer and catalog statistics that drive scan pruning
  and join-size estimation. One pass, one aggregate row per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 256,
    shuffle: bool = False,
) -> dict:
    """Rewrite src_path parquet into ~target_file_mb files at dst_path.
    Returns {"files_before", "files_after", "rows"}."""
    import os

    if os.path.abspath(dst_path) == os.path.abspath(src_path):
        # overwrite-to-dst deletes the directory the (lazy) source plan
        # still reads from — in-place compaction needs a staging dir
        raise ValueError(
            "compact_table: dst_path must differ from src_path (the "
            "overwrite would destroy the table being read; compact into "
            "a staging directory and swap)"
        )
    df = spark.read.parquet(src_path)
    files_before = len(df.inputFiles())
    total_bytes = sum(
        int(r.length)
        for r in spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(src_path)
        .select(F.col("length"))
        .collect()
    )
    n_out = max(1, total_bytes // (target_file_mb * 1024 * 1024) + 1)
    out = df.repartition(int(n_out)) if shuffle else df.coalesce(int(n_out))
    out.write.mode("overwrite").parquet(dst_path)
    after = spark.read.parquet(dst_path)
    return {
        "files_before": files_before,
        "files_after": len(after.inputFiles()),
        "rows": after.count(),
    }


def collect_table_stats(df: DataFrame, columns: list[str]) -> DataFrame:
    """One row per column: min/max (as strings, type-agnostic), null
    count, approximate NDV. Single aggregate pass over the table.

    Float/double min/max are canonicalized through DECIMAL(38,9) before
    stringifying: Spark renders doubles >= 1e7 in scientific notation
    (1.2E7) while SQL engines' VARCHAR casts do not, so a raw string cast
    would make downstream comparisons depend on value magnitude. The
    decimal detour prints plain fixed-point digits identically everywhere
    (a binary double can never sit exactly on a half at the 9th decimal,
    so round-half direction differences cannot bite). Values the decimal
    cannot hold — |x| >= 1e18 or non-finite — fall back to the raw string
    cast instead of Spark's silent cast-overflow NULL (the canonical form
    is only cross-engine-stable inside the decimal range; out-of-range
    stats still beat absent ones)."""
    ftypes = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }

    def canon(col: str, agg) -> F.Column:
        c = agg(col)
        if ftypes.get(col) in ("float", "double"):
            in_range = (
                ~F.isnan(c) & (F.abs(c) < F.lit(1e18))
            )
            c = F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
                F.when(in_range, c.cast("decimal(38,9)").cast("string"))
                .otherwise(c.cast("string"))
            )
        return c.cast("string")

    aggs = []
    for c in columns:
        aggs += [
            canon(c, F.min).alias(f"{c}__min"),
            canon(c, F.max).alias(f"{c}__max"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd=0.02).alias(f"{c}__ndv"),
        ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    import pandas as pd

    pdf = pd.DataFrame(
        [
            (
                c,
                row[f"{c}__min"],
                row[f"{c}__max"],
                int(row[f"{c}__nulls"]),
                int(row[f"{c}__ndv"]),
            )
            for c in columns
        ],
        columns=["column", "min_val", "max_val", "n_nulls", "approx_ndv"],
    )
    return spark.createDataFrame(
        pdf.astype(object).where(pdf.notna(), None),
        "column string, min_val string, max_val string, n_nulls long, approx_ndv long",
    )
