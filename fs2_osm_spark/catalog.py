"""Table-format boundary: one routing function for every engine write.

The reference exports to Postgres tables; this engine exports to lake
tables. All sinks (export fan-out, lineage log, batch outputs) call
``write_table``/``read_table`` here instead of ``df.write.parquet`` inline,
so the storage format is an interface fact with a single switch — not a
comment. The container ships no Iceberg jars, so the default handler is
parquet; the ``iceberg`` handler shows the exact swap (DataFrameWriterV2
against a catalog identifier) and fails with a clear message when the
runtime lacks the catalog, rather than an opaque ClassNotFound deep inside
a job. Tests register a monkeypatch format and re-run the lineage resume
suite through it to prove the boundary is real.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

WriteFn = Callable[[DataFrame, str, str], None]
ReadFn = Callable[[SparkSession, str], DataFrame]


def _write_parquet(df: DataFrame, path: str, mode: str) -> None:
    df.write.mode(mode).parquet(path)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _iceberg_ident(path: str) -> str:
    # lake layout <root>/<table> -> <catalog>.<namespace>.<table>
    cat = os.environ.get("FS2_OSM_ICEBERG_CATALOG", "lake")
    return f"{cat}.db.{os.path.basename(path.rstrip('/'))}"


def _write_iceberg(df: DataFrame, path: str, mode: str) -> None:
    if "spark.sql.catalog.lake" not in dict(
        df.sparkSession.sparkContext.getConf().getAll()
    ):
        raise RuntimeError(
            "iceberg table format selected but no 'lake' catalog is "
            "configured (spark.sql.catalog.lake=org.apache.iceberg.spark."
            "SparkCatalog + iceberg-spark-runtime jars required)"
        )
    ident = _iceberg_ident(path)
    if mode == "append":
        df.writeTo(ident).append()
    else:
        df.writeTo(ident).createOrReplace()


def _read_iceberg(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.table(_iceberg_ident(path))


WRITERS: dict[str, WriteFn] = {"parquet": _write_parquet, "iceberg": _write_iceberg}
READERS: dict[str, ReadFn] = {"parquet": _read_parquet, "iceberg": _read_iceberg}

_format = os.environ.get("FS2_OSM_TABLE_FORMAT", "parquet")


def table_format() -> str:
    return _format


def set_table_format(fmt: str) -> None:
    """Switch the engine's table format (must be a registered handler)."""
    global _format
    if fmt not in WRITERS or fmt not in READERS:
        raise ValueError(f"unknown table format {fmt!r}; known: {sorted(WRITERS)}")
    _format = fmt


def write_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    WRITERS[_format](df, path, mode)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return READERS[_format](spark, path)
