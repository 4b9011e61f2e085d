"""Registry pairing each Spark query with its DuckDB oracle SQL.

The driver's correctness gate runs every ``queries()[name]`` at sf=0.01 and
compares row count / schema / order-insensitive value hash against
``oracle_sql()[name]`` executed by DuckDB over the same parquet tables.
Queries with no SQL-expressible semantics register oracle=None and get a
rows-only check.

Conventions that keep the comparison stable:
- alias every computed column identically on both sides;
- cast integral outputs to bigint, floats to double rounded to a fixed
  number of decimals;
- outputs must be deterministic and partition-count-invariant (explicit
  ORDER BY before LIMIT, explicit tie-breaks in window ranks, no
  monotonically_increasing_id).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over pre-registered views, or None


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
