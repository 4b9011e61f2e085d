"""Table loading helpers for the driver-generated parquet star schema.

Tables: region nation customer supplier part orders lineitem events
documents embeddings  (see /root/repo/TESTDATA.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table. Parquet scan -> Catalyst gets pushdown
    and column pruning for free; callers select/filter declaratively."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
