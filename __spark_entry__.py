"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship geospatial query; ``queries()`` /
``oracle_sql()`` expose every implemented operator paired with its DuckDB
oracle (see fs2_osm_spark/queries/registry.py for the conventions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Geotag images from captions -> hex cell -> point-in-polygon join against
    synthetic OSM-derived polygons -> z/x/y tile assignment.
    """
    from fs2_osm_spark.plans.flagship import flagship_query

    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fs2_osm_spark.queries import queries_map

    return queries_map()


def oracle_sql() -> dict[str, str]:
    from fs2_osm_spark.queries import oracle_sql_map

    return oracle_sql_map()
