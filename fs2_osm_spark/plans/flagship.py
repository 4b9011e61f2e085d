"""Flagship end-to-end query (SURVEY.md §7.1 step 4).

Target shape: geotag images from captions -> hex cell -> PIP join against
OSM-derived polygons -> z/x/y tile assignment. Until the spatial layer lands
(next milestone), the flagship runs the ordered-assembly + join-chain slice
so the driver smoke check exercises a real multi-operator plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fs2_osm_spark.queries.registry import QUERIES

    return QUERIES["r01_ordered_assembly"].fn(spark, sf_dir)
