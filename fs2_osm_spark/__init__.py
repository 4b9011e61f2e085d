"""fs2_osm_spark — a PySpark-native geospatial / spatial-join / tiling engine.

A from-scratch re-expression of the capabilities of the reference
`gbastkowski/fs2-osm` (OSM entity decode -> normalized tables -> SQL feature
passes) as an idiomatic Spark DataFrame engine, extended with the scale layer
the reference delegates to PostGIS: H3-style hex / S2 cell indexing,
point-in-polygon joins, kNN, z/x/y tiling, dedup / similarity / text-analysis
operators for training-data pipelines, and per-partition lineage checkpoints.

Everything here derives from public knowledge only: the Apache Spark / PySpark
API, the reference repo's observable behavior, and published algorithms.
"""

__version__ = "0.1.0"
