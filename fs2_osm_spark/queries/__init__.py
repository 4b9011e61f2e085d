"""Query registry: every implemented operator exposes a (spark_fn, oracle_sql)
pair consumed by ``__spark_entry__.py``. Importing the submodules populates
the registry via the @register decorator."""

from fs2_osm_spark.queries.registry import QUERIES, oracle_sql_map, queries_map

# Importing for registration side-effects.
from fs2_osm_spark.queries import relational  # noqa: E402,F401
from fs2_osm_spark.queries import geospatial  # noqa: E402,F401
from fs2_osm_spark.queries import dedup  # noqa: E402,F401
from fs2_osm_spark.queries import text  # noqa: E402,F401
from fs2_osm_spark.queries import similarity  # noqa: E402,F401
from fs2_osm_spark.queries import osm  # noqa: E402,F401
from fs2_osm_spark.queries import multimodal  # noqa: E402,F401
from fs2_osm_spark.queries import streaming_q  # noqa: E402,F401
from fs2_osm_spark.queries import scale_q  # noqa: E402,F401
from fs2_osm_spark.queries import relational2  # noqa: E402,F401
from fs2_osm_spark.queries import geom_q  # noqa: E402,F401
from fs2_osm_spark.queries import temporal  # noqa: E402,F401
from fs2_osm_spark.queries import lakehouse  # noqa: E402,F401
from fs2_osm_spark.queries import multimodal2  # noqa: E402,F401

__all__ = ["QUERIES", "queries_map", "oracle_sql_map"]
