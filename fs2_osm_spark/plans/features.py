"""The feature catalog — the reference's "query set" as parameterized
transforms (SURVEY.md §2.4; one function, N configs, replacing N copies of
INSERT…SELECT in /root/reference/postgres/src/main/scala/fs2/osm/postgres/*Feature.scala).

Each feature = (predicate over tags, projection of tags into typed columns,
geometry source). Line features read from assembled osm_lines (derived-table
reuse, R11 — CoastlineFeature.scala:25-30); polygon features read from the
union of simple-way polygons and relation multipolygons (two-pass union-all,
WaterFeature.scala:28-32).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _t(key: str) -> Column:
    return F.col("tags")[key]


@dataclass
class Feature:
    name: str
    source: str  # 'lines' | 'polygons'
    predicate: Callable[[], Column]
    # output column name -> expression over (tags, name available)
    projection: dict[str, Callable[[], Column]] = field(default_factory=dict)


# Catalog mirrors Main.scala:24-38 + mandatory features
# (PostgresExporter.scala:21); predicates cite the per-feature Scala.
FEATURES: list[Feature] = [
    # HighwayFeature.scala:38-54
    Feature(
        "highways",
        "lines",
        lambda: _t("highway").isNotNull(),
        {
            "kind": lambda: _t("highway"),
            "footway": lambda: _t("footway"),
            "sidewalk": lambda: _t("sidewalk"),
            "cycleway": lambda: _t("cycleway"),
            "busway": lambda: _t("busway"),
            "surface": lambda: _t("surface"),
            "bicycle_road": lambda: F.coalesce(_t("bicycle_road") == "yes", F.lit(False)),
        },
    ),
    # CoastlineFeature.scala:25-30
    Feature("coastlines", "lines", lambda: _t("natural") == "coastline"),
    # WaterwayFeature.scala:32-48
    Feature(
        "waterways",
        "lines",
        lambda: _t("waterway").isNotNull(),
        {"kind": lambda: _t("waterway")},
    ),
    # RailFeature.scala:33-51
    Feature(
        "rails",
        "lines",
        lambda: _t("railway").isNotNull(),
        {
            "kind": lambda: _t("railway"),
            "electrified": lambda: _t("electrified"),
            "maxspeed": lambda: _t("maxspeed"),
            "ref": lambda: _t("ref"),
        },
    ),
    # administrative_boundaries is NOT a generic line feature — see
    # admin_boundaries() below (closed ways + per-relation ST_Collect).
    # WaterFeature.scala:48,63 — kind defaulting via getOrElse
    Feature(
        "waters",
        "polygons",
        lambda: _t("natural") == "water",
        {"kind": lambda: F.coalesce(_t("water"), F.lit("unspecified"))},
    ),
    # BuildingFeature.scala / insert-into-buildings.sql
    Feature(
        "buildings",
        "polygons",
        lambda: _t("building").isNotNull(),
        {"kind": lambda: _t("building")},
    ),
    # LanduseFeature.scala
    Feature(
        "landuses",
        "polygons",
        lambda: _t("landuse").isNotNull(),
        {"kind": lambda: _t("landuse")},
    ),
    # IndustrialFeature.scala
    Feature("industrial", "polygons", lambda: _t("landuse") == "industrial"),
    # AmenityFeature.scala — landuse=industrial AND amenity=recycling
    Feature(
        "amenities",
        "polygons",
        lambda: (_t("landuse") == "industrial") & (_t("amenity") == "recycling"),
        {"kind": lambda: _t("amenity")},
    ),
    # LeisureFeature.scala
    Feature(
        "leisures",
        "polygons",
        lambda: _t("leisure").isNotNull(),
        {"kind": lambda: _t("leisure")},
    ),
    # WoodFeature.scala — natural=wood OR landuse=forest
    Feature(
        "woods",
        "polygons",
        lambda: (_t("natural") == "wood") | (_t("landuse") == "forest"),
    ),
    # RailwayFeature.scala — landuse=railway + operator columns
    Feature(
        "railways",
        "polygons",
        lambda: _t("landuse") == "railway",
        {
            "official_name": lambda: _t("official_name"),
            "operator": lambda: _t("operator"),
        },
    ),
    # ProtectedAreaFeature.scala — kind=protection_title
    Feature(
        "protected_areas",
        "polygons",
        lambda: _t("boundary") == "protected_area",
        {"kind": lambda: _t("protection_title")},
    ),
]


def run_feature(feature: Feature, lines: DataFrame, polygons: DataFrame) -> DataFrame:
    src = lines if feature.source == "lines" else polygons
    id_col = "way_id" if feature.source == "lines" else "polygon_id"
    cols = [
        F.col(id_col).alias("osm_id"),
        F.col("name"),
        F.col("tags"),
    ]
    for out_name, expr in feature.projection.items():
        cols.append(expr().alias(out_name))
    if feature.source == "lines":
        cols.append(F.col("geom"))
    else:
        cols.extend([F.col("outer"), F.col("inners")])
    return src.filter(feature.predicate()).select(*cols)


def highways_nodes(ways: DataFrame) -> DataFrame:
    """(highway_id, node_id) membership side table emitted alongside
    `highways` (HighwayFeature.scala:32-34 tableDefinitions). Exploded from
    the raw ways of highway-tagged lines — order is carried by `index` so
    the table also serves as the highway-local ways_nodes."""
    return (
        ways.filter(F.col("tags")["highway"].isNotNull())
        .select(
            F.col("osm_id").alias("highway_id"),
            F.posexplode("nodes").alias("index", "node_id"),
        )
        .select("highway_id", "node_id", "index")
    )


def admin_boundaries(
    lines: DataFrame, relations: DataFrame, relations_ways: DataFrame
) -> DataFrame:
    """administrative_boundaries: two passes, matching the reference.

    1. Closed ways tagged boundary=administrative (the dataGenerator INSERT,
       AdministrativeBoundaryFeature.scala:38-58 — note its ST_IsClosed).
    2. Relations with type='boundary' AND tags boundary='administrative'
       (boundaryRelations, :79-87): member-way geometries collected per
       relation ordered by membership index — the ST_Collect MultiLineString
       path (:89-106), expressed as the R21 sort_array(collect_list) shape.

    Output geometry is `geoms array<array<double>>` (a MultiLineString of
    packed lines); way rows carry a single-element array.
    """
    way_part = lines.filter(
        (F.col("tags")["boundary"] == "administrative") & F.col("is_closed")
    ).select(
        F.col("way_id").alias("osm_id"),
        "name",
        F.col("tags")["admin_level"].alias("admin_level"),
        F.col("tags"),
        F.array("geom").alias("geoms"),
    )
    rels = relations.filter(
        (F.col("type") == "boundary")
        & (F.col("tags")["boundary"] == "administrative")
    ).select(F.col("osm_id").alias("relation_id"), "name", "tags")
    members = (
        relations_ways.groupBy("relation_id", "way_id", "role")
        .agg(F.min("index").alias("index"))
        .join(lines.select("way_id", "geom"), "way_id")
        .join(rels, "relation_id")
    )
    rel_part = (
        members.groupBy("relation_id")
        .agg(
            F.first("name").alias("name"),
            F.first("tags").alias("tags"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("index", "way_id", "geom"))),
                lambda s: s.geom,
            ).alias("geoms"),
        )
        .select(
            F.col("relation_id").alias("osm_id"),
            "name",
            F.col("tags")["admin_level"].alias("admin_level"),
            F.col("tags"),
            "geoms",
        )
    )
    return way_part.unionByName(rel_part)


def run_all_features(
    lines: DataFrame,
    polygons: DataFrame,
    ways: DataFrame | None = None,
    relations: DataFrame | None = None,
    relations_ways: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Phase-B of the reference lifecycle (PostgresExporter.scala:57): every
    feature pass over the loaded tables. Callers persist `lines` first —
    the D1 broadcastThrough equivalent is compute-once, consume-many.
    `polygons` should be the UN-whitelisted closed-way ∪ multipolygon union
    (operators.assembly.all_polygons): each feature applies its own predicate,
    as the reference features do over raw ways."""
    out = {f.name: run_feature(f, lines, polygons) for f in FEATURES}
    if ways is not None:
        out["highways_nodes"] = highways_nodes(ways)
    if relations is not None and relations_ways is not None:
        out["administrative_boundaries"] = admin_boundaries(
            lines, relations, relations_ways
        )
    return out
