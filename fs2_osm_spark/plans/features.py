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
    # AdministrativeBoundaryFeature.scala:74-82
    Feature(
        "administrative_boundaries",
        "lines",
        lambda: _t("boundary") == "administrative",
        {"admin_level": lambda: _t("admin_level")},
    ),
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


def run_all_features(lines: DataFrame, polygons: DataFrame) -> dict[str, DataFrame]:
    """Phase-B of the reference lifecycle (PostgresExporter.scala:57): every
    feature pass over the loaded tables. Callers persist `lines` first —
    the D1 broadcastThrough equivalent is compute-once, consume-many."""
    return {f.name: run_feature(f, lines, polygons) for f in FEATURES}
