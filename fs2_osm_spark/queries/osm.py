"""OSM-pipeline queries. The synthesized OSM world isn't visible through
the DuckDB star views, so these were historically rows-only; round 5
staged the deterministic 256-zone tables as fixtures/osm_256 parquet,
which lets DuckDB REIMPLEMENT the assembly semantics in independent SQL
(osm_lines_assembly, osm_simple_polygons; geom_stats_osm_lines in
geom_q.py). Golden decode semantics stay pinned by
tests/test_decode_assembly.py; wire-decode streams whose payloads aren't
dtype-stable scalars remain rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_osm_spark.operators.assembly import (
    build_multipolygons,
    build_osm_lines,
    simple_polygons,
)
from fs2_osm_spark.plans.features import FEATURES, run_all_features
from fs2_osm_spark.queries.registry import register
from fs2_osm_spark.sources.dense_decode import decode_dense_blocks
from fs2_osm_spark.synth.osm import golden_dense_blocks, osm_tables

N_ZONES = 256


def _driver_safe_tags(df: DataFrame) -> DataFrame:
    """Serialize the MapType `tags` column to deterministic JSON (sorted keys).

    The driver's canonicalizer sorts every output column with pandas and
    crashes on dict values ("unhashable type: dict") — registered queries
    must only emit sortable scalars. array_sort over map_entries fixes the
    key order so the JSON string is deterministic across partitions.
    """
    tags_json = F.to_json(
        F.map_from_entries(F.array_sort(F.map_entries("tags")))
    ).alias("tags_json")
    others = [c for c in df.columns if c != "tags"]
    return df.select(*others, tags_json)


@register("osm_dense_decode", oracle=None)
def osm_dense_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PBF dense-node decode kernel (S5-S10) over the golden encoded blocks."""
    blocks = spark.createDataFrame(golden_dense_blocks())
    return _driver_safe_tags(decode_dense_blocks(blocks))


def _fixture_pts_cte() -> str:
    """Shared CTE body: way vertices resolved + ordered from the staged OSM
    fixture (the DuckDB-visible twin of posexplode + resolve join)."""
    from fs2_osm_spark.synth.staging import osm_fixture_path

    return f"""
    SELECT wn.way_id, wn.idx, n.lon, n.lat
    FROM read_parquet('{osm_fixture_path("ways_nodes")}') wn
    JOIN read_parquet('{osm_fixture_path("nodes")}') n ON wn.node_id = n.osm_id
    """


# Spark: (c * 1e6).cast(bigint) truncates toward zero; DuckDB trunc() is
# also toward-zero, so the quantized closure test matches bit-for-bit.
_Q = "CAST(trunc({v} * 1000000.0) AS BIGINT)"


def _lines_assembly_oracle() -> str:
    qfl = _Q.format(v="arg_min(lon, idx)")
    qll = _Q.format(v="arg_max(lon, idx)")
    qft = _Q.format(v="arg_min(lat, idx)")
    qlt = _Q.format(v="arg_max(lat, idx)")
    return f"""
    WITH pts AS ({_fixture_pts_cte()})
    SELECT way_id,
           CAST(count(*) AS BIGINT) AS n_pts,
           ({qfl} = {qll} AND {qft} = {qlt}) AS is_closed
    FROM pts GROUP BY way_id
    """


@register("osm_lines_assembly", oracle=_lines_assembly_oracle())
def osm_lines_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """osm_lines: posexplode + join + ordered collect -> packed coords
    (R1-R4). Hard-oracled (r05): DuckDB re-derives n_pts and the 1e-6
    quantized closure INDEPENDENTLY from the staged fixture tables
    (fixtures/osm_256) — both engines assemble from the raw rows, nothing
    is recorded. Fixture == live synth is pinned by the anti-drift test."""
    from fs2_osm_spark.synth.staging import ensure_osm_fixture

    ensure_osm_fixture(spark)
    t = osm_tables(spark, N_ZONES)
    lines = build_osm_lines(t["ways"], t["nodes"])
    return lines.select(
        "way_id", F.col("n_pts").cast("bigint").alias("n_pts"), "is_closed"
    )


def _simple_polygons_oracle() -> str:
    from fs2_osm_spark.operators.assembly import POLYGON_KEYS, POLYGON_VALUE_IN
    from fs2_osm_spark.synth.staging import osm_fixture_path

    keys = ", ".join(f"'{k}'" for k in POLYGON_KEYS)
    val_conds = " OR ".join(
        "(key = '{k}' AND value IN ({vs}))".format(
            k=k, vs=", ".join(f"'{v}'" for v in vs)
        )
        for k, vs in POLYGON_VALUE_IN.items()
    )
    tags = osm_fixture_path("way_tags")
    qfl = _Q.format(v="arg_min(lon, idx)")
    qll = _Q.format(v="arg_max(lon, idx)")
    qft = _Q.format(v="arg_min(lat, idx)")
    qlt = _Q.format(v="arg_max(lat, idx)")
    return f"""
    WITH pts AS ({_fixture_pts_cte()}),
    lines AS (
        SELECT way_id,
               CAST(count(*) AS BIGINT) AS n_pts,
               ({qfl} = {qll} AND {qft} = {qlt}) AS is_closed
        FROM pts GROUP BY way_id
    ),
    keyed AS (
        SELECT DISTINCT way_id FROM read_parquet('{tags}')
        WHERE key IN ({keys}) OR {val_conds}
    )
    SELECT l.way_id AS polygon_id,
           CAST(2 * l.n_pts AS BIGINT) AS n_coords
    FROM lines l JOIN keyed k ON l.way_id = k.way_id
    WHERE l.is_closed
      AND l.way_id NOT IN (
          SELECT way_id FROM read_parquet('{tags}')
          WHERE key = 'area' AND value = 'no'
      )
    """


@register("osm_simple_polygons", oracle=_simple_polygons_oracle())
def osm_simple_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `polygons` table (closed ways + exact tag
    whitelist). Hard-oracled (r05): the DuckDB twin re-applies the
    whitelist — generated from the SAME POLYGON_KEYS / POLYGON_VALUE_IN
    constants, so the predicate can't drift in one place only — plus the
    quantized-closure filter, independently in SQL over the staged
    fixture."""
    from fs2_osm_spark.synth.staging import ensure_osm_fixture

    ensure_osm_fixture(spark)
    t = osm_tables(spark, N_ZONES)
    lines = build_osm_lines(t["ways"], t["nodes"])
    return simple_polygons(lines).select(
        "polygon_id", F.size("outer").cast("bigint").alias("n_coords")
    )


@register("osm_multipolygons", oracle=None)
def osm_multipolygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based multipolygon stitching (replaces R13's per-relation loop)."""
    t = osm_tables(spark, N_ZONES)
    lines = build_osm_lines(t["ways"], t["nodes"])
    mp = build_multipolygons(t["relations"], t["relations_ways"], lines)
    return mp.select(
        "polygon_id",
        "ring_no",
        F.size("outer").alias("outer_coords"),
        F.size("inners").alias("n_holes"),
    )


@register("osm_feature_catalog", oracle=None)
def osm_feature_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All catalog features (SURVEY.md §2.4) -> per-feature row counts,
    incl. the highways_nodes side table and the two-pass (closed ways +
    relation ST_Collect) administrative_boundaries."""
    from fs2_osm_spark.operators.assembly import all_polygons

    t = osm_tables(spark, N_ZONES)
    lines = build_osm_lines(t["ways"], t["nodes"]).cache()
    polys = all_polygons(lines, t["relations"], t["relations_ways"])
    outs = run_all_features(
        lines,
        polys,
        ways=t["ways"],
        relations=t["relations"],
        relations_ways=t["relations_ways"],
    )
    per_feature = None
    for name, df in outs.items():
        c = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("feature"), "n"
        )
        per_feature = c if per_feature is None else per_feature.unionByName(c)
    return per_feature


@register("osm_frame_source_decode", oracle=None)
def osm_frame_source_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-layer framing contract (PbfReader.scala:11-29 semantics): write
    a deterministic framed+zlib fixture, scan via binaryFile, inflate, parse
    blocks, dense-decode to nodes — rows-only (binary path has no SQL twin;
    golden values pinned in tests/test_scale_layer.py)."""
    import os
    import tempfile

    from fs2_osm_spark.sources.pbf_frames import (
        encode_block,
        read_nodes_from_frames,
        write_frames,
    )

    d = tempfile.mkdtemp(prefix="opf_")
    path = os.path.join(d, "fixture.opf")
    blocks = [
        encode_block(
            ids=list(range(1, 101)),
            lats=[500000000] + [1000000] * 99,
            lons=[80000000] + [1000000] * 99,
            keys_vals=[1, 2, 0] * 100,
            string_table=["", "highway", "residential"],
        )
    ]
    write_frames(path, blocks)
    return _driver_safe_tags(read_nodes_from_frames(spark, path))


@register("osm_export_summary", oracle=None)
def osm_export_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full runExport lifecycle (PostgresExporter.scala:41-58 parity):
    raw-table fan-out -> phase barrier -> all feature passes; returns the
    Summary fold (table -> rows written), one row per materialized table."""
    import tempfile

    from fs2_osm_spark.plans.export import run_export

    t = osm_tables(spark, 128)
    root = tempfile.mkdtemp(prefix="export_")
    summary = run_export(
        spark, t["nodes"], t["ways"], t["relations"], t["relations_ways"], root
    )
    return spark.createDataFrame(
        sorted(summary.items()), "table_name string, n_rows long"
    )


@register(
    "osm_decode_semantics_oracle",
    oracle="""
    SELECT order_id, pos,
           decoded_id,
           CAST(round(1e-9 * (500000000 + 100 * coord_sum), 9) AS DOUBLE) AS coord
    FROM (
        SELECT l_orderkey AS order_id,
               CAST(row_number() OVER w AS BIGINT) AS pos,
               CAST(sum(l_partkey) OVER w AS BIGINT) AS decoded_id,
               sum(l_quantity * 100000) OVER w AS coord_sum
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
                     ROWS UNBOUNDED PRECEDING)
    )
    """,
)
def osm_decode_semantics_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense-decode CONTRACT (SURVEY §4.3 items 1-2) under the oracle on
    neutral data: delta chains are running sums in arrival order, and the
    coordinate formula 1e-9*(offset + granularity*sum) — here offset=5e8,
    granularity=100 — must match bit-for-bit in both engines."""
    from fs2_osm_spark.io import load
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.row_number()
        .over(
            Window.partitionBy("l_orderkey").orderBy(
                "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
            )
        )
        .cast("bigint")
        .alias("pos"),
        F.sum("l_partkey").over(w).cast("bigint").alias("decoded_id"),
        F.round(
            1e-9 * (F.lit(500000000) + 100 * F.sum(F.col("l_quantity") * 100000).over(w)),
            9,
        )
        .cast("double")
        .alias("coord"),
    )


def _wire_fixture(spark: SparkSession):
    """One framed PBF file holding a dense block + a ways/relations block."""
    import os
    import tempfile

    from fs2_osm_spark.sources.pbf_frames import encode_block, write_frames
    from fs2_osm_spark.sources.proto_wire import (
        encode_entity_group,
        encode_relation,
        encode_way,
    )

    st = ["", "highway", "residential", "type", "multipolygon", "outer", "inner"]
    ways = [
        encode_way(100 + i, keys=[1], vals=[2], refs=[10 * i + 1, 2, 3])
        for i in range(20)
    ]
    rels = [
        encode_relation(
            900 + i, keys=[3], vals=[4], roles_sid=[5, 6],
            memids=[100 + i, 1], types=[1, 1],
        )
        for i in range(5)
    ]
    blocks = [
        encode_block(
            ids=list(range(1, 11)), lats=[1000000] * 10, lons=[2000000] * 10,
            keys_vals=[], string_table=[""],
        ),
        encode_entity_group(st, ways=ways, relations=rels),
    ]
    d = tempfile.mkdtemp(prefix="opf_entities_")
    path = os.path.join(d, "fixture.osm.pbf")
    write_frames(path, blocks)
    return path


@register("osm_way_frame_decode", oracle=None)
def osm_way_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Way groups decoded from real protobuf PBF frames (S8 at wire level:
    delta refs, string-table tags — WayImporter.scala:25-53)."""
    from fs2_osm_spark.sources.pbf_frames import read_ways_from_frames

    ways = read_ways_from_frames(spark, _wire_fixture(spark))
    return ways.select(
        "way_id",
        "tags_json",
        F.size("refs").alias("n_refs"),
        F.element_at("refs", 1).alias("first_ref"),
        F.element_at("refs", -1).alias("last_ref"),
    )


@register("osm_relation_frame_decode", oracle=None)
def osm_relation_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relation groups decoded from real protobuf PBF frames (S9 at wire
    level: delta member ids, roles/types — RelationImporter.scala:21-70)."""
    from fs2_osm_spark.sources.pbf_frames import read_relations_from_frames

    rels = read_relations_from_frames(spark, _wire_fixture(spark))
    return rels.select(
        "relation_id",
        "tags_json",
        F.size("member_ids").alias("n_members"),
        F.array_join("member_roles", ",").alias("roles_csv"),
        F.array_join("member_types", ",").alias("types_csv"),
        F.element_at("member_ids", -1).alias("last_member_id"),
    )


@register("osm_dense_info_decode", oracle=None)
def osm_dense_info_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DenseInfo decode (S10): version/timestamp/changeset/uid/user carried
    alongside dense nodes, delta chains + string-table usernames."""
    import os
    import tempfile

    from fs2_osm_spark.sources.pbf_frames import (
        encode_block,
        read_node_info_from_frames,
        write_frames,
    )
    from fs2_osm_spark.sources.proto_wire import encode_dense_info

    info = encode_dense_info(
        versions=[1, 3, 2],
        timestamps=[1_500_000_000, 10, -5],     # deltas (seconds)
        changesets=[900, 1, 1],
        uids=[42, 0, -2],
        user_sids=[1, 1, -1],                   # deltas into string table
    )
    block = encode_block(
        ids=[100, 1, 1],
        lats=[0, 0, 0],
        lons=[0, 0, 0],
        keys_vals=[],
        string_table=["", "alice", "bob"],
        dense_info=info,
    )
    d = tempfile.mkdtemp(prefix="opf_info_")
    path = os.path.join(d, "fixture.osm.pbf")
    write_frames(path, [block])
    return read_node_info_from_frames(spark, path)
