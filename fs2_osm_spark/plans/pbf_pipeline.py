"""End-to-end PBF lifecycle: framed .osm.pbf -> decode -> export -> features
-> flagship spatial join, as one resumable job.

This stitches the full reference lifecycle (PbfReader -> importers ->
PostgresExporter.runExport, PostgresExporter.scala:41-58) to the north-rule
flagship: S4/S5 framing+protobuf, S6-S10 decode, S12-S14 sinks + the 17
feature passes (run_export), then the image PIP join + tiling, batched with
per-batch lineage rows so a killed run resumes idempotently
(plans/lineage.py).

The frame readers yield wire-shaped rows (tags_json, delta-decoded refs,
member arrays); `frame_tables` bridges them to the engine's normalized
schemas — the name column lifts from tags["name"] (which stays in the map,
as in real OSM data; FIXTURES.md: name = tags['name'] when present),
relation members explode to the (relation_id, way_id, index, role) table
filtered to way members, exactly the reference's RelationImporter split
(RelationImporter.scala:21-70).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def frame_tables(
    spark: SparkSession, pbf_dir: str, share_relations: bool = False
) -> dict[str, DataFrame]:
    """Decoded wire rows -> normalized nodes/ways/relations/relations_ways.

    share_relations=True persists the decoded relation frames so the FOUR
    consumers (the relations sink + the three member-table splits) share a
    single Python frame-decode pass instead of re-decoding per action; the
    handle is returned under "_rels_raw" for the caller to unpersist once
    the consumers have materialized.
    """
    from fs2_osm_spark.sources.pbf_frames import (
        read_nodes_from_frames,
        read_relations_from_frames,
        read_ways_from_frames,
    )

    nodes = read_nodes_from_frames(spark, pbf_dir)

    tags_map = F.from_json("tags_json", "map<string,string>")
    ways = (
        read_ways_from_frames(spark, pbf_dir)
        .select(
            F.col("way_id").alias("osm_id"),
            tags_map.alias("_tags"),
            F.col("refs").alias("nodes"),
        )
        .select(
            "osm_id",
            F.col("_tags")["name"].alias("name"),
            "nodes",
            F.col("_tags").alias("tags"),
        )
    )

    rels_raw = read_relations_from_frames(spark, pbf_dir).select(
        "relation_id", tags_map.alias("_tags"),
        "member_ids", "member_roles", "member_types",
    )
    if share_relations:
        rels_raw = rels_raw.persist()
    relations = rels_raw.select(
        F.col("relation_id").alias("osm_id"),
        F.col("_tags")["name"].alias("name"),
        F.col("_tags")["type"].alias("type"),
        F.col("_tags").alias("tags"),
    )
    members = rels_raw.select(
        "relation_id",
        F.posexplode(
            F.arrays_zip("member_ids", "member_roles", "member_types")
        ).alias("index", "m"),
    ).select(
        "relation_id",
        F.col("m.member_ids").alias("member_id"),
        F.col("index").cast("int").alias("index"),
        F.col("m.member_roles").alias("role"),
        F.col("m.member_types").alias("member_type"),
    )
    # RelationImporter.scala:52-71: one typed split per member table
    relations_ways = members.filter(F.col("member_type") == "way").select(
        "relation_id", F.col("member_id").alias("way_id"), "index", "role"
    )
    relations_nodes = members.filter(F.col("member_type") == "node").select(
        "relation_id", F.col("member_id").alias("node_id"), "index", "role"
    )
    relations_relations = members.filter(
        F.col("member_type") == "relation"
    ).select(
        F.col("relation_id").alias("parent_id"),
        F.col("member_id").alias("child_id"),
        "index",
        "role",
    )
    return {
        "nodes": nodes,
        "ways": ways,
        "relations": relations,
        "relations_ways": relations_ways,
        "relations_nodes": relations_nodes,
        "relations_relations": relations_relations,
        "_rels_raw": rels_raw if share_relations else None,
    }


def run_pbf_pipeline(
    spark: SparkSession,
    pbf_dir: str,
    output_root: str,
    n_images: int = 2_000,
    n_batches: int = 8,
    fail_after: int | None = None,
    phase_timings: dict[str, float] | None = None,
) -> dict:
    """The full lifecycle. Returns {"summary": export Summary dict,
    "batches": batches processed this invocation}.

    The flagship stage writes batched by a coarse tile stripe through the
    lineage log — kill and re-submit to resume from the last completed
    batch (fail_after is the pytest crash hook)."""
    from fs2_osm_spark.operators.assembly import feature_polygons
    from fs2_osm_spark.plans.export import run_export
    from fs2_osm_spark.plans.flagship import flagship_from_tables
    from fs2_osm_spark.plans.lineage import run_batched
    from fs2_osm_spark.synth.images import images_table

    from fs2_osm_spark.catalog import read_table

    tm = phase_timings if phase_timings is not None else {}
    t0 = time.time()
    t = frame_tables(spark, pbf_dir, share_relations=True)
    export_root = os.path.join(output_root, "export")
    try:
        summary = run_export(
            spark, t["nodes"], t["ways"], t["relations"], t["relations_ways"],
            export_root,
            relations_nodes=t["relations_nodes"],
            relations_relations=t["relations_relations"],
            phase_timings=tm,
        )
    finally:
        if t["_rels_raw"] is not None:
            t["_rels_raw"].unpersist()
    tm["export_total"] = round(time.time() - t0, 3)

    t1 = time.time()
    # polygon corpus from the MATERIALIZED export tables: the raw-frame
    # variant re-ran the whole Python wire decode of ways+nodes+relations a
    # second time just to assemble geometry the export phase had already
    # loaded. The exported relations_ways is the keep-first dedupe of the
    # raw memberships, and build_multipolygons opens with exactly that
    # dedupe, so the assembled polygons are identical by construction.
    polygons = feature_polygons(
        read_table(spark, os.path.join(export_root, "ways")),
        read_table(spark, os.path.join(export_root, "nodes")),
        read_table(spark, os.path.join(export_root, "relations")),
        read_table(spark, os.path.join(export_root, "relations_ways")),
    ).select("polygon_id", "outer", "inners")
    images = images_table(spark, n_images)
    result = flagship_from_tables(images, polygons)
    # cache the slim join OUTPUT before batching: run_batched issues one
    # action per batch plus the distinct() scan, and without the cache each
    # action re-runs the whole upstream (image synthesis incl. per-image
    # PNG encode) — 6s/batch of pure recompute at 2k images. The output is
    # (image_id, polygon_id, cell, tile_x, tile_y): far smaller than the
    # bytes-bearing input. At a scale where even that exceeds memory, stage
    # it to parquet partitioned BY the batch column instead, so each batch
    # filter becomes partition pruning rather than recompute.
    batched = result.withColumn(
        "batch", F.pmod(F.col("tile_x"), F.lit(n_batches))
    ).cache()
    try:
        n = run_batched(
            spark, batched, "batch", os.path.join(output_root, "flagship"),
            fail_after=fail_after,
        )
    finally:
        batched.unpersist()
    tm["flagship_batched"] = round(time.time() - t1, 3)
    return {"summary": summary, "batches": n}
