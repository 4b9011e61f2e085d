"""End-to-end export lifecycle — the PostgresExporter.runExport equivalent.

Reference shape (/root/reference/postgres/src/main/scala/fs2/osm/postgres/
PostgresExporter.scala:41-58): Phase A streams entities through a 3-way
broadcastThrough fan-out into nodes/ways/relations sinks, folding a Summary
monoid; Phase B runs every feature's INSERT…SELECT after a barrier.

Spark-first re-expression:
- the fan-out (D1) becomes compute-once / consume-many: the decoded entity
  DataFrames are written once per kind — no re-decode, no per-entity objects;
- the way sink (S13, WayImporter.scala:25-53) writes `ways` plus the
  order-bearing exploded `ways_nodes(way_id, node_id, index)`;
- the relation sink (S14, RelationImporter.scala:21-70) splits members by
  kind and dedupes on (relation_id, member_id, role) keep-first — the
  ON CONFLICT DO NOTHING equivalent (R27);
- Summary (D6, Summary.scala:6-50) becomes a per-table inserted-count dict;
- Phase B materializes the whole feature catalog (run_all_features) after
  the raw tables land — Highway/Coastline consume the assembled osm_lines
  (derived-table reuse, R11), which is cached once.
"""

from __future__ import annotations

import os
import time

from fs2_osm_spark.catalog import read_table, write_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_osm_spark.operators.assembly import (
    all_polygons,
    build_osm_lines,
    simple_polygons,
)
from fs2_osm_spark.plans.features import run_all_features


def run_export(
    spark: SparkSession,
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame,
    relations_ways: DataFrame,
    output_root: str,
    sink_parallelism: int = 16,
    relations_nodes: DataFrame | None = None,
    relations_relations: DataFrame | None = None,
    phase_timings: dict[str, float] | None = None,
) -> dict[str, int]:
    """Load raw tables, then run the feature catalog. Returns the Summary:
    table name -> rows written.

    Phase A stays sequential (downstream reads depend on it); Phase B's
    feature passes are independent INSERT…SELECTs, so they are submitted
    as CONCURRENT Spark actions from a thread pool — the reference streams
    its feature passes through one connection sequentially, but on a
    cluster the scheduler interleaves independent small jobs and keeps
    executors busy (a 17-sink tail of driver round-trips otherwise
    serializes into fixed per-job latency). Both shared inputs (lines and
    the closed-way ∪ multipolygon union) are cached and MATERIALIZED
    before the pool starts, so concurrent consumers hit the cache instead
    of racing to recompute the assembly/stitch lineage per feature."""
    summary: dict[str, int] = {}
    tm = phase_timings if phase_timings is not None else {}

    def sink(df: DataFrame, name: str) -> DataFrame:
        from pyspark.sql import Observation

        path = os.path.join(output_root, name)
        t0 = time.time()
        # one job per sink, not two: the inserted-count Summary metric is
        # observed ON the write itself (CollectMetrics) instead of a
        # second count() job over the read-back — with 24 sink tables the
        # driver round-trips were half the phase wall. The REBALANCE hint
        # lets AQE size the write: tiny feature tables collapse to one
        # output file instead of one per cached partition (guide §6 —
        # same hint yields ~advisory-size files at cluster scale).
        obs = Observation()
        write_table(
            df.observe(obs, F.count(F.lit(1)).alias("n")).hint("rebalance"),
            path,
        )
        out = read_table(spark, path)
        summary[name] = int(obs.get["n"])
        tm[f"sink_{name}"] = round(time.time() - t0, 3)
        return out

    # ---- Phase A: raw tables (the importer fan-out) ----
    # The three entity sinks are independent (each consumes its own kind's
    # frames), so they run as concurrent Spark actions (guide §2.6): wall
    # time becomes max(decode) instead of sum(decode) — on the PBF path
    # each sink's job is dominated by the Python frame-decode pass.
    t_a = time.time()
    raw_tables = {"nodes": nodes, "ways": ways, "relations": relations}
    if sink_parallelism > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(sink_parallelism, len(raw_tables))
        ) as ex:
            raw_futs = {n: ex.submit(sink, df, n) for n, df in raw_tables.items()}
            raw_out = {n: fut.result() for n, fut in raw_futs.items()}
    else:
        raw_out = {n: sink(df, n) for n, df in raw_tables.items()}
    nodes_t, ways_t, rels_t = raw_out["nodes"], raw_out["ways"], raw_out["relations"]
    # the member tables of the way/relation sinks (WayImporter.scala:25-53,
    # RelationImporter.scala:52-71, DefaultSchema.scala:34-60): exploded
    # ways_nodes plus the three typed relation-member tables with the
    # keep-first ON CONFLICT DO NOTHING dedupe per unique constraint.
    # They are derived independently from already-materialized inputs, so
    # their four small sink jobs run CONCURRENTLY — sequential submission
    # paid four driver round-trips of fixed latency for no ordering gain.
    if relations_nodes is None or relations_relations is None:
        from fs2_osm_spark.synth.osm import (
            RELATIONS_NODES_SCHEMA,
            RELATIONS_RELATIONS_SCHEMA,
        )

        if relations_nodes is None:
            relations_nodes = spark.createDataFrame([], RELATIONS_NODES_SCHEMA)
        if relations_relations is None:
            relations_relations = spark.createDataFrame(
                [], RELATIONS_RELATIONS_SCHEMA
            )
    member_tables = {
        # derived from the MATERIALIZED ways table, not the caller's `ways`
        # pipeline: on the PBF path the latter would re-run the whole frame
        # decode just to explode the refs a second time
        "ways_nodes": ways_t.select(
            F.col("osm_id").alias("way_id"),
            F.posexplode("nodes").alias("index", "node_id"),
        ).select("way_id", "node_id", "index"),
        "relations_ways": relations_ways.groupBy(
            "relation_id", "way_id", "role"
        ).agg(F.min("index").alias("index")),
        "relations_nodes": relations_nodes.groupBy(
            "relation_id", "node_id", "role"
        ).agg(F.min("index").alias("index")),
        "relations_relations": relations_relations.groupBy(
            "parent_id", "child_id", "role"
        ).agg(F.min("index").alias("index")),
    }
    if sink_parallelism > 1:
        from concurrent.futures import ThreadPoolExecutor

        # honor the caller's parallelism cap in Phase A too (a caller
        # throttling to sink_parallelism=2 must not get 4 concurrent jobs)
        with ThreadPoolExecutor(
            max_workers=min(sink_parallelism, len(member_tables))
        ) as ex:
            futures = {
                n: ex.submit(sink, df, n) for n, df in member_tables.items()
            }
            for n, fut in futures.items():
                fut.result()
    else:
        for n, df in member_tables.items():
            sink(df, n)
    tm["phase_a_total"] = round(time.time() - t_a, 3)

    # ---- Phase B: feature passes (after the barrier) ----
    t_b = time.time()
    lines = build_osm_lines(ways_t, nodes_t).cache()
    lines.count()  # materialize before concurrent consumers
    tm["phase_b_lines"] = round(time.time() - t_b, 3)
    rw_t = read_table(spark, os.path.join(output_root, "relations_ways"))
    # feature passes each filter the UN-whitelisted closed-way ∪ multipolygon
    # union with their own predicate, like the reference's per-feature SQL;
    # cache it or every polygon feature re-runs the stitch applyInPandas
    t_p = time.time()
    polys = all_polygons(lines, rels_t, rw_t).cache()
    polys.count()
    tm["phase_b_polys"] = round(time.time() - t_p, 3)
    # the `polygons` table is way-sourced only (PolygonFeature.scala:30-32:
    # combineWays is commented out), with the exact taggedPolygons whitelist
    phase_b: dict[str, DataFrame] = {
        "osm_lines": lines,
        "polygons": simple_polygons(lines),
        **run_all_features(
            lines, polys, ways=ways_t, relations=rels_t, relations_ways=rw_t
        ),
    }
    try:
        if sink_parallelism > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=sink_parallelism) as ex:
                futures = {n: ex.submit(sink, df, n) for n, df in phase_b.items()}
                for n, fut in futures.items():
                    fut.result()  # propagate the first failure
        else:
            for n, df in phase_b.items():
                sink(df, n)
    finally:
        # a failed sink must not leak the Phase-B caches for the session
        lines.unpersist()
        polys.unpersist()
    tm["phase_b_total"] = round(time.time() - t_b, 3)
    return summary
