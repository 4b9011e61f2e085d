"""End-to-end PBF lifecycle: writer -> wire decode -> export -> flagship,
checked for parity with the direct (non-wire) path and for crash resume."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from fs2_osm_spark.plans.pbf_pipeline import frame_tables, run_pbf_pipeline
from fs2_osm_spark.sources.pbf_writer import write_osm_pbf

N_ZONES = 48


@pytest.fixture(scope="module")
def pbf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pbf"))
    s = write_osm_pbf(spark, d, N_ZONES, n_files=6).collect()
    assert sum(r.n_zones for r in s) == N_ZONES
    assert len(s) == 6 and all(r.n_bytes > 100 for r in s)
    return d


def test_pbf_roundtrip_tables_match_synth(spark, pbf_dir):
    """The wire round trip reproduces the direct synth tables exactly —
    ids, tags, names, ordered refs, member split; coordinates on the
    standard 1e-7 deg lattice."""
    from fs2_osm_spark.synth.osm import osm_tables

    got = frame_tables(spark, pbf_dir)
    want = osm_tables(spark, N_ZONES)

    g = {r.osm_id: r for r in got["nodes"].collect()}
    w = {r.osm_id: r for r in want["nodes"].collect()}
    assert set(g) == set(w)
    for k in w:
        assert round(g[k].lon * 1e7) == round(w[k].lon * 1e7)
        assert round(g[k].lat * 1e7) == round(w[k].lat * 1e7)
        assert dict(g[k].tags or {}) == dict(w[k].tags or {})

    def norm(name, tags):
        # on the wire the name IS tags["name"] (real OSM shape); the synth
        # tables keep a derivative name column — normalize to compare
        t = dict(tags or {})
        if name:
            t["name"] = name
        return (t.get("name"), t)

    g = {r.osm_id: r for r in got["ways"].collect()}
    w = {r.osm_id: r for r in want["ways"].collect()}
    assert set(g) == set(w)
    for k in w:
        assert list(g[k].nodes) == list(w[k].nodes)  # order-bearing refs
        assert norm(g[k].name, g[k].tags) == norm(w[k].name, w[k].tags)

    g = {r.osm_id: (r.type,) + norm(r.name, r.tags)
         for r in got["relations"].collect()}
    w = {r.osm_id: (r.type,) + norm(r.name, r.tags)
         for r in want["relations"].collect()}
    assert g == w

    for tbl in ("relations_ways", "relations_nodes", "relations_relations"):
        g = sorted(map(tuple, got[tbl].collect()))
        w = sorted(map(tuple, want[tbl].collect()))
        assert g == w, tbl
        assert g, f"{tbl} must be exercised by the synth world"


def test_wire_info_round_trip(spark, pbf_dir):
    """S10 for ways/relations: the writer stamps deterministic Info
    (synth_info_fields) on every way/relation; the frame readers must
    decode version/epoch_ms/changeset/uid/user back exactly."""
    from fs2_osm_spark.sources.pbf_frames import (
        read_relations_from_frames,
        read_ways_from_frames,
    )
    from fs2_osm_spark.sources.pbf_writer import synth_info_fields

    for df, id_col in (
        (read_ways_from_frames(spark, pbf_dir), "way_id"),
        (read_relations_from_frames(spark, pbf_dir), "relation_id"),
    ):
        rows = df.select(
            id_col, "version", "epoch_ms", "changeset", "uid", "user"
        ).collect()
        assert rows
        for r in rows:
            ver, ts, cs, uid, user = synth_info_fields(r[0])
            assert (r.version, r.epoch_ms, r.changeset, r.uid, r.user) == (
                ver, ts * 1000, cs, uid, user
            ), r[0]


def test_pbf_pipeline_summary_and_resume(spark, pbf_dir):
    """Full lifecycle golden counts: the export Summary from the wire path
    equals the direct path's Summary table-for-table; the flagship stage
    resumes idempotently after an injected crash."""
    from fs2_osm_spark.plans.export import run_export
    from fs2_osm_spark.plans.lineage import LineageLog, read_all_batches
    from fs2_osm_spark.synth.osm import osm_tables

    with tempfile.TemporaryDirectory() as direct_root:
        t = osm_tables(spark, N_ZONES)
        want = run_export(
            spark, t["nodes"], t["ways"], t["relations"], t["relations_ways"],
            direct_root,
            relations_nodes=t["relations_nodes"],
            relations_relations=t["relations_relations"],
        )

    with tempfile.TemporaryDirectory() as root:
        # crash after 2 flagship batches
        with pytest.raises(RuntimeError, match="injected failure"):
            run_pbf_pipeline(
                spark, pbf_dir, root, n_images=400, n_batches=5, fail_after=2
            )
        flag_root = os.path.join(root, "flagship")
        assert len(LineageLog(spark, flag_root).completed()) == 2

        # resume: remaining batches only; export summary matches direct path
        out = run_pbf_pipeline(spark, pbf_dir, root, n_images=400, n_batches=5)
        assert out["summary"] == want
        assert out["batches"] == 3

        joined = read_all_batches(spark, flag_root)
        n_joined = joined.count()
        assert n_joined > 0
        # a point may sit in several overlapping polygons, but each
        # (image, polygon) pair appears exactly once across all batches
        assert joined.select("image_id", "polygon_id").distinct().count() == n_joined

        # idempotent: nothing left
        again = run_pbf_pipeline(spark, pbf_dir, root, n_images=400, n_batches=5)
        assert again["batches"] == 0
