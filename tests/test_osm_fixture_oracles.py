"""Anti-drift defense for the staged OSM fixture (fixtures/osm_256).

The osm_lines_assembly / osm_simple_polygons / geom_stats_osm_lines
oracles re-derive assembly semantics in independent SQL over these staged
tables, while the Spark side assembles from LIVE synthesis — the bridge is
that fixture rows == today's synthesis. A drifting generator must fail
HERE (loudly, naming the table) rather than shift both sides of an oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from fs2_osm_spark.synth.staging import (
    OSM_FIXTURE_ZONES,
    ensure_osm_fixture,
    osm_fixture_path,
)


def _sorted(df: pd.DataFrame, by: list[str]) -> pd.DataFrame:
    return df.sort_values(by).reset_index(drop=True)


def test_osm_fixture_matches_live_synthesis(spark):
    from fs2_osm_spark.synth.osm import osm_tables

    ensure_osm_fixture(spark)
    t = osm_tables(spark, OSM_FIXTURE_ZONES)

    nodes_fx = _sorted(pq.read_table(osm_fixture_path("nodes")).to_pandas(),
                       ["osm_id"])
    nodes_live = _sorted(
        t["nodes"].select("osm_id", "lon", "lat", "name").toPandas(), ["osm_id"]
    )
    pd.testing.assert_frame_equal(nodes_fx, nodes_live, check_exact=True)

    ways_live = t["ways"].toPandas().sort_values("osm_id").reset_index(drop=True)
    ways_fx = _sorted(pq.read_table(osm_fixture_path("ways")).to_pandas(),
                      ["osm_id"])
    pd.testing.assert_frame_equal(ways_fx, ways_live[["osm_id", "name"]],
                                  check_exact=True)

    wn_fx = _sorted(pq.read_table(osm_fixture_path("ways_nodes")).to_pandas(),
                    ["way_id", "idx"])
    wn_live = pd.DataFrame(
        [(r.osm_id, i, int(nid))
         for r in ways_live.itertuples() for i, nid in enumerate(r.nodes)],
        columns=["way_id", "idx", "node_id"],
    )
    pd.testing.assert_frame_equal(wn_fx, _sorted(wn_live, ["way_id", "idx"]),
                                  check_exact=True)

    tags_fx = _sorted(pq.read_table(osm_fixture_path("way_tags")).to_pandas(),
                      ["way_id", "key"])
    tags_live = pd.DataFrame(
        [(r.osm_id, k, r.tags[k])
         for r in ways_live.itertuples() for k in sorted(r.tags)],
        columns=["way_id", "key", "value"],
    )
    pd.testing.assert_frame_equal(tags_fx, _sorted(tags_live, ["way_id", "key"]),
                                  check_exact=True)

    rels_live = t["relations"].toPandas().sort_values("osm_id").reset_index(drop=True)
    rels_fx = _sorted(pq.read_table(osm_fixture_path("relations")).to_pandas(),
                      ["osm_id"])
    pd.testing.assert_frame_equal(
        rels_fx, rels_live[["osm_id", "name", "type"]], check_exact=True
    )
    rt_fx = _sorted(pq.read_table(osm_fixture_path("relation_tags")).to_pandas(),
                    ["relation_id", "key"])
    rt_live = pd.DataFrame(
        [(r.osm_id, k, r.tags[k])
         for r in rels_live.itertuples() for k in sorted(r.tags)],
        columns=["relation_id", "key", "value"],
    )
    pd.testing.assert_frame_equal(rt_fx, _sorted(rt_live, ["relation_id", "key"]),
                                  check_exact=True)
    rw_fx = _sorted(pq.read_table(osm_fixture_path("relations_ways")).to_pandas(),
                    ["relation_id", "index"])
    rw_live = _sorted(t["relations_ways"].toPandas(), ["relation_id", "index"])
    pd.testing.assert_frame_equal(rw_fx, rw_live, check_exact=True)
    rn_fx = _sorted(pq.read_table(osm_fixture_path("relations_nodes")).to_pandas(),
                    ["relation_id", "index"])
    rn_live = _sorted(t["relations_nodes"].toPandas(), ["relation_id", "index"])
    pd.testing.assert_frame_equal(rn_fx, rn_live, check_exact=True)
    rr_fx = _sorted(
        pq.read_table(osm_fixture_path("relations_relations")).to_pandas(),
        ["parent_id", "index"])
    rr_live = _sorted(t["relations_relations"].toPandas(), ["parent_id", "index"])
    pd.testing.assert_frame_equal(rr_fx, rr_live, check_exact=True)


def test_osm_fixture_geom_extra_recompute(spark):
    """n_points_simplified (the one RECORDED column) recomputed live with
    today's Douglas-Peucker over a deterministic sample of ways."""
    from fs2_osm_spark.functions.geom_ops import simplify_dp

    ensure_osm_fixture(spark)
    extra = pq.read_table(osm_fixture_path("geom_extra")).to_pandas()
    nodes = pq.read_table(osm_fixture_path("nodes")).to_pandas()
    wn = pq.read_table(osm_fixture_path("ways_nodes")).to_pandas()
    coord = nodes.set_index("osm_id")[["lon", "lat"]]
    sample = extra.iloc[:: max(1, len(extra) // 25)]
    for r in sample.itertuples():
        ids = wn[wn.way_id == r.way_id].sort_values("idx")["node_id"]
        geom = coord.reindex(ids).dropna().to_numpy().reshape(-1)
        assert len(simplify_dp(np.asarray(geom), 1e-4)) // 2 == (
            r.n_points_simplified
        ), r.way_id
