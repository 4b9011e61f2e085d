"""Catalog boundary: identifier mapping and the iceberg guard.

The iceberg handler cannot run end-to-end here (no jars in the container),
but its path->identifier mapping and its fail-fast guard are pure logic:
they must hold for the lineage layout (data/batch=<id> dirs + the batch=*
glob) and for a non-default catalog name from FS2_OSM_ICEBERG_CATALOG —
both regressed silently when the mapping used raw basenames and the guard
checked a hardcoded config key.
"""

from __future__ import annotations

import pandas as pd
import pytest

from fs2_osm_spark.catalog import _iceberg_ident, _split_batch


def test_split_batch_plain_path():
    assert _split_batch("/tmp/root/nodes") == ("/tmp/root/nodes", None)
    assert _split_batch("/tmp/root/nodes/") == ("/tmp/root/nodes", None)


def test_split_batch_lineage_layout():
    assert _split_batch("/tmp/r/data/batch=3") == ("/tmp/r/data", "3")
    assert _split_batch("/tmp/r/data/batch=a_b/") == ("/tmp/r/data", "a_b")
    assert _split_batch("/tmp/r/data/batch=*") == ("/tmp/r/data", "*")


def test_iceberg_ident_batch_dirs_map_to_one_table(monkeypatch):
    monkeypatch.delenv("FS2_OSM_ICEBERG_CATALOG", raising=False)
    # every batch dir and the glob resolve to the SAME partitioned table —
    # per-path basenames would yield invalid identifiers (db.batch=3)
    assert _iceberg_ident("/tmp/r/data/batch=3") == "lake.db.data"
    assert _iceberg_ident("/tmp/r/data/batch=77") == "lake.db.data"
    assert _iceberg_ident("/tmp/r/data/batch=*") == "lake.db.data"
    assert _iceberg_ident("/tmp/r/nodes") == "lake.db.nodes"


def test_iceberg_ident_sanitizes_and_honors_env(monkeypatch):
    monkeypatch.setenv("FS2_OSM_ICEBERG_CATALOG", "prod_lake")
    assert _iceberg_ident("/tmp/r/ways-nodes.v2") == "prod_lake.db.ways_nodes_v2"


def test_iceberg_ident_rejects_lossy_collisions(monkeypatch):
    # sanitization maps a-b, a.b, a_b onto the same identifier — the first
    # path claims it; aliasing a DIFFERENT path onto it must raise instead
    # of silently sharing table data
    monkeypatch.delenv("FS2_OSM_ICEBERG_CATALOG", raising=False)
    from fs2_osm_spark import catalog

    monkeypatch.setattr(catalog, "_IDENT_CLAIMS", {})
    assert _iceberg_ident("/tmp/c/a-b") == "lake.db.a_b"
    assert _iceberg_ident("/tmp/c/a-b") == "lake.db.a_b"  # same path: fine
    assert _iceberg_ident("/tmp/c/a-b/batch=7") == "lake.db.a_b"  # same table
    with pytest.raises(ValueError, match="collision"):
        _iceberg_ident("/tmp/c/a.b")
    with pytest.raises(ValueError, match="collision"):
        _iceberg_ident("/tmp/c/a_b")


def test_iceberg_guard_uses_env_catalog_name(spark, monkeypatch):
    """The fail-fast guard must check spark.sql.catalog.<env name>, not a
    hardcoded 'lake' — a non-default catalog previously always tripped."""
    from fs2_osm_spark import catalog

    monkeypatch.setenv("FS2_OSM_ICEBERG_CATALOG", "mylake")
    df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    with pytest.raises(RuntimeError, match="spark.sql.catalog.mylake"):
        catalog._write_iceberg(df, "/tmp/r/nodes", "overwrite")


def test_iceberg_write_rejects_batch_glob(spark, monkeypatch):
    from fs2_osm_spark import catalog

    monkeypatch.delenv("FS2_OSM_ICEBERG_CATALOG", raising=False)
    df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    # guard order: the glob is rejected before any catalog interaction
    with pytest.raises(ValueError, match="batch glob"):
        catalog._write_iceberg(df, "/tmp/r/data/batch=*", "overwrite")
