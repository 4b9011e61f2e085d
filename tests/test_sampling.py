"""Two-phase stratified top-k == single-window formulation, exactly.

The registered text_stratified_sample query uses the direct per-class
window (fine at oracle scale); stratified_topk_by_hash is the hot-class
decomposition a 10^12-row class needs. These tests pin that the
decomposition changes the PLAN, not the ANSWER — under several input
partitionings — and that the phase-2 input stays bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

KEEP = 50


def _classed(spark):
    from fs2_osm_spark.functions.text import (
        LANG_MARKERS,
        h16_sql,
        marker_count_sql,
    )

    l1, l2, l3 = LANG_MARKERS.keys()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    c1 = F.expr(marker_count_sql(LANG_MARKERS[l1]))
    c2 = F.expr(marker_count_sql(LANG_MARKERS[l2]))
    c3 = F.expr(marker_count_sql(LANG_MARKERS[l3]))
    pred = (
        F.when((c1 >= c2) & (c1 >= c3), l1)
        .when(c2 >= c3, l2)
        .otherwise(l3)
    )
    h = F.expr(h16_sql("CAST(doc_id AS STRING)"))
    return docs.select(
        "doc_id", pred.alias("pred_lang"), h.alias("h")
    )


def test_two_phase_equals_single_window_across_partitionings(spark):
    from pyspark.sql import Window

    from fs2_osm_spark.operators.sampling import stratified_topk_by_hash

    classed = _classed(spark)
    w = Window.partitionBy("pred_lang").orderBy("h", "doc_id")
    want = sorted(
        (r.pred_lang, r.rank, r.doc_id)
        for r in classed.select(
            "doc_id", "pred_lang",
            F.row_number().over(w).cast("bigint").alias("rank"),
        ).filter(F.col("rank") <= KEEP).collect()
    )
    for n_parts in (1, 7, 32):
        got = sorted(
            (r.pred_lang, r.rank, r.doc_id)
            for r in stratified_topk_by_hash(
                classed.repartition(n_parts), "pred_lang", "h", "doc_id", KEEP
            ).collect()
        )
        assert got == want, n_parts


def test_two_phase_survivor_set_is_bounded(spark):
    from pyspark.sql import Window

    from fs2_osm_spark.operators.sampling import stratified_topk_by_hash

    classed = _classed(spark).repartition(8)
    # re-derive phase 1 exactly as the operator does and count survivors
    local_w = Window.partitionBy("pred_lang", "_pid").orderBy("h", "doc_id")
    survivors = (
        classed.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrank", F.row_number().over(local_w))
        .filter(F.col("_lrank") <= KEEP)
    )
    n_classes = classed.select("pred_lang").distinct().count()
    assert survivors.count() <= 8 * n_classes * KEEP
    # and the operator still returns at most keep per class
    out = stratified_topk_by_hash(classed, "pred_lang", "h", "doc_id", KEEP)
    per_class = out.groupBy("pred_lang").count().collect()
    assert all(r["count"] <= KEEP for r in per_class)
