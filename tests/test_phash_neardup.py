"""Near-dup corpus + phash clustering: anti-drift and structural truth.

The committed fixture (fixtures/phash_corpus.parquet) is the oracle's only
ground truth, so (1) live synthesis must reproduce it bit-for-bit and
(2) the clustering the engine produces must match the corpus construction:
every base id forms one cluster of exactly its 5 variants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fs2_osm_spark.synth.images import ND_VARIANTS, neardup_batch
from fs2_osm_spark.synth.staging import PHASH_N_BASE, ensure_phash_corpus


@pytest.fixture(scope="module")
def corpus_pdf() -> pd.DataFrame:
    return pd.read_parquet(ensure_phash_corpus())


def test_fixture_matches_live_synthesis(corpus_pdf):
    # sample of bases re-synthesized live; bytes AND recorded hash identical
    sample_ids = np.array([0, 1, 7, 63, PHASH_N_BASE - 1], dtype=np.int64)
    live = neardup_batch(sample_ids).set_index("img_id")
    fixt = corpus_pdf.set_index("img_id")
    for img_id, row in live.iterrows():
        f = fixt.loc[img_id]
        assert bytes(f["bytes"]) == bytes(row["bytes"]), img_id
        assert int(f["phash"]) == int(row["phash"]), img_id
        assert f["fmt"] == row["fmt"]


def test_corpus_shape(corpus_pdf):
    assert len(corpus_pdf) == PHASH_N_BASE * len(ND_VARIANTS)
    per_src = corpus_pdf.groupby("src_id").size()
    assert (per_src == len(ND_VARIANTS)).all()


def test_variant_distances(corpus_pdf):
    """o/re/jq/br share a hash (margin beats noise+codec+brightness);
    fl sits at exactly ND_FLIP_CELLS bits; cross-base stays far outside
    the verify threshold."""
    by_src = corpus_pdf.pivot(index="src_id", columns="variant", values="phash")
    for v in ("re", "jq", "br"):
        assert (by_src[v] == by_src["o"]).all(), v
    d_fl = [
        bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
        for a, b in zip(by_src["fl"], by_src["o"])
    ]
    assert set(d_fl) == {4}
    o = by_src["o"].to_numpy().astype(np.uint64)
    x = o[:, None] ^ o[None, :]
    pop = np.zeros_like(x, dtype=np.int64)
    while x.any():
        pop += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    iu = np.triu_indices(len(o), 1)
    assert pop[iu].min() > 7  # above the full-recall banding guarantee


def test_clusters_are_exactly_the_variant_groups(spark):
    from fs2_osm_spark.queries.multimodal2 import img_phash_neardup

    out = img_phash_neardup(spark, "unused").toPandas()
    assert len(out) == PHASH_N_BASE * len(ND_VARIANTS)
    out["src"] = out.img_id.str.split("~").str[0]
    # every corpus image clusters with exactly its own variant group,
    # labeled by the lexicographically smallest member (the ~br variant)
    sizes = out.groupby("cluster").size()
    assert len(sizes) == PHASH_N_BASE
    assert (sizes == len(ND_VARIANTS)).all()
    n_src_per_cluster = out.groupby("cluster")["src"].nunique()
    assert (n_src_per_cluster == 1).all()


def test_neardup_table_matches_batch(spark):
    """Distributed generation is partition-count-invariant and identical to
    the driver-side batch (the bench's 100k staging path)."""
    from fs2_osm_spark.synth.images import neardup_table

    out = (
        neardup_table(spark, 8, partitions=5)
        .toPandas()
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    ref = (
        neardup_batch(np.arange(8, dtype=np.int64))
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    assert out.img_id.tolist() == ref.img_id.tolist()
    assert out.phash.tolist() == ref.phash.tolist()
    assert all(bytes(a) == bytes(b) for a, b in zip(out["bytes"], ref["bytes"]))


def test_image_queries_arrow_conf_independent(spark):
    """Registered queries run under the DRIVER'S session, where
    arrow.pyspark.enabled defaults FALSE (the r05 lineage lesson) — pin
    every new round-7 driver-side shape under an arrow-off session:
    the mapInPandas pixel pass (img_augment), the
    spark.createDataFrame(pd.DataFrame(binary...)) clip construction
    (video_scene_cuts — the exact r05 failure shape), and the broadcast
    HOF-cosine retrieval (img_text_retrieval)."""
    conf = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        from fs2_osm_spark.queries.multimodal2 import (
            N_SCENE_VIDEOS,
            SCENE_VIDEO_FRAMES,
            img_augment,
            img_text_retrieval,
            video_scene_cuts,
        )

        assert len(img_augment(spark, "unused").toPandas()) == 2_000
        cuts = video_scene_cuts(spark, "unused").toPandas()
        assert len(cuts) == N_SCENE_VIDEOS * (SCENE_VIDEO_FRAMES - 1)
        ret = img_text_retrieval(spark, "/root/testdata/sf0.001").toPandas()
        assert len(ret) > 0
    finally:
        spark.conf.set(conf, prev)
