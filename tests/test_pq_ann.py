"""IVF-PQ ADC search (sim_pq_ann) — recall, packing, and plan hygiene.

The DuckDB oracle (queries/similarity.py::_pq_ann_oracle) certifies exact
cross-engine agreement of codes / integer LUTs / ADC sums / rerank; these
tests pin the SEARCH QUALITY and the physical plan shape, which no SQL twin
can express:

- recall@5 vs exact brute force stays above a floor, and — the sharper
  property — within a small gap of the IVF probe ceiling (the fraction of
  true neighbors that live in the probed lists at all). The PQ/ADC layer
  itself must be near-lossless; coarse-quantizer misses are the probe
  budget's cost, not an ADC defect.
- pq_codes packs per-subspace argmin indices into 4-bit fields of one
  BIGINT, bit-for-bit what plain-python argmin produces.
- the ADC scoring plan is broadcast equi-join + integer arithmetic: no
  CartesianProduct anywhere.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE


def _exact_top5(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").orderBy("vec_id")
    rows = emb.collect()
    vecs = np.asarray([r.embedding for r in rows], np.float64)
    ids = np.asarray([r.vec_id for r in rows])
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn[:20] @ vn.T
    exact = {}
    for qi in range(20):
        s = sims[qi].copy()
        s[ids == qi] = -2
        exact[qi] = set(ids[np.argsort(-s)[:5]])
    return vecs, ids, vn, exact


def test_pq_ann_recall_vs_exact_and_vs_probe_ceiling(spark):
    from fs2_osm_spark.queries.registry import QUERIES
    from fs2_osm_spark.queries.similarity import PQ_PROBE

    got: dict[int, set[int]] = {}
    for r in QUERIES["sim_pq_ann"].fn(spark, SF_SMOKE).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    vecs, ids, vn, exact = _exact_top5(spark)

    # reconstruct the query's own centroid sample to compute the IVF probe
    # ceiling: what fraction of true neighbors even live in probed lists
    from pyspark.sql import functions as F

    from fs2_osm_spark.functions.text import h16_sql

    corpus = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").alias("v"))
    )
    h = F.expr(h16_sql("CAST(vec_id AS STRING)")).cast("bigint")
    sampled = (
        corpus.withColumn("h", h)
        .filter(F.pmod(F.col("h"), F.lit(17)) == 0)
        .orderBy("h", "vec_id")
        .limit(16)
        .collect()
    )
    cm = np.asarray([r.v for r in sampled], np.float64)
    cmn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    assign = np.argmax(vn @ cmn.T, axis=1)
    probes = np.argsort(-(vn[:20] @ cmn.T), axis=1, kind="stable")[:, :PQ_PROBE]

    recalls, ceilings = [], []
    for qi in range(20):
        true = exact[qi]
        recalls.append(len(true & got.get(qi, set())) / 5)
        pos = {ids[i]: i for i in range(len(ids))}
        in_probe = [assign[pos[t]] in probes[qi] for t in true]
        ceilings.append(float(np.mean(in_probe)))
    mean_recall = float(np.mean(recalls))
    mean_ceiling = float(np.mean(ceilings))
    # measured r07 at sf0.001: recall 0.58 against a 0.64 probe ceiling
    assert mean_recall >= 0.5, (mean_recall, recalls)
    # the ADC+rerank layer must recover nearly everything the probed lists
    # contain — a lossy shortlist or broken LUT drops this hard
    assert mean_recall >= mean_ceiling - 0.10, (mean_recall, mean_ceiling)


def test_pq_codes_match_plain_python_argmin(spark):
    from pyspark.sql import functions as F

    from fs2_osm_spark.operators.similarity import pq_codes

    corpus = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").alias("v"))
        .withColumn("centroid_id", F.lit(0).cast("long"))
    )
    cb = np.asarray(
        [r.v for r in corpus.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()],
        np.float64,
    )
    subs = [cb[:, m * 8 : (m + 1) * 8] for m in range(8)]
    packed = {
        r.vec_id: r.pq_code
        for r in pq_codes(corpus, subs).filter(F.col("vec_id") < 40).collect()
    }
    vecs = {
        r.vec_id: np.asarray(r.v, np.float64)
        for r in corpus.filter(F.col("vec_id") < 40).collect()
    }
    for vid, v in vecs.items():
        for m in range(8):
            x = v[m * 8 : (m + 1) * 8]
            d2 = [float(np.dot(x - c, x - c)) for c in subs[m]]
            want = int(np.argmin(d2))
            got = (packed[vid] >> (4 * m)) & 15
            assert got == want, (vid, m, got, want)


def test_pq_ann_plan_has_no_cartesian(spark):
    from fs2_osm_spark.queries.registry import QUERIES

    plan = QUERIES["sim_pq_ann"].fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pq_train_improves_reconstruction(spark):
    """Lloyd-refined codebooks must beat the fixed sample codebook on the
    objective they optimize — mean reconstruction quality. Measured r07 at
    sf0.001: fixed 0.572 vs trained 0.652 mean recon_cos."""
    from pyspark.sql import functions as F

    from fs2_osm_spark.operators.similarity import pq_encode_recon, pq_train

    corpus = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", F.col("embedding").alias("v"))
    )
    cmat = np.asarray(
        [r.v for r in corpus.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()],
        np.float64,
    )
    subs0 = [cmat[:, m * 8 : (m + 1) * 8] for m in range(8)]
    trained = pq_train(corpus, subs0, n_iters=2, round_decimals=9)
    # deterministic: a second fit lands on the identical codebook
    again = pq_train(corpus, subs0, n_iters=2, round_decimals=9)
    for a, b in zip(trained, again):
        assert (a == b).all()
    fixed_mean = (
        pq_encode_recon(corpus, subs0).agg(F.avg("recon_cos")).collect()[0][0]
    )
    trained_mean = (
        pq_encode_recon(corpus, trained).agg(F.avg("recon_cos")).collect()[0][0]
    )
    assert trained_mean > fixed_mean + 0.03, (fixed_mean, trained_mean)


@pytest.mark.parametrize("scale", [1_000_000])
def test_pq_lut_integer_quantization(scale):
    from fs2_osm_spark.operators.similarity import pq_lut

    rng = np.random.default_rng(7)
    q = rng.normal(size=(3, 64))
    cb = rng.normal(size=(16, 64))
    subs = [cb[:, m * 8 : (m + 1) * 8] for m in range(8)]
    luts = pq_lut(q, subs, scale)
    assert luts.shape == (3, 128)
    assert luts.dtype == np.int64
    # spot-check one entry against the direct L2² definition
    m, j = 3, 5
    x = q[0, m * 8 : (m + 1) * 8]
    d2 = float(np.dot(x - subs[m][j], x - subs[m][j]))
    assert luts[0, m * 16 + j] == int(np.floor(d2 * scale + 0.5))
