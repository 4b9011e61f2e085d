"""Recall/cost curve for the IVF-PQ ADC search (BENCH/PQ.md evidence).

Sweeps (n_probe, rerank) over the sf0.001 embeddings corpus, measuring
recall@5 against exact brute force plus the candidate volume (rows ADC
actually scores — the scale-cost proxy: at 10^12 vectors the dominant cost
is candidates-scored-per-query, and probes/rerank are the knobs trading it
against recall). Also reports the Lloyd-trained codebook at the default
operating point, isolating what codebook quality buys at equal cost.

Run: python tools/pq_recall.py  (writes BENCH/pq_recall.json)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(REPO, "BENCH", "pq_recall.json")
SF = "/root/testdata/sf0.001"
N_Q, K = 20, 5


def main() -> None:
    from pyspark.sql import functions as F

    from fs2_osm_spark.functions.text import h16_sql
    from fs2_osm_spark.operators.similarity import (
        ivf_assign,
        pq_adc_search,
        pq_codes,
        pq_train,
    )
    from fs2_osm_spark.session import get_spark

    spark = get_spark(cores=8, app_name="pq_recall")
    corpus = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").alias("v")
    )
    h = F.expr(h16_sql("CAST(vec_id AS STRING)")).cast("bigint")
    sampled = (
        corpus.withColumn("h", h)
        .filter(F.pmod(F.col("h"), F.lit(17)) == 0)
        .orderBy("h", "vec_id").limit(16).collect()
    )
    cents = [(i, np.asarray(r.v, np.float64)) for i, r in enumerate(sampled)]
    cm = np.stack([c for _, c in cents])
    cb_rows = corpus.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    cmat = np.asarray([r.v for r in cb_rows], np.float64)
    subs_fixed = [cmat[:, m * 8 : (m + 1) * 8] for m in range(8)]

    # exact ground truth
    rows = corpus.orderBy("vec_id").collect()
    vecs = np.asarray([r.v for r in rows], np.float64)
    ids = np.asarray([r.vec_id for r in rows])
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn[:N_Q] @ vn.T
    exact = {}
    for qi in range(N_Q):
        s = sims[qi].copy()
        s[ids == qi] = -2
        exact[qi] = set(ids[np.argsort(-s)[:K]])
    q_ids = np.arange(N_Q, dtype=np.int64)
    qmat = vecs[:N_Q]

    def run(subs, n_probe, rerank):
        index = pq_codes(ivf_assign(corpus, cents), subs).persist()
        list_sizes = {
            r.centroid_id: r.n
            for r in index.groupBy("centroid_id").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        cmn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
        probes = np.argsort(-(qn @ cmn.T), axis=1, kind="stable")[:, :n_probe]
        cand = int(
            sum(list_sizes.get(int(c), 0) for row in probes for c in row)
        )
        res = pq_adc_search(
            index, corpus, q_ids=q_ids, qmat=qmat, cents=cm, subs=subs,
            n_probe=n_probe, rerank=rerank, top_k=K,
        ).collect()
        index.unpersist()
        got: dict[int, set] = {}
        for r in res:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        rec = float(
            np.mean([len(exact[qi] & got.get(qi, set())) / K for qi in range(N_Q)])
        )
        return {"n_probe": n_probe, "rerank": rerank,
                "candidates_scored": cand, "recall_at_5": round(rec, 3)}

    out = {"corpus": 500, "queries": N_Q, "grid_fixed_codebook": [],
           "trained_codebook": None}
    for n_probe in (2, 4, 6, 8):
        for rerank in (20, 40, 100):
            out["grid_fixed_codebook"].append(run(subs_fixed, n_probe, rerank))
            print(out["grid_fixed_codebook"][-1])
    trained = pq_train(corpus, subs_fixed, n_iters=2, round_decimals=9)
    out["trained_codebook"] = run(trained, 6, 40)
    print("trained@6/40:", out["trained_codebook"])
    tmp = OUT_JSON + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, OUT_JSON)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
