"""Deterministic vector corpus for the engine-native ANN/k-means fixtures.

The sf-dir `embeddings` table differs per scale factor, so a
fixture-recorded oracle over it would pin the xxhash64-seeded IVF and
k-means queries to one scale. This corpus is instead synthesized in-repo
(the synth/docs.py dedup pattern): 600 vectors in 64 dims drawn around 12
well-separated cluster centers, everything from per-entity
`np.random.default_rng(seed)` streams so the corpus is bit-identical
everywhere. Ground truth for the xxhash64-strided IVF search and the
Lloyd k-means fit is recorded driver-side by BRUTE FORCE
(synth/staging.py ensure_sim_fixture) and committed as parquet; the
portable md5 twins (sim_ivf_ann_md5 / sim_kmeans_fit_md5) keep covering
the sf-scaled tables with full DuckDB re-derivations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_SIM_VECS = 600
SIM_DIM = 64
SIM_CENTERS = 12
SIM_NOISE = 0.35


def _center(c: int) -> np.ndarray:
    return np.random.default_rng(30_000 + c).normal(0.0, 1.0, SIM_DIM)


def sim_corpus_pdf() -> pd.DataFrame:
    """(vec_id, v): 600 vectors = cluster center + per-vector noise."""
    centers = [_center(c) for c in range(SIM_CENTERS)]
    rows = []
    for i in range(N_SIM_VECS):
        rng = np.random.default_rng(31_000 + i)
        v = centers[i % SIM_CENTERS] + SIM_NOISE * rng.normal(0.0, 1.0, SIM_DIM)
        rows.append((i, v.tolist()))
    return pd.DataFrame(rows, columns=["vec_id", "v"])


def sim_corpus(spark) -> "DataFrame":  # noqa: F821 - pyspark DataFrame
    """The corpus as a Spark DataFrame (Arrow LocalRelation — tiny)."""
    return spark.createDataFrame(sim_corpus_pdf(), "vec_id long, v array<double>")
