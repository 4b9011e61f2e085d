"""Deterministic document corpus for the engine-native dedup fixtures.

The sf-dir `documents` table differs per scale factor, so a fixture-recorded
oracle over it would pin the queries to one scale. This corpus is instead
synthesized in-repo (the images/audio/video fixture pattern): 400 base docs
over a shared Zipf-ish vocabulary plus one mutant each, cycling through the
three structures the near-dup operators must separate —

  i % 3 == 0  append 3 rare tokens   (high Jaccard, small hamming)
  i % 3 == 1  replace ~10% of words  (moderate distance)
  i % 3 == 2  exact duplicate        (distance 0)

Everything derives from per-doc `np.random.default_rng(seed)` streams, so
the corpus is bit-identical everywhere; ground truth for the xxhash64
MinHash/SimHash pipelines is recorded driver-side by BRUTE FORCE
(synth/staging.py ensure_dedup_fixture) and committed as parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_DEDUP_DOCS = 400
DEDUP_MUT_OFFSET = 1_000_000
_VOCAB = [f"w{i}" for i in range(240)]
_RARE = [f"rare{i}" for i in range(40)]


def _doc_words(i: int) -> list[str]:
    rng = np.random.default_rng(9000 + i)
    n = 40 + int(rng.integers(0, 41))
    # squared uniform skews draws toward low ids: shared high-frequency
    # tokens (boilerplate) + a long tail, the shape real corpora have
    idx = np.floor(len(_VOCAB) * rng.random(n) ** 2).astype(int)
    return [_VOCAB[j] for j in idx]


def dedup_corpus_pdf() -> pd.DataFrame:
    """(doc_id, text): 400 base docs + 400 structured mutants."""
    rows: list[tuple[int, str]] = []
    for i in range(N_DEDUP_DOCS):
        words = _doc_words(i)
        rows.append((i, " ".join(words)))
        rng = np.random.default_rng(77_000 + i)
        mode = i % 3
        if mode == 0:
            extra = [_RARE[int(j)] for j in rng.integers(0, len(_RARE), 3)]
            mut = words + extra
        elif mode == 1:
            mut = list(words)
            n_swap = max(1, len(mut) // 10)
            for pos in rng.integers(0, len(mut), n_swap):
                mut[int(pos)] = _VOCAB[int(rng.integers(0, len(_VOCAB)))]
        else:
            mut = words
        rows.append((i + DEDUP_MUT_OFFSET, " ".join(mut)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def dedup_corpus(spark) -> "DataFrame":  # noqa: F821 - pyspark DataFrame
    """The corpus as a Spark DataFrame (Arrow LocalRelation — tiny)."""
    return spark.createDataFrame(dedup_corpus_pdf(), "doc_id long, text string")


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 has no
    bitwise_count): SWAR bit-twiddling, exact for all 64-bit values."""
    x = x.astype(np.uint64, copy=True)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)
