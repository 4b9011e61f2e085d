"""Anti-drift + structural checks for the dedup ground-truth fixture.

The committed fixtures/dedup_oracle/*.parquet files are what the driver's
DuckDB oracles read for the xxhash64 dedup trio; if the corpus generator or
a hash kernel changes, the LIVE recomputation here diverges from the
committed files and fails loudly (instead of the oracle quietly pinning a
stale answer)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _committed(name: str) -> pd.DataFrame:
    from fs2_osm_spark.synth.staging import dedup_fixture_path

    return pq.read_table(dedup_fixture_path(name)).to_pandas()


def test_fixture_matches_live_ground_truth(spark):
    from fs2_osm_spark.synth.staging import dedup_ground_truth

    live = dedup_ground_truth(spark)
    for name, pdf in live.items():
        want = _committed(name)
        got = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        want = want.sort_values(list(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype(np.int64), want.astype(np.int64), check_names=True,
            obj=name,
        )


def test_exact_dup_mutants_are_found_everywhere():
    """Every i%3==2 mutant is byte-identical to its base: hamming 0 pairs
    in both simhash fixtures, same minhash cluster in the CC fixture."""
    from fs2_osm_spark.synth.docs import DEDUP_MUT_OFFSET, N_DEDUP_DOCS

    exact_ids = [i for i in range(N_DEDUP_DOCS) if i % 3 == 2]
    for name in ("simhash_d3", "simhash_d8"):
        pdf = _committed(name)
        pairs = {
            (a, b): h
            for a, b, h in zip(pdf.id_a, pdf.id_b, pdf.hamming)
        }
        for i in exact_ids:
            key = (i, i + DEDUP_MUT_OFFSET)
            assert pairs.get(key) == 0, (name, key, pairs.get(key))
    cc = _committed("minhash_cc").set_index("id")["cluster"]
    for i in exact_ids:
        assert cc.get(i) is not None and cc.get(i) == cc.get(
            i + DEDUP_MUT_OFFSET
        ), i


def test_corpus_is_deterministic():
    from fs2_osm_spark.synth.docs import dedup_corpus_pdf

    a = dedup_corpus_pdf()
    b = dedup_corpus_pdf()
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 800
    # structured mutants exist at all three distances
    assert (a.doc_id < 1_000_000).sum() == 400


def test_popcount64_matches_python():
    from fs2_osm_spark.synth.docs import popcount64

    rng = np.random.default_rng(3)
    vals = rng.integers(-(2**63), 2**63 - 1, size=200, dtype=np.int64)
    got = popcount64(vals.view(np.uint64))
    want = np.array([bin(int(v) & (2**64 - 1)).count("1") for v in vals])
    assert (got == want).all()
