"""Unit checks for the distributed BPE trainer (operators/bpe.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _vocab(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["word", "cnt"]), "word string, cnt long"
    )


def test_learns_most_frequent_pair_first(spark):
    from fs2_osm_spark.operators.bpe import bpe_train

    # 'ab' appears in every word; weighted count 5+3 beats everything
    merges, syms = bpe_train(_vocab(spark, [("abx", 5), ("aby", 3)]), 1)
    (left, right, pc, _) = merges[0]
    assert (left, right, pc) == ("a", "b", 8)
    s = {r.word: r.s for r in syms.collect()}
    assert s["abx"] == ["ab", "x", "</w>"]
    assert s["aby"] == ["ab", "y", "</w>"]


def test_greedy_merge_is_leftmost_nonoverlapping(spark):
    """'aaaa' with pair (a,a) must become [aa, aa, </w>], and 'aaa'
    [aa, a, </w>] — the classic overlap trap."""
    from fs2_osm_spark.operators.bpe import bpe_train

    merges, syms = bpe_train(_vocab(spark, [("aaaa", 2), ("aaa", 1)]), 1)
    assert merges[0][:2] == ("a", "a")
    s = {r.word: r.s for r in syms.collect()}
    assert s["aaaa"] == ["aa", "aa", "</w>"]
    assert s["aaa"] == ["aa", "a", "</w>"]


def test_merges_compound_across_rounds(spark):
    """Round 2 can pick a pair involving round 1's product."""
    from fs2_osm_spark.operators.bpe import bpe_train

    merges, syms = bpe_train(_vocab(spark, [("abc", 4)]), 2)
    assert merges[0][:2] == ("a", "b")
    # after merging 'ab', the best (and only interior) pair is (ab, c)
    assert merges[1][:2] == ("ab", "c")
    s = syms.collect()[0].s
    assert s == ["abc", "</w>"]


def test_tie_breaks_lexicographically(spark):
    from fs2_osm_spark.operators.bpe import bpe_train

    # 'zy' and 'ab' both occur once -> (a, b) wins the (left, right) sort;
    # every pair in the two words occurs exactly once (incl. the ones
    # touching </w>), so the tie set is the full pair population
    merges, _ = bpe_train(_vocab(spark, [("zy", 1), ("ab", 1)]), 1)
    assert merges[0][:2] == ("a", "b")


def test_token_totals_decrease_by_pair_count(spark):
    """Each applied merge removes exactly one symbol per merged pair, so
    tokens_after must drop by the GREEDY (non-overlapping) apply count,
    which is <= the overlapping pair_count used for selection."""
    from fs2_osm_spark.operators.bpe import bpe_train

    vocab = _vocab(spark, [("abab", 3), ("ab", 2)])
    before = 3 * 5 + 2 * 3  # chars + </w> per word, weighted
    merges, _ = bpe_train(vocab, 1)
    left, right, pc, after = merges[0]
    assert (left, right) == ("a", "b")
    assert after == before - (3 * 2 + 2 * 1)
