"""BPE merge training: hand-computed merges on a tiny vocabulary.

Pins the two semantics the oracle replay depends on: frequency-weighted
pair counting with OVERLAPPING adjacent pairs, and single-pass greedy
merging where ADJACENT occurrences of the winning pair all merge (the
double-space separator trick in `operators/bpe.py`).
"""

from __future__ import annotations

from map_reduce485_spark.operators.bpe import bpe_train


def test_bpe_hand_computed_merges(spark):
    # vocabulary: "abab" x3, "ab" x2, "ba" x1
    # step 1 pair counts: (a,b): 2*3 + 1*2 = 8 ; (b,a): 1*3 + 1*1 = 4
    #   -> merge (a b) -> ab ; "abab" becomes [ab, ab], "ab" becomes [ab]
    # step 2 pair counts: (ab,ab): 1*3 = 3 ; (b,a): 1 ("ba" untouched)
    #   -> merge (ab ab) -> abab
    words = spark.createDataFrame(
        [("abab", 3), ("ab", 2), ("ba", 1)], "word string, freq long"
    )
    rules = bpe_train(spark, words, 2)
    assert rules == [(1, "a b", "ab", 8), (2, "ab ab", "abab", 3)]


def test_bpe_adjacent_occurrences_merge_in_one_pass(spark):
    # "aaaa": pairs (a,a) x3 -> merge (a a).  Greedy left-to-right single
    # pass turns [a,a,a,a] into [aa,aa] (NOT [aa,a,a]); step 2's top pair
    # is then (aa,aa).
    words = spark.createDataFrame([("aaaa", 1)], "word string, freq long")
    rules = bpe_train(spark, words, 2)
    assert rules[0] == (1, "a a", "aa", 3)
    assert rules[1] == (2, "aa aa", "aaaa", 1)


def test_bpe_stops_when_no_pairs_left(spark):
    # single-char words produce no pairs: training stops early, no crash
    words = spark.createDataFrame([("a", 5), ("b", 3)], "word string, freq long")
    assert bpe_train(spark, words, 3) == []
