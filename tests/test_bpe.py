"""BPE tokenizer training (operators/bpe.py): training semantics,
greedy merge application, word-boundary protection, and the
contentless-doc contract."""

from __future__ import annotations

import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators import bpe


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_train_picks_most_frequent_pair_with_deterministic_ties(spark):
    # "ab" x3, "cd" x3 -> tie on count; 'a b' < 'c d' lexicographically
    docs = _docs(spark, ["ab ab cd", "ab cd cd"])
    merges = bpe.train_bpe(docs, n_merges=2)
    assert merges[0][1:4] == ("a", "b", "ab")
    assert merges[0][4] == 3
    assert merges[1][1:4] == ("c", "d", "cd")


def test_merges_chain_and_apply_greedily_left_to_right(spark):
    # 'aaa' x4: round 0 merges (a,a) with count 8 (two positions per
    # word); greedy application turns ' a a a ' into ' aa a ' — the
    # leftmost pair wins, exactly BPE order
    docs = _docs(spark, ["aaa aaa", "aaa aaa"])
    merges = bpe.train_bpe(docs, n_merges=2)
    assert merges[0][1:4] == ("a", "a", "aa")
    assert merges[0][4] == 8
    # round 1 sees each word as (aa, a): pair ('aa', 'a') count 4
    assert merges[1][1:4] == ("aa", "a", "aaa")
    assert merges[1][4] == 4
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    assert counts == {0: 2, 1: 2}  # each 'aaa' is one token now


def test_merges_never_cross_word_boundaries(spark):
    # corpus where 'b a' is frequent ACROSS words ('...b a...') but
    # never within one: the double-space join must keep it unmergeable
    docs = _docs(spark, ["ab ab ab a", "ab a ab a"])
    merges = bpe.train_bpe(docs, n_merges=1)
    assert merges[0][1:4] == ("a", "b", "ab")
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    # every 'ab' word -> 1 token, every 'a' word -> 1 token
    assert counts == {0: 4, 1: 4}


def test_adjacent_disjoint_sites_both_merge_like_reference_bpe(spark):
    """Round-9 review finding: with single-space boundaries the
    replace pattern consumed the shared boundary space and skipped
    every other merge site in runs — 'abab' became (ab) a b and
    'aaaa' became (aa) a a, which is NOT reference greedy BPE. The
    double-space representation fixes it: token-disjoint adjacent
    sites all merge in one scan."""
    docs = _docs(spark, ["abab abab", "abab abab"])
    merges = bpe.train_bpe(docs, n_merges=1)
    assert merges[0][1:4] == ("a", "b", "ab")
    assert merges[0][4] == 8  # both sites per word counted
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    # each 'abab' -> (ab)(ab): 2 tokens per word, 2 words per doc
    assert counts == {0: 4, 1: 4}


def test_even_self_pair_runs_merge_greedily(spark):
    """'aaaa' under merge (a,a) must become (aa)(aa) — 2 tokens, the
    Sennrich greedy result — not (aa) a a."""
    docs = _docs(spark, ["aaaa aaaa", "aaaa aaaa"])
    merges = bpe.train_bpe(docs, n_merges=1)
    assert merges[0][1:4] == ("a", "a", "aa")
    assert merges[0][4] == 12  # 3 adjacent positions per word x 4
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    assert counts == {0: 4, 1: 4}  # (aa)(aa) x 2 words


def test_unicode_line_terminators_split_like_any_char(spark):
    """Round-9 review finding: Java's regex dot excludes U+0085/
    U+2028/U+2029 (which \\s+ tokenization does NOT strip), so a
    dot-based char splitter silently skips them; [\\s\\S] must treat
    them as ordinary symbols."""
    docs = _docs(spark, ["ab ab", "a b a b"])
    merges = bpe.train_bpe(docs, n_merges=1)
    # every pair ties at 2; UTF-8 binary order (both engines' string
    # order) makes ('a', NEL) the smallest pair string, so it merges —
    # a dot-based splitter would never surface NEL as a symbol at all
    assert merges[0][1:3] == ("a", "\u0085")
    assert merges[0][4] == 2
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    # doc0: (a+NEL)(b) x2 words = 4; doc1 (U+2028) untouched: 3 x2 = 6
    assert counts == {0: 4, 1: 6}


def test_contentless_docs_count_zero_tokens(spark):
    docs = _docs(spark, ["hello world hello", None, "", "   "])
    merges = bpe.train_bpe(docs, n_merges=1)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    assert counts[1] == 0 and counts[2] == 0 and counts[3] == 0
    assert counts[0] > 0


def test_train_raises_named_error_when_corpus_exhausts(spark):
    # single-char words have no adjacent pairs at all
    docs = _docs(spark, ["a b c", "d e"])
    with pytest.raises(ValueError, match="no adjacent symbol pairs"):
        bpe.train_bpe(docs, n_merges=1)
