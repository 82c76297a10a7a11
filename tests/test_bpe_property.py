"""Property-based check of the distributed BPE trainer/applier against
a direct from-the-definition Python implementation (VERDICT r9 item 5).

The r9 review caught a greedy-semantics bug in the spaced-symbol
``replace`` encoding once (token-overlapping sites in ``abab`` runs);
this test makes that CLASS of bug impossible to reintroduce silently:
hypothesis generates small corpora (including pathological repeats like
``aaaa``/``abab``), a reference BPE trains with explicit
tuple-of-symbols words and greedy LEFT-TO-RIGHT NON-OVERLAPPING merge
application, and both the learned merge tables (pair identity, order,
counts) and the per-document applied token counts must match exactly.

Reference semantics being pinned:
- pair counting weights by word OCCURRENCE count over the corpus;
- argmax tie-break is (count DESC, pair string 'left right' ASC) — the
  trainer's deterministic ordering contract;
- merge application within a word is one left-to-right pass where a
  consumed symbol cannot participate in an overlapping second match
  (``aaa`` under (a,a) -> ``aa a``, and BOTH sites merge in ``abab``
  under (a,b));
- merges never cross word boundaries;
- later merges see the output of earlier ones (chaining).

The alphabet stays within the BMP (ASCII + Latin-1 + one CJK char) so
Python's code-point string ordering and Java's UTF-16 code-unit
ordering agree on the tie-break — a documented limitation, not an
accident (supplementary-plane tie-breaks would need a binary collation
on both sides)."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigquery_cross_environment_etl_pipeline_spark.operators import bpe

ALPHABET = "abcé日"

words = st.text(alphabet=ALPHABET, min_size=1, max_size=5)
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=6).map(" ".join),
    min_size=1,
    max_size=5,
)


def _ref_merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts: list[str], n_merges: int):
    """Direct BPE: word vocab with counts, n_merges rounds of weighted
    pair-count argmax + greedy merge. Returns (merges, vocab) where
    merges is [(left, right, merged, count)] and vocab maps the
    ORIGINAL word to its final symbol tuple."""
    counts: Counter[str] = Counter()
    for t in texts:
        counts.update(w for w in t.split() if w)
    vocab = {w: tuple(w) for w in counts}
    merges = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += counts[w]
        if not pairs:
            return merges, vocab, True  # exhausted
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((a, b, a + b, cnt))
        vocab = {w: _ref_merge_word(s, a, b) for w, s in vocab.items()}
    return merges, vocab, False


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_train_and_apply_match_reference(spark, texts):
    n_merges = 3
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    ref_merges, ref_vocab, exhausted = _ref_train(texts, n_merges)
    if exhausted and not ref_merges:
        with pytest.raises(ValueError, match="too small"):
            bpe.train_bpe(docs, n_merges=n_merges)
        return
    if exhausted:
        # partial exhaustion also raises (the trainer demands all
        # requested rounds); verify against a shorter run instead
        with pytest.raises(ValueError, match="too small"):
            bpe.train_bpe(docs, n_merges=n_merges)
        n_merges = len(ref_merges)

    got = bpe.train_bpe(docs, n_merges=n_merges)
    assert [(left, right, merged, cnt) for _r, left, right, merged, cnt in got] == [
        (a, b, m, c) for a, b, m, c in ref_merges[:n_merges]
    ]

    # applied token counts per doc: sum of final symbol-tuple lengths
    applied = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, got).collect()
    }
    for i, t in enumerate(texts):
        expect = sum(len(ref_vocab[w]) for w in t.split() if w)
        assert applied[i] == expect, (t, applied[i], expect)


def test_pathological_overlap_runs(spark):
    """The exact r9 review case, pinned deterministically: under merge
    (a,a), 'aaaa' -> (aa, aa) and 'aaa' -> (aa, a); under a chained
    (a,b)+(ab,ab), 'abab' collapses to one symbol."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaa"), (1, "abab abab abab")], "doc_id bigint, text string"
    )
    ref_merges, ref_vocab, _ = _ref_train(["aaaa aaa", "abab abab abab"], 3)
    got = bpe.train_bpe(docs, n_merges=3)
    assert [(m[1], m[2], m[3], m[4]) for m in got] == ref_merges
    applied = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, got).collect()
    }
    assert applied[0] == len(ref_vocab["aaaa"]) + len(ref_vocab["aaa"])
    assert applied[1] == 3 * len(ref_vocab["abab"])
