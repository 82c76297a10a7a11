r"""Distributed BPE (byte-pair-encoding) tokenizer training.

The canonical tokenizer-training job a pre-training pipeline runs over
its corpus (SentencePiece/GPT-style BPE, word-internal merges): start
from characters, repeatedly merge the most frequent adjacent symbol
pair. The reference has no analog (its transform hook is identity);
this is north-star training-data surface.

Representation — the "spaced symbol string": a word's symbol sequence
is one string with DOUBLE spaces between symbols and double sentinel
spaces at both ends (``'  a  b  c  '``). That makes every
training/apply step a pure string/column operation both engines share
bitwise:

- pair extraction = split on runs of spaces + adjacent zip (the n=2
  shingle);
- applying merge (a,b)→ab = ``replace(sym, ' a  b ', ' ab ')``. The
  pattern's single-space flanks consume only ONE of each boundary's
  two spaces, so two token-disjoint merge sites that share a boundary
  (``a b a b``) BOTH match in one left-to-right non-overlapping scan,
  while token-overlapping sites (``a a a`` under (a,a)) still block —
  which is EXACTLY reference greedy BPE (Sennrich's
  ``(?<!\S)a b(?!\S)`` regex), reproduced without lookarounds (RE2,
  hence the DuckDB oracle, has none). A single-space encoding is NOT
  equivalent: its pattern eats the whole shared boundary and silently
  skips every other site in ``abab``/``aaaa`` runs (round-9 review
  finding);
- document-level application joins double-spaced words with a TRIPLE
  space, which the exactly-two-interior-space merge pattern can never
  match across — merges stay word-internal without a per-word
  explode.

Character splitting: the DuckDB oracles use ``([\s\S])``, not
``(.)`` — Java's dot excludes Unicode line terminators
(U+0085/U+2028/U+2029, which ``\s+`` tokenization does NOT strip)
while RE2's dot excludes only newline, so a dot-based splitter builds
different symbol sequences in the two engines (round-9 review
finding, confirmed on ``'a\\x85b'``). The Spark side splits via the
empty-pattern ``split`` + ``array_join`` since round 12 —
value-identical per ``char_spaced``'s docstring, ~3x cheaper than the
per-char capture-group rewrite.

Scale (100 TB corpus): training never touches the corpus after the
initial word count (map-side combinable, the only corpus-sized
shuffle). Every merge round runs over the VOCABULARY relation — Zipf
keeps that orders of magnitude smaller than the corpus and it only
shrinks as merges apply. The per-round argmax collects exactly ONE
row to the driver (the `checkpoint argmax` pattern); K rounds = K
tiny jobs over a vocab-sized lineage. Applying a trained merge table
to documents is a chain of K column-level replaces — zero shuffles,
rides the scan.

Determinism: the argmax tie-breaks on (count DESC, pair ASC) — a
total order, so both engines pick the same merge at every round and
the DuckDB oracle replays training EXACTLY with K unrolled CTE
rounds (the PageRank/Lloyd unrolled-oracle recipe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import shingles
from .text import tokens

#: default number of merge rounds for the driver-visible queries —
#: small enough that the unrolled-CTE oracle stays readable, large
#: enough that merges chain (later merges consume earlier ones).
N_MERGES = 8


def char_spaced(word: Column) -> Column:
    """``'abc'`` -> ``'  a  b  c  '`` (double boundaries everywhere).

    Implemented as ``split(word, '') -> array_join('  ') + '  '``
    rather than the round-9 per-char capture regex
    ``regexp_replace(word, '([\\s\\S])', '$1  ')``: the two forms are
    value-identical for every NON-EMPTY word (verified over the whole
    corpus plus unicode/astral edge strings — Java's empty-pattern
    split is code-point aware like ``[\\s\\S]``, and the explicit
    trailing ``'  '`` replaces the trailing element the regex's
    per-char suffix produced), but the split/join form skips the
    per-character Matcher/rewrite machinery that measured ~4 s of the
    5 s ``bpe_token_counts`` apply stage at sf0.1 (round 12). Callers
    filter empty words before spacing — the one input where the forms
    differ ('' vs '  ') — and ``word_vocab``/``doc_symbols`` both
    keep that filter. The DuckDB oracles keep the regexp form: only
    equal VALUES are contracted, not equal plans."""
    return F.concat(
        F.lit("  "), F.array_join(F.split(word, ""), "  "), F.lit("  ")
    )


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(sym, n): the corpus word vocabulary in spaced-symbol form with
    occurrence counts — the ONLY corpus-sized aggregation in BPE
    training. Empty tokens (from empty/whitespace text) are excluded,
    the contentless-doc contract."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(char_spaced(F.col("word")).alias("sym"), "n")
    )


def train_bpe(
    docs: DataFrame, n_merges: int = N_MERGES, text_col: str = "text"
) -> list[tuple[int, str, str, str, int]]:
    """Train ``n_merges`` BPE merges; returns
    [(rank, left_sym, right_sym, merged, pair_count), ...].

    Each round: count adjacent symbol pairs over the vocab (weighted
    by word count), pick the (count DESC, pair ASC) argmax — ONE
    collected row — and fold the merge into the vocab as a literal
    ``replace``. Raises a named ValueError if a round finds no pairs
    (corpus too small for the requested rounds), the shared
    tiny-slice precondition convention.

    The initial vocab is localCheckpoint'ed (round-9 review finding):
    without it every round's argmax job replays the corpus-sized word
    count — K rounds = K corpus scans instead of one, and the
    docstring's 'training never touches the corpus after the word
    count' would be a lie at 100 TB. After the checkpoint each round's
    lineage is just r cheap replaces over the materialized vocab."""
    vocab = word_vocab(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(n_merges):
        best = (
            vocab.select(
                F.explode(shingles(F.col("sym"), 2)).alias("pair"), "n"
            )
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"train_bpe: no adjacent symbol pairs left at round {r} — "
                f"the corpus is too small for {n_merges} merge rounds"
            )
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        left, right = pair.split(" ")
        merged = left + right
        merges.append((r, left, right, merged, cnt))
        vocab = vocab.select(
            F.replace(
                F.col("sym"),
                F.lit(f" {left}  {right} "),
                F.lit(f" {merged} "),
            ).alias("sym"),
            "n",
        )
    return merges


def merge_table(spark: SparkSession, merges) -> DataFrame:
    """The trained merge table as a DataFrame (bounded: n_merges
    rows)."""
    from ..localrel import local_df

    return local_df(
        spark,
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )


def doc_symbols(docs: DataFrame, text_col: str = "text") -> Column:
    """Document-level spaced-symbol string: double-spaced words joined
    by a TRIPLE space (each spaced word already ends with a double
    space; the join adds the third), which the exactly-two-interior-
    space merge pattern can never match across — merges stay
    word-internal. NULL for contentless docs."""
    words = F.filter(tokens(text_col), lambda w: w != F.lit(""))
    # split/join spacing — value-identical to the per-char capture
    # regex for non-empty words; see char_spaced for the evidence
    spaced = F.transform(
        words,
        lambda w: F.concat(F.array_join(F.split(w, ""), "  "), F.lit("  ")),
    )
    return F.when(
        F.size(words) > 0,
        F.concat(F.lit("  "), F.array_join(spaced, " ")),
    )


def apply_merges(sym: Column, merges) -> Column:
    """Fold a trained merge table into a symbol-string column as a
    chain of literal replaces, in rank order — pure column ops, zero
    shuffles, zero Python; exact greedy semantics per the module
    docstring."""
    out = sym
    for _rank, left, right, merged, _cnt in merges:
        out = F.replace(
            out, F.lit(f" {left}  {right} "), F.lit(f" {merged} ")
        )
    return out


def bpe_token_counts(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token count after applying ``merges``:
    (id, n_bpe_tokens). Contentless docs count 0.

    Shape note (round 12): a vocabulary-keyed variant (run the
    spacing+merge chain over distinct words only, join counts back
    per doc — merges are word-internal, so counts are additive over
    words) was implemented and MEASURED SLOWER at sf0.1: explode +
    distinct + join + re-aggregate machinery cost ~7.5 s executor CPU
    and ~0.94 s wall against the doc-level chain's ~4.5 s / ~0.33 s,
    because the real hot spot was never the 8 replaces (~0.4 s CPU) —
    it was the per-char spacing REGEX (~4 s), which the split/join
    ``char_spaced``/``doc_symbols`` forms now avoid. The zero-shuffle
    scan-riding doc-level shape stays (it is also the 100 TB shape:
    9 embarrassingly parallel string passes beat a corpus-sized
    token-metadata shuffle); the vocab variant survives as the
    equivalence reference in tests/test_optimization_r12.py."""
    applied = apply_merges(doc_symbols(docs, text_col), merges)
    # explicit NULL branch, not coalesce(size(...)): size(NULL) is
    # configuration-dependent (-1 under legacy sizeOfNull), and -1
    # would sail straight through a coalesce
    return docs.select(
        F.col(id_col),
        F.when(applied.isNull(), F.lit(0))
        .otherwise(F.size(F.split(F.trim(applied), r" +")))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )
