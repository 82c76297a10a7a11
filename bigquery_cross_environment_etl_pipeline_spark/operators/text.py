"""Text-analysis operators for training-data pipelines (north-star).

All pure column expressions (JVM-side, whole-stage codegen) — at 100 TB
of documents these run inside the parquet scan stage with zero shuffles
and zero Python. The cross-engine hash (``hash48``) parses the first 12
hex chars of md5 as an integer so the DuckDB oracle can reproduce it
bit-for-bit (md5 is standard; 48 bits keeps the arithmetic exact in both
engines).
"""

from __future__ import annotations

import pandas

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace tokenization — mirrors duckdb regexp_split_to_array(trim(x))
def tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def hash48(col: str | Column) -> Column:
    """Deterministic 48-bit hash: int(md5(x)[:12], 16). Exact in any
    engine with md5 + base conversion; used by minhash/simhash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("bigint")


STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def stopword_hits(tokens_col: Column) -> Column:
    quoted = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.size(F.filter(tokens_col, lambda w: w.isin(*STOPWORDS)))


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def subword_count(col: str | Column) -> Column:
    """BPE-ish token proxy: count of [a-z]+|[0-9]+ runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit("[a-z]+|[0-9]+"), 0))


def quality_features(col: str | Column) -> dict[str, Column]:
    """Length / token / stopword-ratio quality features.

    Divisions are single IEEE ops over integers -> bitwise reproducible
    against the SQL oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    avg_token_len = F.length(F.replace(c, F.lit(" "), F.lit(""))).cast(
        "double"
    ) / n_tokens.cast("double")
    stop_ratio = stopword_hits(toks).cast("double") / n_tokens.cast("double")
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "avg_token_len": avg_token_len,
        "stopword_ratio": stop_ratio,
    }


#: tiny per-language stopword lexicons for the n-gram/stopword language
#: heuristic (deterministic; a real deployment would plug a model UDF in
#: the same shape).
LANG_LEXICON = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "los", "de", "que"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "que"),
}


def langid_guess(col: str | Column) -> Column:
    """Language-ID heuristic: argmax of per-language stopword hits; ties
    and zero-hit rows resolve to 'unk' / lexicographic order of the CASE
    chain (deterministic)."""
    toks = tokens(col)

    def hit_counter(words: tuple[str, ...]):
        # single-parameter lambda (2-arg would bind the element index)
        return lambda w: w.isin(*words)

    hits = {
        lang: F.size(F.filter(toks, hit_counter(words)))
        for lang, words in LANG_LEXICON.items()
    }
    langs = sorted(LANG_LEXICON)  # de, en, es, fr — fixed CASE order
    best = None
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (hits[lang] >= hits[other])
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("unk")


#: characteristic character-trigram profiles (with word-boundary
#: spaces) for the char-n-gram language-ID variant — deterministic
#: constants; a real deployment learns these from a corpus, same shape.
LANG_TRIGRAMS = {
    "en": (" th", "the", "he ", " an", "nd "),
    "es": (" el", "el ", " la", "que", " de"),
    "de": ("der", "die", "das", "und", "ich"),
    "fr": (" le", "les", " et", "que", " qu"),
}


def langid_ngram_guess(col: str | Column) -> Column:
    """Char-n-gram language ID: argmax over languages of how many of
    the language's characteristic trigrams occur in the text (padded
    with spaces so boundary grams match at the edges). Ties and
    zero-hit rows resolve by the fixed CASE order / 'unk' —
    deterministic, same rule as the lexicon variant."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))

    def present_counter(grams: tuple[str, ...]):
        arr = F.array(*[F.lit(g) for g in grams])
        return F.size(F.filter(arr, lambda g: padded.contains(g)))

    hits = {
        lang: present_counter(grams) for lang, grams in LANG_TRIGRAMS.items()
    }
    langs = sorted(LANG_TRIGRAMS)
    best = None
    for lang in langs:
        cond = hits[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (hits[lang] >= hits[other])
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("unk")


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (the rolling-hash analog; content-defined, order-sensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def nfc_normalize(col: str | Column) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF — the
    canonical pre-hashing hygiene step (decomposed 'e'+U+0301 and
    composed U+00E9 are byte-different but the SAME text: every
    digest/shingle/dedup path disagrees on them until normalization
    collapses the difference). Spark has NO JVM built-in for Unicode
    normalization, so this is one of the few legitimately-UDF ops in
    the repo — vectorized per Arrow batch, never per-row Python in a
    JVM expression. NULL passes through as NULL.

    Cross-engine note: Python's unicodedata and DuckDB's
    nfc_normalize both implement Unicode NFC; their tables could skew
    for codepoints newer than the older of the two bundled Unicode
    versions — irrelevant for the corpus here, worth pinning if a
    production corpus leans on bleeding-edge scripts."""
    from pyspark.sql.functions import pandas_udf

    # NOTE: with `from __future__ import annotations` in effect,
    # pyspark resolves the UDF's type hints by name — 'pd.Series'
    # must be resolvable in the function's globals, hence the
    # module-qualified hint below instead of a local pandas import
    @pandas_udf("string")
    def _nfc(s: "pandas.Series") -> "pandas.Series":  # noqa: F821
        # the canonical null-propagating vectorized form (review
        # finding: a hand-rolled per-element lambda duplicated it)
        return s.str.normalize("NFC")

    c = F.col(col) if isinstance(col, str) else col
    return _nfc(c)
