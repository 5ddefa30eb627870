"""Text-analysis column helpers for the documents table: tokenization, quality
scoring, language-ID heuristics, fingerprinting.

All built-in expressions (split/filter/aggregate/md5) — these run inside codegen and
scale linearly; there is deliberately no Python in this path because at 100 TB the
documents table is the biggest input the engine sees.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.trim(c), r"\s+")
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        arr
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_ratio(col: Column | str) -> Column:
    t = tokens(col)
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(t)) / F.size(t)
    )


#: Small function-word list drawn from general English; used for both quality scoring
#: and as the 'en' marker set in the language-ID heuristic.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")


def stopword_ratio(col: Column | str, stops: tuple[str, ...] = STOPWORDS) -> Column:
    t = tokens(col)
    stop_arr = F.array(*[F.lit(s) for s in stops])
    hits = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(hits / F.size(t))


def quality_score(col: Column | str) -> Column:
    """Composite doc-quality heuristic: length saturation + lexical diversity +
    stopword plausibility, each weighted. Deterministic arithmetic only, so the
    DuckDB oracle can reproduce it bit-for-bit (after rounding)."""
    n = token_count(col).cast("double")
    length_term = F.least(F.lit(1.0), n / F.lit(100.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.3) * distinct_token_ratio(col)
        + F.lit(0.3) * stopword_ratio(col)
    )


#: Marker token sets per language for the n-gram/function-word language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "les", "des", "et"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "在", "和"),
}


def lang_hits(col: Column | str, lang: str) -> Column:
    t = tokens(col)
    marker_arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(t, lambda x: F.array_contains(marker_arr, x)))


def lang_id(col: Column | str) -> Column:
    """Predicted language = argmax of marker hits, ties broken by fixed language
    order, 'und' (undetermined) when no marker hits at all."""
    langs = list(LANG_MARKERS)
    hits = {lang: lang_hits(col, lang) for lang in langs}
    best = F.lit("und")
    best_hits = F.lit(0)
    # fixed order: later langs win only with STRICTLY more hits → deterministic
    for lang in reversed(langs):
        cond = hits[lang] > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    return best


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase + collapsed whitespace + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint = md5 of the normalized text (md5 is identical in Spark
    and DuckDB, unlike murmur `hash()`)."""
    return F.md5(normalize_text(col))


def ngram_strings(col: Column | str, n: int) -> Column:
    """ALL word n-grams (duplicates kept — repetition measurement needs the
    multiset, unlike `word_shingles` which distincts for MinHash).

    Built as a zip_with chain over shifted slices, NOT `slice(t, i, n)` inside
    a per-index transform lambda: an array expression referenced in a lambda is
    re-inlined by CollapseProject and re-evaluated per ELEMENT — the tokens
    regex-split re-ran per n-gram, measured 8.2 s vs 0.4 s for the bigram
    explode at sf0.1 (same pitfall as dedup.hashed_shingles31). zip_with
    operands evaluate once per row; the trailing null-padded entries (from the
    shorter shifted slice) are cut by the final length slice."""
    t = tokens(col)
    sz = F.size(t)
    out = t
    for j in range(1, n):
        out = F.zip_with(
            out,
            F.slice(t, j + 1, F.greatest(sz - j, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(
        sz >= n, F.slice(out, 1, sz - (n - 1))
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_fraction(col: Column | str, n: int = 3) -> Column:
    """Gopher-style repetition signal: fraction of n-gram OCCURRENCES that are
    repeats of an earlier occurrence (1 − distinct/total); 0 for short docs.
    Pure array expressions — per-row map-side work, no shuffle."""
    g = ngram_strings(col, n)
    total = F.size(g)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(g)) / total
    )


def chunk_starts(col: Column | str, stride: int) -> Column:
    """1-based token start offsets of context-window chunks: 1, 1+stride, ...
    while <= n_tokens (empty for an empty document). With stride < chunk size
    consecutive chunks overlap by (chunk - stride) tokens — the standard
    context-window chunker for embedding / training-sample generation."""
    n = F.size(tokens(col))
    # sequence(1, 0, +step) throws in Spark (step sign must match direction)
    return F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )


#: BPE-ish pre-tokenization pattern: letter runs, digit runs, and single
#: non-alnum marks each count as one token — the GPT-2-style pre-tokenizer shape
#: without the merge table (token COUNTING, not encoding).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer — a closer proxy for LLM token
    budgets than whitespace counting (punctuation and digit runs count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), 0))


def hashed_feature_weight(tok: Column, mod: int = 101, salt: str = "w|") -> Column:
    """Hashing-trick feature weight for one token: md5(salt||token) mod ``mod``,
    shifted to be centered on zero ([-50, 50] for the default mod=101). Stands in
    for a trained fastText-style linear model's weight table — the HASHING and
    SCORING plumbing is the real, tested part; swap the md5 weight for a
    broadcast-joined learned table in production."""
    from ortholog_pipeline_spark.operators.dedup import hex_hash64

    return F.pmod(hex_hash64(F.concat(F.lit(salt), tok)), F.lit(mod)) - F.lit(
        (mod - 1) // 2
    )


def linear_quality_score(col: Column | str, mod: int = 101) -> Column:
    """fastText-shape linear document scorer: mean hashed-feature weight over
    the token bag, as an exactly-reproducible double (one integer sum, one
    final division — no float accumulation order to diverge across engines).
    Pure Catalyst array expressions: map-side, no shuffle, no UDF."""
    t = tokens(col)
    weights = F.transform(t, lambda tok: hashed_feature_weight(tok, mod))
    s = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        F.round(s.cast("double") / F.size(t), 6)
    )
