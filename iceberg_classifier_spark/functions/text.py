"""Text-analysis expressions for the training-data pipeline — JVM-side.

Language-ID, quality scoring, token counting and fingerprinting as Catalyst
expressions (split/filter/aggregate higher-order functions + regex), so the
hot path over a 100 TB documents table never leaves codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword profiles (public common function words)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("的", "是", "了", "在", "和"),
}

WORDISH_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # BPE-ish: runs of letters, digits, or single symbol
FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(text), " +")


def stopword_hits(toks: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def lang_guess(toks: Column) -> Column:
    """argmax over language stopword-hit counts; ties break by language
    code order (deterministic). Unknown when no profile hits."""
    hits = {lang: stopword_hits(toks, lang) for lang in sorted(STOPWORDS)}
    best = F.greatest(*hits.values())
    guess = F.lit("und")
    # iterate in reverse so earlier language codes win ties
    for lang in sorted(STOPWORDS, reverse=True):
        guess = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(guess)
    return guess


def token_count_ws(text: Column | str) -> Column:
    return F.size(tokens(text))


def token_count_wordish(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(text, F.lit(WORDISH_RE))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-z0-9 ]."""
    text = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(text, "[a-z0-9 ]", "")
    return F.length(stripped) / F.length(text)


def mean_token_len(toks: Column) -> Column:
    return F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over characters: acc = (acc*31 + code) % p.

    Left-to-right fold — identical order in any engine, so it doubles as a
    portable content fingerprint (used for shard-stable exact dedup keys).

    Folds over ``split(text, '')`` rather than indexed ``substring(text,
    i, 1)``: UTF8String substring is an O(i) seek, which made the
    index-based spelling O(len²) per row — quadratic in DOCUMENT length,
    the wrong shape for a corpus fingerprint (measured 37 s for 50k docs
    at 10× data; the array fold is O(len) with identical integer values).
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.aggregate(
        F.split(text, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch))
        % F.lit(FP_MOD).cast("long"),
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct token n-gram shingles of a token array.

    Built by zip_with over n shifted slices — O(tokens) regardless of how
    the optimizer inlines `toks` (an element_at-per-index formulation makes
    Catalyst recompute the full split per element after projection
    collapse: measured ~10× slower on the shingle inverted index).
    """
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))  # number of shingles
    # n equal-length shifted views → zip_with never null-pads
    out = F.slice(toks, 1, m)
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, m)
        out = F.zip_with(out, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(out)
