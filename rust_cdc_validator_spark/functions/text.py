"""Text-analysis column functions for large-scale training-data pipelines.

All hot-path computation is built-in ``pyspark.sql.functions`` expressions
(JVM-side, whole-stage codegen) — no Python UDFs. Each function takes and
returns Columns so it composes into any DataFrame plan and scales linearly
with no shuffle of its own.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword list for quality scoring (public domain list subset).
STOPWORDS = (
    "the a an and or but if then else of in on at to for with by from as is "
    "are was were be been it this that these those not no"
).split()


def tokens(text: Column) -> Column:
    """Whitespace tokenization: array of non-empty tokens."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token counting: runs of letters, runs of digits, or single
    non-space symbols — a cheap proxy for subword token counts."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of n-word shingles (the unit for n-gram Jaccard / MinHash).

    Built as a zip of n shifted array slices rather than per-index
    ``element_at`` lookups — both are interpreted HOFs, but the slice form
    does bulk array copies (measured ~7× faster at 260k shingles).
    """
    toks = tokens(text)
    count = F.size(toks) - F.lit(n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, count) for k in range(n)])
    joined = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
    )
    return F.when(F.size(toks) >= n, joined).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Array of character n-grams (for language-ID profiles / SimHash)."""
    t = F.lower(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(t, i.cast("int"), n))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords — a classic quality signal."""
    toks = tokens(F.lower(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars."""
    n_punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def mean_token_length(text: Column) -> Column:
    no_space = F.length(F.regexp_replace(text, r"\s+", ""))
    return no_space / F.greatest(token_count(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] doc-quality score: favors moderate length, low
    punctuation density, presence of stopwords (prose-likeness)."""
    length_term = F.least(char_count(text) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    sw_term = F.least(stopword_ratio(text) * 3, F.lit(1.0))
    return (length_term + punct_term + sw_term) / F.lit(3.0)


def fingerprint(text: Column, window: int = 8) -> Column:
    """Rolling-hash document fingerprint: min xxhash64 over token windows
    (winnowing-lite). Stable, order-sensitive digest for near-dup triage."""
    sh = word_shingles(text, n=window)
    return F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))


# ------------------------------------------------------------- language ID

# Tiny per-language character/diacritic profiles. A real deployment would load
# trained trigram profiles; the heuristic layer (score per language, argmax)
# is the same shape and stays fully JVM-side.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is "],
    "de": ["ä", "ö", "ü", "ß", " der ", " und ", " ist "],
    "fr": ["é", "è", "ê", " le ", " la ", " est "],
    "es": ["ñ", "¿", "¡", " el ", " los ", " es "],
    "zh": ["的", "是", "了"],
}


def lang_id(text: Column) -> Column:
    """Heuristic language ID: per-language marker hit count, argmax, with
    'und' (undetermined) when nothing matches."""
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))

    def score(markers: list[str]) -> Column:
        hits = [
            (F.length(t) - F.length(F.replace(t, F.lit(m), F.lit("")))) / F.lit(len(m))
            for m in markers
        ]
        total = hits[0]
        for h in hits[1:]:
            total = total + h
        return total

    scored = F.array(
        *[
            F.struct(score(m).alias("score"), F.lit(lang).alias("lang"))
            for lang, m in _LANG_MARKERS.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
