"""Text-analysis functions — the F-18 generalization plus the
training-data-pipeline extensions mandated by BASELINE.json (language ID,
quality scoring, token counting, fingerprinting, shingling).

Everything here is a pure column expression so it runs inside codegen at
scan speed; nothing needs Python for 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- token counting (F-2) -------------------------------------------------

# BPE-ish segmentation: word pieces, numbers, and single punctuation marks —
# a deterministic stand-in for tiktoken (not in this container), same
# contract as the reference's count_tokens (auto_translate.py:259-260).
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_token_count(c: Column) -> Column:
    """BPE-ish token count: regexp segmentation + a length/4 correction
    for long words (tiktoken splits long words into ~4-char pieces)."""
    words = F.split(F.trim(c), r"\s+")
    return F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.greatest(F.lit(1), F.ceil(F.length(w) / 4).cast("int")),
    )


def py_bpe_token_count(text: str | None) -> int | None:
    """Python twin of ``bpe_token_count``'s word-piece arithmetic —
    trim, split on whitespace, sum max(1, ceil(len/4)) per word; None
    propagates like the native expression (null in → null out). Used by
    the UDF fallback below and pinned to the native column by a parity
    test."""
    import math
    import re

    if text is None:
        return None
    words = re.split(r"\s+", text.strip())
    return sum(max(1, math.ceil(len(w) / 4)) for w in words)


def accurate_token_count(c: Column, encoding: str = "cl100k_base") -> Column:
    """F-2 exact path: true tiktoken counts when the library is
    installed (the reference's count_tokens, auto_translate.py:259-260),
    else the deterministic ``bpe_token_count`` heuristic.

    Environment ladder (all branches agree that NULL in → NULL out,
    matching ``bpe_token_count``):

    * no tiktoken on the driver → the native heuristic column (pure
      codegen, no Python anywhere — this container's path);
    * tiktoken on the driver → an Arrow-batched pandas UDF that
      re-probes the import INSIDE the UDF, so an executor missing the
      library degrades to the same heuristic per batch instead of
      failing the task. On such a mixed cluster counts are
      exact-or-heuristic per executor — still a valid packing cost,
      but install tiktoken cluster-wide when exactness matters.

    The pandas-UDF branch is deliberately OFF the oracle-checked query
    path (oracles pin the engine-portable heuristic)."""
    try:
        import tiktoken  # noqa: F401  (driver-side probe only)
    except ImportError:
        return bpe_token_count(c).cast("bigint")

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def _count(s: pd.Series) -> pd.Series:
        try:
            import tiktoken as tk

            enc = tk.get_encoding(encoding)

            def count(t: str) -> int:
                return len(enc.encode(t))

        except ImportError:  # executor without the library
            count = py_bpe_token_count
        return pd.Series(
            [count(t) if t is not None else None for t in s], dtype="Int64"
        )

    return _count(c)


def estimated_cost(c: Column, output_factor: float = 1.8) -> Column:
    """R-17 packing cost: input tokens + expected output tokens
    (EXPECTED_OUTPUT_FACTOR=1.8, reference auto_translate.py:32,289)."""
    toks = bpe_token_count(c)
    return (toks + toks * F.lit(output_factor)).cast("double")


# --- script / language (F-18 generalized) ---------------------------------

_SCRIPT_RANGES = [
    ("telugu", r"[ఀ-౿]"),
    ("devanagari", r"[ऀ-ॿ]"),
    ("arabic", r"[؀-ۿ]"),
    ("cjk", r"[一-鿿]"),
    ("cyrillic", r"[Ѐ-ӿ]"),
    ("greek", r"[Ͱ-Ͽ]"),
    ("hangul", r"[가-힯]"),
    ("latin", r"[A-Za-z]"),
]


def script_of(c: Column) -> Column:
    """F-18 generalized: dominant unicode script of a string, by
    first-matching range (reference checked only Telugu,
    old_functionalities/testing.py:16-19)."""
    expr = F.lit("unknown")
    for name, pattern in reversed(_SCRIPT_RANGES):
        expr = F.when(c.rlike(pattern), F.lit(name)).otherwise(expr)
    return expr


# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible → oracle-checkable.
_LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "una"),
    "fr": ("le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"),
}


def lang_id(c: Column) -> Column:
    """Stopword-hit language ID: the language with the most stopword hits
    among the text's words; 'und' (undetermined) when no list hits."""
    words = F.split(F.lower(F.trim(c)), r"\s+")
    scores = [
        (
            lang,
            F.size(F.filter(words, lambda w: w.isin(*stops))),  # noqa: B023
        )
        for lang, stops in _LANG_STOPWORDS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # Ties resolve to the first language in declaration order.
    for lang, score in reversed(scores):
        expr = F.when((best > 0) & (score == best), F.lit(lang)).otherwise(expr)
    return expr


# --- quality scoring ------------------------------------------------------


def quality_score(c: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length,
    low punctuation ratio, and stopword presence — the standard cheap
    pretraining-corpus filter shape."""
    t = F.trim(c)
    n_chars = F.length(t)
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(*_LANG_STOPWORDS["en"])))
    len_score = F.least(F.lit(1.0), n_words / F.lit(50.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 4)
    stop_score = F.least(F.lit(1.0), stop_hits / F.greatest(n_words * F.lit(0.05), F.lit(1.0)))
    return F.round((len_score + punct_score + stop_score) / 3, 4)


# --- fingerprinting / shingling -------------------------------------------


def normalized_text(c: Column) -> Column:
    """Canonical form for dedup: lowercase, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def doc_fingerprint(c: Column) -> Column:
    """Exact-dup fingerprint: md5 of the normalized text. md5 (not
    xxhash) so the DuckDB oracle computes the identical value."""
    return F.md5(normalized_text(c).cast("binary"))


def word_shingles(c: Column, k: int = 3) -> Column:
    """k-word shingles of the normalized text (for Jaccard / MinHash).

    See :func:`word_shingles_of`. NOTE (round 10): this convenience
    form inlines ``split(normalized_text(c))`` into every reference the
    shingle expression makes (k slices + size() uses), and the zip /
    transform higher-order functions are CodegenFallback — interpreted
    evaluation re-runs the regex+split per reference, per row. Hot
    call sites should stage the word array in its own projection and
    call ``word_shingles_of`` on the staged column instead.
    """
    return word_shingles_of(F.split(normalized_text(c), " "), k)


def word_shingles_of(words: Column, k: int = 3) -> Column:
    """k-word shingles of a pre-split word-array column.

    Built from k shifted copies of the word array zipped together —
    linear work and shuffle-free, unlike the naive per-index ``slice``
    (quadratic copying; measured 1.5-3x slower) or a posexplode+lead
    window (faster locally but shuffles the full exploded word table,
    which is the wrong trade at 100 TB).
    """
    n = F.size(words)
    shifted = [
        words
        if i == 0
        else F.slice(words, i + 1, F.greatest(n - i, F.lit(0)))
        for i in range(k)
    ]
    z = F.slice(
        F.arrays_zip(*[col.alias(f"w{i}") for i, col in enumerate(shifted)]),
        1,
        F.greatest(n - (k - 1), F.lit(0)),
    )
    shingles = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(k)])
    )
    return F.when(n >= k, shingles).otherwise(F.array().cast("array<string>"))


def gopher_pass(c: Column) -> Column:
    """Gopher/C4-style document quality gate as one boolean expression:
    5 <= word count <= 1000, mean word length in [3, 10], symbol ratio
    under 10%, and at least 80% of words contain a letter. Pure native
    expressions — usable as a scan-level filter (pushes ahead of any
    join/agg) and identical to the `text_gopher_rules` oracle SQL."""
    txt = F.lower(F.trim(c))
    words = F.split(txt, r"\s+")
    wc = F.size(words)
    nonspace = F.length(F.regexp_replace(txt, r"\s+", ""))
    symbols = F.length(F.regexp_replace(txt, r"[a-z0-9\s]", ""))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    return (
        wc.between(5, 1000)
        & (nonspace * 1.0 / wc).between(3, 10)
        & (symbols * 1.0 / F.greatest(F.length(txt), F.lit(1)) < 0.1)
        & (alpha_words * 1.0 / wc >= 0.8)
    )


def char_entropy(c: Column, ndigits: int = 4) -> Column:
    """Shannon entropy (bits/char) of the normalized character
    distribution — a compressibility proxy for quality gating: near-0
    means degenerate repetition (keyboard mash, padding), natural text
    sits ~3.5-4.5 bits. Pure array lambdas inside codegen — no shuffle,
    no Python — so it runs at scan speed like gopher_pass.

    Denominator is length(normalized) rather than the char-array size:
    the two agree on every non-empty string in both engines, but
    empty-string char-splits differ (Spark yields [''], DuckDB []), and
    length() pins empty docs to entropy 0.0 identically.
    """
    nt = normalized_text(c)
    n = F.length(nt).cast("double")
    # Single-pass run-length form over the SORTED chars, carried in a
    # struct accumulator: H = log2(n) - (sum over runs of r*log2(r))/n.
    # Column expressions have no let-binding, so any formulation that
    # references the sorted array from inside a lambda re-inlines (and
    # re-sorts!) it per element — measured O(n^2 log n), 158 s at
    # sf0.01 — and the original count-each-distinct-char form was
    # O(distinct * n). This aggregate references the array exactly
    # once and walks it once.
    chars = F.array_sort(F.split(nt, ""))

    def xlogx(r: Column) -> Column:
        return F.when(r > 0, r * F.log2(r)).otherwise(F.lit(0.0))

    s_runs = F.aggregate(
        chars,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0.0).alias("run"),
            F.lit(0.0).alias("s"),
        ),
        lambda a, ch: F.struct(
            ch.alias("prev"),
            F.when(ch == a["prev"], a["run"] + 1)
            .otherwise(F.lit(1.0))
            .alias("run"),
            F.when(ch == a["prev"], a["s"])
            .otherwise(a["s"] + xlogx(a["run"]))
            .alias("s"),
        ),
        lambda a: a["s"] + xlogx(a["run"]),
    )
    h = F.log2(n) - s_runs / n
    return F.round(F.when(n > 0, h).otherwise(F.lit(0.0)), ndigits)
