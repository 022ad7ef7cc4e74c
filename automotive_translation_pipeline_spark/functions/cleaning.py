"""Markdown/JSON cleanup functions (SURVEY §2.9: F-3..F-6, F-19).

All pure column expressions — they stay inside whole-stage codegen, so the
cleanup cascade runs JVM-side over 100 TB without a Python round trip.

Semantics match the reference's cleanup stack
(``auto_translate.py:410-487``): four progressively more aggressive
strategies tried in order by the parse cascade in ``parsing.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ws_trim(c: Column) -> Column:
    """Python ``str.strip()`` equivalent: trims ALL whitespace (Spark's
    ``trim`` only strips spaces, which silently diverges from the
    reference on newline-padded blobs)."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def ws_rtrim(c: Column) -> Column:
    """Python ``str.rstrip()`` equivalent."""
    return F.regexp_replace(c, r"\s+$", "")


def clean_md_basic(c: Column) -> Column:
    """F-3: strip a single leading ```` ```json ````/```` ``` ```` and a
    trailing fence. Reference: ``auto_translate.py:410-423``."""
    t = ws_trim(c)
    t = F.when(t.startswith("```json"), F.substring(t, 8, 2**30)).otherwise(
        F.when(t.startswith("```"), F.substring(t, 4, 2**30)).otherwise(t)
    )
    t = ws_trim(t)
    t = F.when(t.endswith("```"), t.substr(F.lit(1), F.length(t) - 3)).otherwise(t)
    return ws_trim(t)


def clean_md_aggressive(c: Column) -> Column:
    """F-4: regex-remove all fences incl. language tags.
    Reference: ``auto_translate.py:426-440``."""
    t = F.regexp_replace(ws_trim(c), r"(?m)^```(?:json|javascript|text)?\s*\n?", "")
    t = F.regexp_replace(t, r"(?m)\n?```\s*$", "")
    t = F.regexp_replace(t, r"```", "")
    return ws_trim(t)


def clean_md_multiline(c: Column) -> Column:
    """F-5: keep only non-blank lines *inside* fences; if no fenced lines
    exist, fall back to F-3. Reference: ``auto_translate.py:443-466``.

    The reference walks lines with an ``in_code_block`` toggle. Here the
    same state machine is a single linear ``aggregate`` fold over the
    split lines — (in_block, kept_lines) as the accumulator. (A
    prefix-count-of-fences formulation with per-line ``slice`` is
    quadratic in line count and ballooned whole-stage codegen time.)
    """
    lines = F.split(c, "\n")
    kept = F.aggregate(
        lines,
        F.struct(
            F.lit(False).alias("in_block"),
            F.array().cast("array<string>").alias("acc"),
        ),
        lambda st, raw: F.struct(
            F.when(ws_trim(raw).startswith("```"), ~st["in_block"])
            .otherwise(st["in_block"])
            .alias("in_block"),
            F.when(
                ~ws_trim(raw).startswith("```")
                & st["in_block"]
                & (ws_trim(raw) != ""),
                F.concat(st["acc"], F.array(ws_trim(raw))),
            )
            .otherwise(st["acc"])
            .alias("acc"),
        ),
        lambda st: st["acc"],
    )
    return F.when(F.size(kept) > 0, F.array_join(kept, "\n")).otherwise(
        clean_md_basic(c)
    )


def clean_unicode_escapes(c: Column) -> Column:
    """F-6: strip stray leading/trailing quotes; heuristically complete
    braces. Reference: ``auto_translate.py:469-487``."""
    t = clean_md_basic(c)
    t = F.regexp_replace(t, r"^\s*['\"]*", "")
    t = F.regexp_replace(t, r"['\"]*\s*$", "")
    t = F.when(
        (~t.startswith("{")) & t.contains(":"), F.concat(F.lit("{"), t)
    ).otherwise(t)
    t = F.when(
        t.startswith("{") & ~t.endswith("}"), F.concat(t, F.lit("}"))
    ).otherwise(t)
    return ws_trim(t)


def strip_numbering(c: Column) -> Column:
    """F-19: remove a leading ``N. `` numbering prefix.
    Reference: ``old_functionalities/testing.py:23-24``."""
    return F.regexp_replace(c, r"^\d+\.\s*", "")


def collapse_word_repeats(c: Column) -> Column:
    """Collapse consecutive repeated words in the normalized text
    ("the the the model" -> "the model") — the stutter/boilerplate-run
    cleanup from standard web-text pipelines, as a pure array
    expression. Formulated as a SHIFT + zip_with (pair each word with
    its predecessor, null out the repeats, compact): zip_with
    evaluates each argument array once, whereas the indexed-lambda
    form (element_at(words, i) inside a filter) re-inlines and
    re-evaluates the whole words expression PER ELEMENT — lambdas
    have no let-binding and Catalyst does not CSE across them; that
    quadratic was 34 s on 50k docs at sf1, this form is linear.
    Zero shuffles, zero Python; runs at scan speed on any corpus."""
    from .text import normalized_text

    words = F.split(normalized_text(c), " ")
    prev = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
    )
    marked = F.zip_with(
        words, prev, lambda w, p: F.when(p.isNull() | (w != p), w)
    )
    return F.array_join(F.filter(marked, lambda w: w.isNotNull()), " ")
