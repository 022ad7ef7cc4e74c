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

    The reference walks lines with an ``in_code_block`` toggle. The same
    state machine is a prefix count of fence lines: a line is "inside"
    when the number of fence markers strictly before it is odd. Expressed
    with higher-order array functions — no UDF, no shuffle.
    """
    lines = F.split(c, "\n")
    # fences_before[i] = count of fence lines among lines[0..i-1]
    indexed = F.transform(lines, lambda x, i: F.struct(ws_trim(x).alias("l"), i.alias("i")))
    inside = F.filter(
        indexed,
        lambda s: (~s["l"].startswith("```"))
        & (s["l"] != "")
        & (
            F.size(
                F.filter(
                    F.slice(lines, 1, s["i"]),
                    lambda p: ws_trim(p).startswith("```"),
                )
            )
            % 2
            == 1
        ),
    )
    joined = F.array_join(F.transform(inside, lambda s: s["l"]), "\n")
    return F.when(F.size(inside) > 0, joined).otherwise(clean_md_basic(c))


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
