"""Quality predicates (SURVEY §2.2: R-10, R-11) as native column exprs.

Both are pure expressions — Catalyst can push them, fold them, and keep
them inside codegen, which matters when they gate 100 TB of rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cleaning import ws_rtrim, ws_trim

# 18-token blocklist, lowercased — reference ``auto_translate.py:655-660``.
SUSPICIOUS_TOKENS = (
    "[translation_failed]",
    "plaintext",
    "text",
    "code",
    "output",
    "none",
    "null",
    "undefined",
    "error",
    "failed",
    "missing",
    "empty",
    "json",
    "translation",
    "response",
    "content",
    "message",
    "system",
    "user",
)


def is_suspicious(c: Column) -> Column:
    """R-10: suspicious-translation predicate.

    Reference: ``is_suspicious_translation`` (``auto_translate.py:649-672``):
    null / blocklisted token / starts with fence, ``<``, ``{``, ``[`` /
    shorter than 3 chars / pure digits.
    """
    t = ws_trim(c)
    return (
        c.isNull()
        | F.lower(t).isin(*SUSPICIOUS_TOKENS)
        | t.startswith("```")
        | t.startswith("<")
        | t.startswith("{")
        | t.startswith("[")
        | (F.length(t) < 3)
        | t.rlike(r"^\d+$")
    )


def _char_count(c: Column, ch: str) -> Column:
    """Occurrences of a single character, via length difference (codegen'd)."""
    return F.length(c) - F.length(F.regexp_replace(c, f"[{ch}]", ""))


def is_truncated(c: Column) -> Column:
    """R-11: truncation predicate.

    Reference: ``detect_truncation_issues`` (``auto_translate.py:678-697``):
    opens ```` ```json ```` without closing fence, OR more ``{`` than ``}``,
    OR a non-empty last line that doesn't end in ``}``/``"``/``,``.
    """
    last_line = F.element_at(F.split(ws_trim(c), "\n"), -1)
    return c.isNotNull() & (
        (c.startswith("```json") & ~ws_rtrim(c).endswith("```"))
        | (_char_count(c, "{") > _char_count(c, "}"))
        | (
            (ws_trim(last_line) != "")
            & ~ws_trim(last_line).rlike(r'[}",]$')
        )
    )
