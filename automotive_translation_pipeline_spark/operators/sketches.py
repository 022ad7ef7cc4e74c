"""Mergeable frequency sketches: count-min heavy hitters at scale.

`heavy_hitters_words` (queries_catalog) is the EXACT formulation:
explode → partial agg → shuffle |vocab| rows per task → top-k. The
partial (map-side) aggregate already collapses heavy keys, but the
shuffle still carries the full vocabulary — at 100 TB of text that is
billions of distinct shingles and the exchange dominates.

`topk_heavy_hitters_cms` bounds the network cost to O(P × sketch):
every partition builds a fixed-size count-min sketch (depth×width int64
grid) plus its local top candidates, the P sketches reduce by cellwise
SUM (count-min is a linear sketch — merge == add), and candidate counts
are estimated from the merged sketch (min over depth rows). Nothing
vocabulary-sized ever moves: the shuffle is P × (depth×width×8) bytes,
a few MB for thousands of partitions.

Guarantees (standard CM bounds): estimates only OVER-count; with width
w the error is ≤ e·N/w with probability 1-(1/2)^depth. Candidate
recall: a true global top-k element is in some partition's local top-c
whenever its mass isn't spread perfectly evenly — take c ≥ 4-5× k.
Deterministic: hash seeds are fixed, merges are integer sums.

Reference surface: this generalizes the reference's frequency-style
summaries (SURVEY §2.5) to the cardinalities a pretraining corpus has;
background reading per PAPERS.md sketch lines.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_idx(word: str, seed: int, width: int) -> int:
    # crc32 over seeded bytes: fast, stable across processes (unlike
    # Python's salted hash()), good enough dispersion for CM rows.
    return zlib.crc32(f"{seed}:{word}".encode("utf-8")) % width


def merged_cms(
    words: DataFrame,
    col: str = "w",
    depth: int = 4,
    width: int = 8192,
    candidates_per_partition: int = 64,
) -> tuple[np.ndarray, set[str]]:
    """Build the corpus count-min sketch: every partition folds its
    rows into one depth×width int64 grid + its local top candidates,
    and the grids reduce by cellwise sum on the driver (count-min is a
    linear sketch). Returns ``(merged_sketch, candidate_words)``; only
    O(partitions × sketch) bytes ever leave the executors."""

    def build(iterator):
        for pdf in iterator:
            sketch = np.zeros((depth, width), dtype=np.int64)
            counts = pdf[col].value_counts()
            for word, c in counts.items():
                for d in range(depth):
                    sketch[d, _hash_idx(word, d, width)] += int(c)
            cands = counts.head(candidates_per_partition)
            yield pd.DataFrame(
                {
                    "sketch": [sketch.tobytes()],
                    "cands": [list(map(str, cands.index))],
                }
            )

    parts = words.mapInPandas(
        build, "sketch binary, cands array<string>"
    ).collect()
    merged = np.zeros((depth, width), dtype=np.int64)
    cand_set: set[str] = set()
    for row in parts:
        merged += np.frombuffer(row.sketch, dtype=np.int64).reshape(
            depth, width
        )
        cand_set.update(row.cands)
    return merged, cand_set


def cms_estimate(
    sketch: np.ndarray, word: str, depth: int = 4, width: int = 8192
) -> int:
    """Point estimate from a merged sketch: min over the depth rows.
    Never under-counts (every cell holds the true count plus
    non-negative collision mass — the one-sided CM guarantee)."""
    return int(
        min(sketch[d, _hash_idx(word, d, width)] for d in range(depth))
    )


def topk_heavy_hitters_cms(
    words: DataFrame,
    col: str = "w",
    k: int = 10,
    depth: int = 4,
    width: int = 8192,
    candidates_per_partition: int = 64,
) -> list[tuple[str, int]]:
    """Approximate global top-k of ``words[col]`` with bounded shuffle.

    Returns a driver-side list of (word, estimated_count), sorted by
    (-count, word). The only data leaving executors is one sketch +
    ``candidates_per_partition`` candidate words per partition.
    """
    merged, cand_set = merged_cms(
        words, col, depth, width, candidates_per_partition
    )
    if not cand_set:
        return []
    scored = sorted(
        ((w, cms_estimate(merged, w, depth, width)) for w in cand_set),
        key=lambda t: (-t[1], t[0]),
    )
    return scored[:k]
