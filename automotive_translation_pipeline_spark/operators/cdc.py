"""Change-data-capture apply: upsert + delete-tombstone snapshot.

A training-data lakehouse continuously re-materializes snapshots from
change feeds (document edits, takedown/delete requests, label fixes).
The engine-side semantics are: for each key keep the payload of the
highest-sequence change, unless that change is a delete tombstone — in
which case the key vanishes from the snapshot. Same contract as Delta's
``MERGE WHEN MATCHED DELETE`` / ``APPLY CHANGES INTO``, expressed as a
keyed window so it runs on any store.

Scale shape: one shuffle on the key, bounded per-key window state; the
feed is never joined against itself. Out-of-order and duplicated feed
rows are harmless — ordering is by the explicit sequence columns, with
a deterministic tie-break the caller supplies in ``seq_cols``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    feed: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a change feed to its latest-wins snapshot.

    ``seq_cols`` must be a total order within each key (append a unique
    id as the last element). Rows whose WINNING change is ``delete_op``
    are dropped; earlier inserts/updates under a later tombstone never
    resurface.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn", op_col)
    )
