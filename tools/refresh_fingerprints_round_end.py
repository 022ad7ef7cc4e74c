"""Round-end fingerprint snapshot refresh, with priority retention.

Writes the current per-query fingerprints to the committed snapshot,
EXCEPT for entries still declared in ``_CHANGED_THIS_ROUND``: those
keep their previous (old) fingerprint so they continue to read as
drifted — which is what keeps their driver-sampling priority (the
ordering rank keys off drift directly). Prune verified entries from
``_CHANGED_THIS_ROUND`` FIRST (hash-green in a CORRECTNESS artifact
generated against the current code), then run this. Retaining on
declaration alone — not on ``latest_hash_green`` — is what makes a
LATE refresh safe: an artifact that greened an entry's OLD version
can no longer clear the new version's priority.
See the refresh-flow comment in queries_catalog.py.

    python tools/refresh_fingerprints_round_end.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from automotive_translation_pipeline_spark.queries_catalog import (  # noqa: E402
    _CHANGED_THIS_ROUND,
)
from tools.catalog_fingerprints import SNAPSHOT, current_fingerprints  # noqa: E402


def main() -> None:
    cur = current_fingerprints()
    old = json.loads(SNAPSHOT.read_text()) if SNAPSHOT.exists() else {}

    retained: list[str] = []
    out = dict(cur)
    for name in _CHANGED_THIS_ROUND:
        if name in old:
            out[name] = old[name]
            retained.append(name)

    SNAPSHOT.write_text(json.dumps(out, indent=0, sort_keys=True))
    print(f"snapshot: {len(out)} entries "
          f"({len(out) - len(old)} new vs previous)")
    print(f"retained old fingerprints (priority kept): {sorted(retained)}")


if __name__ == "__main__":
    main()
