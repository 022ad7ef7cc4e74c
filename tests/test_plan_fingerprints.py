"""Golden physical-plan fingerprint guard (round-6 verdict #7).

Each of the heaviest catalog queries has a committed operator multiset
(tools/plan_fingerprints.json). A code edit that changes a plan's
SHAPE — un-broadcasts a join, adds a shuffle, drops a partial
aggregate — fails here the day it lands, instead of surfacing as a
bench regression a round later. Intentional shape changes are
re-recorded with `python tools/gen_plan_fingerprints.py`.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from gen_plan_fingerprints import GUARDED, SF_DIR, plan_fingerprint  # noqa: E402

_GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)),
    "tools",
    "plan_fingerprints.json",
)
with open(_GOLDEN_PATH) as _fh:
    GOLDEN = json.load(_fh)


def test_every_guarded_query_has_a_committed_fingerprint():
    assert sorted(GOLDEN) == sorted(GUARDED)


@pytest.mark.parametrize("name", GUARDED)
def test_plan_fingerprint_unchanged(spark, name):
    from automotive_translation_pipeline_spark import queries_catalog as qc

    spark.catalog.clearCache()
    live = plan_fingerprint(qc.queries()[name](spark, SF_DIR))
    assert live == GOLDEN[name], (
        f"physical plan shape of {name} drifted from the committed "
        f"fingerprint; if intentional, regenerate with "
        f"`python tools/gen_plan_fingerprints.py`.\n"
        f"live={live}\ngolden={GOLDEN[name]}"
    )
