"""Hard parity evidence for the queries that have no SQL oracle.

The five hash-seeded LSH / sketch queries are flagged ``no_oracle`` in
the driver's CORRECTNESS files — their rows-only check proves nothing
about values. These tests close that gap: each query re-runs at sf0.01
and must match the committed golden artifact EXACTLY (frozen by
``tools/freeze_golden.py``; regenerate only on a deliberate geometry or
semantics change).

Exact equality is safe because the operators are fully deterministic:
seeded xxhash64 / fixed-seed numpy hyperplanes, per-row scores (no
cross-partition float accumulation), merge-order-insensitive sketches —
verified by regenerating under a local[2]/7-shuffle-partition session
and getting byte-identical artifacts.
"""

from __future__ import annotations

import json
import os

import pytest

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
    QUERIES,
)
from tools.freeze_golden import GOLDEN_QUERIES, OUT_DIR, SF_DIR, canonical_rows


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_exact_match(spark, name):
    path = os.path.join(OUT_DIR, f"{name}.json")
    frozen = json.load(open(path))
    df = QUERIES[name](spark, SF_DIR)
    assert sorted(df.columns) == frozen["columns"]
    rows = json.loads(json.dumps(canonical_rows(df), default=str))
    assert rows == frozen["rows"], (
        f"{name} diverged from {path} — if the geometry change was "
        "deliberate, regenerate with tools/freeze_golden.py"
    )
