"""Freeze golden result sets for the queries that have no SQL oracle
(hash-seeded LSH / sketch queries — `no_oracle` in the driver's
CORRECTNESS files). The frozen artifact turns their rows-only check into
hard parity evidence: `tests/test_golden.py` re-runs each query at
sf0.01 and asserts EXACT equality against the committed JSON.

Regenerate ONLY on a deliberate geometry/semantics change:

    python tools/freeze_golden.py              # writes tests/golden/*.json

Determinism contract (why exact equality is safe to assert):
- MinHash/SimHash/ANN-LSH signatures are seeded xxhash64 / fixed
  numpy-PCG hyperplanes — no RNG state, no time dependence;
- per-pair scores are computed per-row (no cross-partition float
  accumulation order), and are rounded below the float64 noise floor
  before comparison anyway;
- approx_event_stats sketches (HLL++, GK) have merge-order-insensitive
  register/summary updates at this data size (verified: identical output
  under local[2]/8-partition and local[8]/32-partition sessions).

Rows are canonicalized: columns sorted by name, floats rounded to 9
significant decimals, rows sorted by their JSON encoding.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = [
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "ann_lsh_topk",
    "embedding_near_dup_lsh",
    "approx_event_stats",
    "ann_pq_topk",
]

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)


def canonical_rows(df) -> list[list]:
    """Deterministic JSON-able encoding: columns sorted by name, floats
    rounded to 9 decimals, rows sorted by encoded value."""
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        row = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 9)
            elif isinstance(v, list):
                v = [round(x, 9) if isinstance(x, float) else x for x in v]
            row.append(v)
        rows.append(row)
    rows.sort(key=lambda row: json.dumps(row, default=str))
    return rows


def main() -> None:
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark import (
        get_spark,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("freeze-golden", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for name in GOLDEN_QUERIES:
        df = QUERIES[name](spark, SF_DIR)
        artifact = {
            "query": name,
            "sf_dir": SF_DIR,
            "columns": sorted(df.columns),
            "rows": canonical_rows(df),
        }
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(artifact, f, indent=1, default=str)
            f.write("\n")
        print(f"froze {name}: {len(artifact['rows'])} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
