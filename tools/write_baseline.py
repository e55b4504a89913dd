"""Generate BASELINE.md from two bench JSON files (sf0.1 and the
sf1-equivalent scaled run). Usage:

    python tools/write_baseline.py bench_sf01.json bench_sf1.json > BASELINE.md
"""

from __future__ import annotations

import json
import sys

HEADER = """# BASELINE — per-query benchmark anchor

The reference repo publishes no performance numbers (SURVEY.md §6), so the
baseline is this engine's own measured per-query wall time. **The rule:
future rounds must stay within 2× of these numbers per query at the same
scale factor** (the bench metric `total_query_runtime` inflates as queries
are added — always compare per-query, never the total).

Method: `bench.py`, local[32], 128 GiB box, one untimed warm-up run then
min-of-2 timed trials per query (single-shot numbers carry one-off
10-20 s host-scheduling/GC stalls on a random query per run — min-of-2
measures the query, not the pause; the warm-up removes the suite-position
JIT effect where a query whose expressions were already codegen-compiled
by earlier queries ran ~2× faster than the same query benched first —
the cause of every >2× "regression" flagged in rounds 1-3 on untouched
code). Caches cleared between trials.

Scale factors:
- **sf0.1** — `/root/testdata/sf0.1` (lineitem 600 k rows, documents 5 k,
  embeddings 2 k).
- **sf1-equivalent** — `/root/testdata/sf0.1` replicated 10× by
  `tools/make_scaled_sf.py` (disjoint key ranges per copy, content
  duplicated verbatim — deliberately dup-heavy, stressing the dedup/LSH
  caps; lineitem 6 M rows, documents 50 k, embeddings 20 k).

The `x` column is time(sf1)/time(sf0.1) for 10× data: `x` ≲ 10 means
sub-linear scaling (partition parallelism absorbing the growth); `x` > 10
flags super-linear behavior worth a look.

## What sf1 exposed (and what changed because of it)

The first sf1 run never finished: `embedding_near_dup_lsh` at fixed
6-bit×8-band geometry ground to a halt at 20 k vectors — per-band
candidate volume grows as n²/2^r, so r MUST scale with log2(√n). Three
fixes, all now in the operator family:
1. adaptive geometry (r = max(6, ceil(log2(n)/2)+2) from a metadata-only
   count), with per-band keys in an `array<long>` because a packed-long
   signature tops out at 63 planes;
2. signatures via one Arrow-batched numpy matmul instead of per-plane
   `aggregate(zip_with(...))` folds — Spark higher-order functions are
   interpreted, not codegen'd: 15 s → <1 s for 80 planes × 20 k vectors;
3. candidate pairs carry only ids through the band join + dedup, vectors
   join back afterward (a pair row with two 64-dim arrays is ~1 KB; the
   skinny form is 16 B).
Result: 8.2 s (r1, sf0.1) → ~2 s at sf0.1, ~5 s at sf1 — the operator now
scales sub-linearly across the decade.

The dup-heavy sf1 corpus then exposed the same disease in the text
near-dup family: MinHash/SimHash ran their signatures and band joins over
every copy of a duplicated text. Both operators now COLLAPSE exact
duplicates first (md5 group → min-id representative), run LSH over
distinct texts only, and expand representative pairs back through a
long-keyed (doc_id, rep_id) membership relation — signature work drops to
the distinct-text count and candidate volume drops by the square of the
duplication factor, the structure every production pretraining pipeline
uses (exact dedup before near-dup). Measured: minhash_lsh_pairs
46.3 s → 6.1 s, simhash_near_pairs 23.8 s → 4.2 s at sf1, with BETTER
recall (identical docs no longer flood band buckets past the cap).

"""


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    print(HEADER)
    print("## Per-query wall time (seconds)\n")
    print("| query | sf0.1 | sf1-equiv | x |")
    print("|---|---:|---:|---:|")
    for name in qa:
        ta, tb = qa[name], qb.get(name)
        ratio = f"{tb / ta:.1f}" if tb is not None and ta > 0 else "—"
        tb_s = f"{tb:.2f}" if tb is not None else "—"
        print(f"| {name} | {ta:.2f} | {tb_s} | {ratio} |")
    print(
        f"\n**Totals: sf0.1 = {a['value']:.1f} s, "
        f"sf1-equiv = {b['value']:.1f} s across {len(qa)} queries "
        f"(sum ratio {b['value'] / a['value']:.1f}× for 10× data).**"
    )


if __name__ == "__main__":
    main()
