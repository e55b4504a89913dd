"""DSIR importance weights: pure-Python reference parity, target-lift
sanity, partition invariance, and degenerate seed sets."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    dsir,
)


def _ref_weights(docs: list[tuple[int, str, bool]], buckets: int):
    """Mirror of the operator in plain Python: md5 52-bit bucket,
    micro-quantized ln, integer arithmetic."""
    import hashlib

    def bucket(feat: str) -> int:
        return int(hashlib.md5(feat.encode()).hexdigest()[:13], 16) % buckets

    def micro(v: int) -> int:
        from decimal import Decimal

        return int(Decimal(repr(round(math.log(v), 6))) * 1_000_000)

    occ: list[tuple[int, bool, int]] = []
    for doc_id, text, t in docs:
        toks = text.split()
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        occ += [(doc_id, t, bucket(f)) for f in feats]
    ct: Counter = Counter()
    cr: Counter = Counter()
    for _, t, b in occ:
        cr[b] += 1
        ct[b] += 1 if t else 0
    nt, nr = sum(ct.values()), sum(cr.values())
    lr = {
        b: micro(ct[b] + 1)
        - micro(cr[b] + 1)
        + micro(nr + buckets)
        - micro(nt + buckets)
        for b in cr
    }
    out: dict[int, list[int]] = {}
    for doc_id, _, b in occ:
        w = out.setdefault(doc_id, [0, 0])
        w[0] += 1
        w[1] += lr[b]
    return {d: (n, wm) for d, (n, wm) in out.items()}


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", True),
    (1, "the quick brown fox sleeps all day long", True),
    (2, "der schnelle braune fuchs springt sehr hoch", False),
    (3, "le renard brun rapide saute par dessus", False),
    (4, "the lazy dog naps under the brown fox", True),
    (5, "", False),
]


def test_dsir_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t, "en" if flag else "xx") for i, t, flag in DOCS],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: (r.n_feats, r.weight_micro)
        for r in dsir.dsir_weights(df, F.col("lang") == "en", buckets=64).collect()
    }
    assert got == _ref_weights(DOCS, 64)


def test_dsir_lifts_target_like_documents(cat):
    w = dsir.dsir_weights(cat.documents, F.col("lang") == "en").collect()
    langs = {r.doc_id: r.lang for r in cat.documents.select("doc_id", "lang").collect()}
    en = [r.weight for r in w if langs[r.doc_id] == "en"]
    other = [r.weight for r in w if langs[r.doc_id] != "en"]
    assert sum(en) / len(en) > sum(other) / len(other)


def test_dsir_is_partition_invariant(cat):
    a = sorted(
        map(tuple, dsir.dsir_weights(cat.documents, F.col("lang") == "en").collect())
    )
    b = sorted(
        map(
            tuple,
            dsir.dsir_weights(
                cat.documents.repartition(13), F.col("lang") == "en"
            ).collect(),
        )
    )
    assert a == b


def test_dsir_cached_is_bit_equal_to_fused(cat, tmp_path):
    root = dsir.dsir_build(cat.documents, F.col("lang") == "en", str(tmp_path / "m"))
    fused = dsir.dsir_weights(cat.documents, F.col("lang") == "en").collect()
    cached = dsir.dsir_weights_cached(cat.documents, root).collect()
    assert sorted(map(tuple, fused)) == sorted(map(tuple, cached))


def test_dsir_cached_scores_unseen_cells_with_default(spark, tmp_path):
    """A scoring corpus with features the training pool never hashed
    coalesces those cells to the persisted smoothed default instead of
    dropping them (an inner join would silently shrink n_feats)."""
    train = spark.createDataFrame(
        [(0, "aa bb", "en"), (1, "cc dd", "xx")],
        "doc_id long, text string, lang string",
    )
    root = dsir.dsir_build(train, F.col("lang") == "en", str(tmp_path / "m"), buckets=8)
    score = spark.createDataFrame(
        [(9, "zz qq totally unseen tokens", "xx")],
        "doc_id long, text string, lang string",
    )
    rows = dsir.dsir_weights_cached(score, root).collect()
    assert len(rows) == 1 and rows[0].n_feats == 9  # 5 unigrams + 4 bigrams


def test_dsir_plan_broadcasts_ratio_table(cat):
    df = dsir.dsir_weights(cat.documents, F.col("lang") == "en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_degenerate_seed_sets(spark):
    df = spark.createDataFrame(
        [(i, t, "en" if flag else "xx") for i, t, flag in DOCS],
        "doc_id long, text string, lang string",
    )
    # empty seed set: nt = 0, every ct = 0 — still well-defined
    empty = dsir.dsir_weights(df, F.lit(False), buckets=64).collect()
    assert len(empty) == 5  # doc 5 has no tokens and emits nothing
    # full seed set: target = raw, so every cell ratio is ln(1) = 0
    full = dsir.dsir_weights(df, F.lit(True), buckets=64).collect()
    assert all(r.weight_micro == 0 for r in full)
