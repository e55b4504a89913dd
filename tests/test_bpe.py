"""Distributed BPE tokenizer training: parity against a pure-Python
reference implementation, partition invariance, apply/count coherence,
and the early-stop contract."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    bpe,
)


def _ref_word_freqs(texts: list[str]) -> Counter:
    wf: Counter = Counter()
    for t in texts:
        for tok in t.split():
            w = tok.lower()
            if w and all("a" <= c <= "z" for c in w):
                wf[w] += 1
    return wf


def _ref_bpe(texts: list[str], k: int):
    """Reference trainer using the ENGINE'S merge-application spec:
    literal leftmost-non-overlapping replace on the space-delimited
    symbol string (`str.replace` — the exact semantics Java
    `String.replace` and DuckDB `replace()` share). Deliberately NOT
    the symbol-list formulation: on back-to-back occurrences inside one
    word ('a b a b') the string form merges only the first per round
    (the shared middle space is consumed), which is the engine's
    documented deviation from Sennrich's list semantics."""
    wf = _ref_word_freqs(texts)
    syms = {w: " " + " ".join(list(w) + ["</w>"]) + " " for w in wf}
    out = []
    for step in range(1, k + 1):
        pairs: Counter = Counter()
        for w, freq in wf.items():
            s = syms[w].split()
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        if cnt < 2:
            break
        out.append((step, a, b, a + b, cnt))
        for w in syms:
            syms[w] = syms[w].replace(f" {a} {b} ", f" {a + b} ")
    return out, {w: s.split() for w, s in syms.items()}, wf


TEXTS = [
    "low low low low low",
    "lower lower newer newer newer newer newer newer",
    "newest newest newest widest widest widest",
    "the quick brown fox jumps over the lazy dog the end",
    "Mixed CASE Words mixed case words MIXED case 123 skip-me",
]


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = [tuple(r) for r in bpe.bpe_train(docs, merges=10).collect()]
    want, _, _ = _ref_bpe(TEXTS, 10)
    assert got == want


def test_bpe_train_is_partition_invariant(cat):
    a = [tuple(r) for r in bpe.bpe_train(cat.documents, merges=4).collect()]
    b = [
        tuple(r)
        for r in bpe.bpe_train(cat.documents.repartition(17), merges=4).collect()
    ]
    assert a == b and len(a) == 4


def test_bpe_subword_counts_match_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_subwords)
        for r in bpe.bpe_subword_counts(docs, merges=10).collect()
    }
    _, syms, _ = _ref_bpe(TEXTS, 10)
    for i, t in enumerate(TEXTS):
        words = [
            w
            for w in (tok.lower() for tok in t.split())
            if w and all("a" <= c <= "z" for c in w)
        ]
        assert got[i] == (len(words), sum(len(syms[w]) for w in words))


def test_bpe_merges_reduce_token_counts(cat):
    """More merges can only shrink (or hold) every document's subword
    count, and with zero merges n_subwords = chars + words (each word
    is chars + the </w> marker)."""
    base = {
        r.doc_id: r.n_subwords
        for r in bpe.bpe_subword_counts(cat.documents, merges=0).collect()
    }
    merged = {
        r.doc_id: r.n_subwords
        for r in bpe.bpe_subword_counts(cat.documents, merges=6).collect()
    }
    assert set(base) == set(merged)
    assert all(merged[d] <= base[d] for d in base)
    assert any(merged[d] < base[d] for d in base)


def test_bpe_cached_counts_are_bit_equal_to_fused(cat, tmp_path):
    root = bpe.bpe_build(cat.documents, str(tmp_path / "bpe"), merges=6)
    fused = bpe.bpe_subword_counts(cat.documents, merges=6).collect()
    cached = bpe.subword_counts_cached(cat.documents, root).collect()
    assert sorted(map(tuple, fused)) == sorted(map(tuple, cached))


def test_bpe_model_registry_is_versioned(spark, cat, tmp_path):
    """Retraining commits a snapshot; versionAsOf pins the old rules."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.txlog import (
        TableLog,
    )

    root = str(tmp_path / "bpe")
    bpe.bpe_build(cat.documents, root, merges=3)
    bpe.bpe_build(cat.documents, root, merges=6)
    log = TableLog(spark, root)
    assert log.read(version=1).count() == 3
    assert log.read().count() == 6


def test_bpe_plans(cat):
    """The argmax is a TakeOrderedAndProject (per-partition heap, no
    global sort) over a partial-aggregated pair count; the apply side
    broadcasts the per-word lengths (never a SortMergeJoin)."""
    wf = bpe.word_freqs(cat.documents)
    argmax = (
        bpe._pair_counts(bpe._base_symbols(wf))
        .orderBy("cnt", ascending=False)
        .limit(1)
    )
    plan = argmax._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    apply_plan = (
        bpe.bpe_subword_counts(cat.documents, merges=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in apply_plan
    assert "SortMergeJoin" not in apply_plan


def test_bpe_train_stops_when_no_repeated_pairs(spark):
    docs = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    assert bpe.bpe_train(docs, merges=5).count() == 0


def test_bpe_word_filter_and_eow_marker(spark):
    """Non-[a-z]+ tokens never contribute; the </w> symbol keeps
    word-final merges distinct from mid-word ones."""
    docs = spark.createDataFrame(
        [(0, "ab ab ab 123 A1 --")], "doc_id long, text string"
    )
    rows = bpe.bpe_train(docs, merges=2).collect()
    assert [(r.lhs, r.rhs) for r in rows] == [("a", "b"), ("ab", "</w>")]
    assert [r.freq for r in rows] == [3, 3]
