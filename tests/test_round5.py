"""Round-5 regression tests: MERGE's NULL delete-condition semantics,
txlog timestamp monotonicity under writer clock skew, and the CDC
high-water-mark guard."""

from __future__ import annotations

import time as _time

import pytest
from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    changes,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.txlog import (
    TableLog,
)


def test_merge_upsert_null_delete_condition_takes_upsert_path(spark):
    # SQL MERGE's WHEN MATCHED AND <cond> treats NULL as false: a source
    # row whose delete condition evaluates to NULL must UPDATE its target
    # match (or INSERT), never silently delete it and vanish.
    target = spark.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0)], ["k", "status", "amount"]
    )
    source = spark.createDataFrame(
        [(1, None, 11.0), (3, None, 30.0), (2, "del", 0.0)],
        ["k", "status", "amount"],
    )
    # status == 'del' is NULL for the NULL-status rows
    out = changes.merge_upsert(
        target, source, ["k"], delete_condition=F.col("status") == "del"
    )
    got = sorted((r.k, r.status, r.amount) for r in out.collect())
    # 1: matched, NULL cond -> UPDATE; 3: unmatched, NULL cond -> INSERT;
    # 2: matched true cond -> DELETE
    assert got == [(1, None, 11.0), (3, None, 30.0)]


def test_txlog_commit_timestamps_strictly_monotonic(spark, tmp_path, monkeypatch):
    log = TableLog(spark, str(tmp_path / "t"))
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    real_now_ms = int(_time.time() * 1000)
    log.write(df, mode="overwrite")  # v0 at the real clock

    # a second writer whose wall clock runs a minute behind
    monkeypatch.setattr(_time, "time", lambda: (real_now_ms - 60_000) / 1000.0)
    log.write(df, mode="append")  # v1 — skewed clock

    hist = log.history()
    ts = [h["ts_ms"] for h in hist]
    assert ts == sorted(ts) and len(set(ts)) == len(ts), (
        f"commit timestamps must be strictly monotonic, got {ts}"
    )
    # TIMESTAMP AS OF at the first commit's instant must resolve to it,
    # not skip to the later-but-backdated second commit
    v_first, v_second = hist[0]["version"], hist[1]["version"]
    assert log.version_at(ts[0]) == v_first
    assert log.version_at(ts[1]) == v_second


def test_incremental_summary_pipeline_over_txlog_stream(spark, tmp_path):
    """End-to-end continuous pipeline: ingest commits → txlog stream tail →
    exactly-once summary folds. After each drain the maintained summary is
    BIT-equal to a from-scratch rebuild of the source table — the CDC
    upgrade of the reference's rebuild-everything AggregationJob."""
    from pyspark.sql import functions as F

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.aggregates import (
        exact_sum,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming import (
        run_incremental_summary,
    )

    source = str(tmp_path / "facts")
    summary_root = str(tmp_path / "summary")
    chk = str(tmp_path / "chk")
    src_log = TableLog(spark, source)

    batches = [
        [("a", 1.25), ("a", 2.50), ("b", 4.00)],
        [("b", 0.75), ("c", 10.10)],
        [("a", 0.01), ("c", 0.02), ("c", 0.03)],
        [("d", 7.77)],
    ]
    for i, rows in enumerate(batches):
        src_log.write(
            spark.createDataFrame(rows, ["k", "v"]), mode="append"
        )
        run_incremental_summary(
            spark, source, summary_root, chk, keys=["k"], sum_cols={"v": 2}
        )
        got = sorted(
            (r.k, r.cnt, r.v)
            for r in TableLog(spark, summary_root).read().collect()
        )
        want = sorted(
            (r.k, r.cnt, r.v)
            for r in src_log.read()
            .groupBy("k")
            .agg(F.count("*").alias("cnt"), exact_sum("v", 2).alias("v"))
            .collect()
        )
        assert got == want, f"summary diverged from rebuild after commit {i + 1}"

    # the summary advanced once per drained commit — incremental, not rebuilt
    assert len(TableLog(spark, summary_root).versions()) == len(batches)


def test_txlog_txn_token_makes_replayed_writes_idempotent(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([("a", 1)], ["k", "n"])
    df2 = spark.createDataFrame([("b", 2)], ["k", "n"])
    v1 = log.write(df1, mode="append", txn=("app", 0))
    # a crashed-and-replayed producer re-sends the SAME logical txn
    v_replay = log.write(df1, mode="append", txn=("app", 0))
    assert v_replay == v1 and log.read().count() == 1
    # the next txn version commits normally
    v2 = log.write(df2, mode="append", txn=("app", 1))
    assert v2 == v1 + 1 and log.read().count() == 2
    assert log.last_txn_version("app") == 1
    assert log.last_txn_version("other") is None


def test_table_changes_from_version_above_latest_raises(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "t"))
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    log.write(df, mode="overwrite")  # v1
    log.write(df, mode="append")  # v2

    # from_version == latest is a legitimate empty window
    assert log.table_changes(2).count() == 0
    # anything above it is a corrupted high-water mark, not an empty feed
    with pytest.raises(ValueError, match="no version 3 to read from"):
        log.table_changes(3)


def test_embedding_cluster_collapse_first_equals_full_graph(spark):
    # A heavily-duplicated corpus: exact-dup groups are cliques at cosine
    # 1.0, so collapse-first resolution over one rep per distinct vector
    # must reproduce the full-graph components exactly — including the
    # ≥2-copy group whose rep pairs with no other rep (a cluster of its
    # own) and the unique vector joining a cluster through a rep pair.
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        dedup,
    )

    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.9, 0.1, 0.0, 0.0]  # cosine(base, near) ≈ 0.994
    far = [0.0, 0.0, 1.0, 0.0]  # orthogonal to both
    lone_pair = [0.0, 1.0, 0.0, 0.0]
    zero = [0.0, 0.0, 0.0, 0.0]
    rows = (
        [(i, base) for i in range(0, 5)]  # 5 copies of base
        + [(10, near)]  # unique, near base
        + [(20, far), (21, far)]  # isolated 2-copy group
        + [(30, lone_pair)]  # unique, no neighbors → not in output
        + [(40, zero), (41, zero)]  # duplicated ZERO vectors: NULL
        # self-cosine → their members pair with nothing → no cluster
    )
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    fast = sorted(
        map(tuple, dedup.embedding_near_dup_clusters(emb, 0.9).collect())
    )
    full = sorted(
        map(
            tuple,
            dedup.resolve_clusters(
                dedup.embedding_near_dup_pairs(emb, 0.9)
            ).collect(),
        )
    )
    assert fast == full
    assert (20, 20) in fast and (21, 20) in fast  # isolated dup group kept
    assert (10, 0) in fast  # unique vector joined via rep pair
    assert all(m != 30 for m, _ in fast)  # true singleton excluded
    assert all(m not in (40, 41) for m, _ in fast)  # zero dup group excluded


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_minhash_lsh_equals_exhaustive_jaccard(spark, sf_dir):
    # The minhash_lsh_pairs ORACLE is the exhaustive exact-Jaccard
    # formulation; they agree iff banded recall is total on this corpus
    # (precision is 1.0 by construction). This pins that equality at both
    # driver scales so a geometry/corpus change that opens a recall gap
    # fails here before it can reach a CORRECTNESS row.
    import duckdb

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        ORACLES,
        QUERIES,
    )

    eng = sorted(
        (r.doc_a, r.doc_b, float(r.jaccard))
        for r in QUERIES["minhash_lsh_pairs"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ora = sorted(
        (a, b, float(j))
        for a, b, j in con.execute(ORACLES["minhash_lsh_pairs"]).fetchall()
    )
    assert eng == ora


def test_semantic_dedup_prunes_within_cluster_only(spark):
    # Two tight families of near-identical vectors plus one outlier.
    # Family A (ids 0,1,2) and family B (ids 10,11) are internally at
    # cosine ~1; A and B are orthogonal so they land in different k-means
    # cells (k=2 seeds from the two lowest ids, one per family direction).
    # Keep-lowest-id: the family minimum survives, every other member is
    # dropped; the orthogonal outlier has no within-cluster neighbor over
    # the threshold and survives regardless of which cell it falls in.
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    rows = [
        (0, [1.0, 0.0, 0.01, 0.0], 0),
        (1, [1.0, 0.0, 0.0, 0.01], 0),
        (2, [0.99, 0.0, 0.0, 0.0], 0),
        (10, [0.0, 1.0, 0.01, 0.0], 1),
        (11, [0.0, 0.99, 0.0, 0.0], 1),
        (20, [0.0, 0.0, -1.0, 1.0], 2),  # outlier: cosine ≤ ~0 to both
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r.vec_id: (r.cluster, r.kept)
        for r in similarity.semantic_dedup(
            emb, k=2, iters=2, threshold=0.9
        ).collect()
    }
    assert set(out) == {0, 1, 2, 10, 11, 20}
    kept = {v for v, (_, k) in out.items() if k}
    # family minima + the outlier survive; other members pruned
    assert kept == {0, 10, 20}
    # pruning never crosses clusters: every dropped id shares its cluster
    # with a kept smaller id at cosine >= threshold (here its family min)
    assert out[1][0] == out[0][0] and out[2][0] == out[0][0]
    assert out[11][0] == out[10][0]


def test_semantic_dedup_zero_norm_always_kept(spark):
    # cosine folds to NULL against a zero vector -> never >= threshold ->
    # zero-norm members are always kept, even duplicated in one cluster
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    rows = [
        (0, [0.0, 0.0], 0),
        (1, [0.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [1.0, 0.001], 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r.vec_id: r.kept
        for r in similarity.semantic_dedup(
            emb, k=1, iters=1, threshold=0.5
        ).collect()
    }
    assert out[0] and out[1]          # zero-norm: kept despite duplication
    assert out[2] and not out[3]      # near-identical pair: lowest id wins


def test_semantic_dedup_blas_equals_fold(spark):
    # the refine-and-verify twins (matmul assignment + grouped-matmul
    # pairing) must be BIT-identical to the pure-fold form on real data
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fold = sorted(
        tuple(r)
        for r in similarity.semantic_dedup(
            emb, k=8, iters=2, threshold=0.35, method="fold"
        ).collect()
    )
    blas = sorted(
        tuple(r)
        for r in similarity.semantic_dedup(
            emb, k=8, iters=2, threshold=0.35, method="blas"
        ).collect()
    )
    assert fold == blas
    assert any(not kept for _, _, kept in fold)  # non-trivial corpus


def test_semantic_dedup_blas_boundary_band_uses_exact_fold(spark):
    # a pair whose cosine sits WITHIN the blas +/-2e-6 margin of the
    # threshold must be decided by the SQL fold, and agree with the pure
    # fold path: cos([1,0],[1,1]) = 0.707107 (rounded), threshold equal
    # to that exact rounded value -> the pair drops in both forms
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 1.0], 0),
        (7, [-1.0, 0.5], 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {}
    for method in ("fold", "blas"):
        out[method] = sorted(
            tuple(r)
            for r in similarity.semantic_dedup(
                emb, k=1, iters=1, threshold=0.707107, method=method
            ).collect()
        )
    assert out["fold"] == out["blas"]
    kept = {v: keep for v, _, keep in out["blas"]}
    assert kept == {0: True, 1: False, 7: True}


def test_kmeans_blas_resolves_identical_centroid_tie_like_fold(spark):
    # duplicated seed vectors -> two identical centroids -> every
    # vector's best distance ties across clusters; the blas twin's exact
    # python fold must break the tie to the LOWER cluster id, exactly as
    # array_min over (dist, cluster) structs does
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.0], 0),  # duplicate of 0: centroid 1 == centroid 0
        (2, [0.9, 0.1], 0),
        (3, [-1.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    fold = sorted(
        tuple(r)
        for r in similarity.kmeans_clusters(emb, k=2, iters=1).collect()
    )
    blas = sorted(
        tuple(r)
        for r in similarity.kmeans_clusters(
            emb, k=2, iters=1, method="blas"
        ).collect()
    )
    assert fold == blas


def test_md5_hyperplanes_match_sql_derivation(spark):
    # the cross-engine plane contract: component (p, d) is
    # (2m - 2^32) / 2^32 with m = first 8 md5 hex digits of "seed:p:d".
    # _hyperplanes (and the worker closures that inline the same
    # derivation) must agree bit-for-bit with the SQL formulation the
    # oracles run — asserted against DuckDB directly.
    import duckdb

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    planes = similarity._hyperplanes(dim=5, n_planes=3, seed=42)  # noqa: SLF001
    rows = duckdb.connect().execute(
        """
        SELECT CAST(pp.p AS INTEGER), CAST(dd.d AS INTEGER),
               (2.0 * list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(range(8), i -> CAST(instr('0123456789abcdef',
                     substring(md5(concat('42:', CAST(pp.p AS VARCHAR), ':',
                                          CAST(dd.d AS VARCHAR))),
                       CAST(i AS INTEGER) + 1, 1)) - 1 AS BIGINT))),
                  (s, x) -> s * 16 + x) - 4294967296.0) / 4294967296.0
        FROM range(3) pp(p) CROSS JOIN range(5) dd(d)
        """
    ).fetchall()
    for p, d, comp in rows:
        assert planes[p][d] == comp  # exact, not approx


def test_simhash_md5_bits_match_reference(spark):
    # bit b of a token's 64-bit hash = bit (b % 4) of hex digit (b // 4)
    # of its md5 — pinned against an independent hashlib reference,
    # including the vote fold and the packed long
    import hashlib

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        dedup,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta beta gamma")], "doc_id long, text string"
    )
    got = dedup.with_simhash(docs).select("simhash").head()[0]

    votes = [0] * 64
    for tok in "alpha beta beta gamma".split():
        h = hashlib.md5(tok.encode()).hexdigest()
        for b in range(64):
            bit = (int(h[b // 4], 16) >> (b % 4)) & 1
            votes[b] += 1 if bit else -1
    # Java long wrap-around for bit 63, same as shiftleft(1L, 63)
    expected = sum((1 << b) for b in range(64) if votes[b] > 0)
    if expected >= 1 << 63:
        expected -= 1 << 64
    assert got == expected


def test_pq_assign_exact_tie_resolves_to_lower_code(spark):
    # a subvector exactly equidistant from two codebook entries lands
    # inside the refine margin; the exact-fold re-decision must break
    # the tie to the LOWER code, the contract the SQL oracle's
    # row_number(ORDER BY dist, code) implements
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    sub = spark.createDataFrame(
        [(7, 0, [1.0, 0.0])], "vec_id long, j int, sv array<double>"
    )
    cents = spark.createDataFrame(
        [(0, 5, [2.0, 0.0]), (0, 3, [0.0, 0.0])], "j int, code int, cv array<double>"
    )
    out = similarity._pq_assign(sub, cents, "vec_id").collect()  # noqa: SLF001
    assert len(out) == 1 and out[0].code == 3


def test_lsh_signature_zero_vector_all_bits_clear(spark):
    # a zero vector's dots are exactly 0 against every plane — inside
    # the verify margin, re-decided by the exact fold to 0.0, and
    # 0.0 > 0 is false in both engines: signature must be 0
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    emb = spark.createDataFrame(
        [(1, [0.0] * 8, 0)], "vec_id long, embedding array<float>, label int"
    )
    sig = similarity.with_lsh_signature(emb, dim=8, n_planes=12).select(
        "lsh_sig"
    ).head()[0]
    assert sig == 0


def test_incremental_curation_pipeline_over_txlog_stream(spark, tmp_path):
    """End-to-end continuous curation: landing commits → txlog stream tail
    → exactly-once near-dedup against the growing corpus. After each
    drain the corpus equals the batch formulation applied commit by
    commit: intra-batch exact dups collapse, exact re-crawls and
    near-duplicates (Jaccard ≥ 0.5) of already-admitted documents are
    rejected, genuinely new documents are admitted."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming import (
        run_incremental_curation,
    )

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    near = base + " today"          # high-overlap shingle sets → near-dup
    fresh = "completely different subject matter about spark query planning internals"

    landing = str(tmp_path / "landing")
    corpus_root = str(tmp_path / "corpus")
    chk = str(tmp_path / "chk")
    land_log = TableLog(spark, landing)

    # commit 1: two exact copies + one distinct → 2 admitted
    land_log.write(
        spark.createDataFrame(
            [(0, base), (1, base), (2, fresh)], "doc_id long, text string"
        ),
        mode="append",
    )
    run_incremental_curation(spark, landing, corpus_root, chk)
    admitted = {r.doc_id for r in TableLog(spark, corpus_root).read().collect()}
    assert admitted == {0, 2}

    # commit 2: exact re-crawl of 0, near-dup of 0, and a new doc
    land_log.write(
        spark.createDataFrame(
            [(10, base), (11, near), (12, "unrelated novel text about txlog commit protocols and snapshots entirely")],
            "doc_id long, text string",
        ),
        mode="append",
    )
    run_incremental_curation(spark, landing, corpus_root, chk)
    admitted = {r.doc_id for r in TableLog(spark, corpus_root).read().collect()}
    assert admitted == {0, 2, 12}

    # re-drain with no new commits: corpus unchanged (exactly-once)
    v = TableLog(spark, corpus_root).versions()[-1]
    run_incremental_curation(spark, landing, corpus_root, chk)
    assert TableLog(spark, corpus_root).versions()[-1] == v

    # crash-replay: re-running a step with an already-committed txn token
    # is a no-op even outside the checkpointed stream
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming import (
        dedup_batch_into_corpus,
    )

    replay = spark.createDataFrame([(99, "another brand new document")],
                                   "doc_id long, text string")
    app = f"incremental-curation:{corpus_root}"
    v1 = dedup_batch_into_corpus(spark, replay, corpus_root, txn=(app, 1))
    v2 = dedup_batch_into_corpus(spark, replay, corpus_root, txn=(app, 1))
    assert v1 == v2
    admitted = {r.doc_id for r in TableLog(spark, corpus_root).read().collect()}
    assert admitted == {0, 2, 12}  # txn 1 <= checkpoint high-water: skipped


def test_lsh_signature_nan_component_sets_bits(spark):
    # DuckDB's total order evaluates NaN > 0 as true; the closures align
    # (a NaN dot sets the bit), so a NaN embedding component cannot flip
    # band keys between the engine and the SQL mirror
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    emb = spark.createDataFrame(
        [(1, [float("nan")] + [0.0] * 7, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    sig = similarity.with_lsh_signature(emb, dim=8, n_planes=12).select(
        "lsh_sig"
    ).head()[0]
    assert sig == (1 << 12) - 1


def test_logreg_training_descends_and_is_partition_invariant(spark, cat):
    """The distributed GD actually learns (log-loss strictly decreases
    over iterations) and the trained weights are bit-identical across
    input partitionings — the property the exact-decimal gradient sums
    + quantized sigmoid exist to buy."""
    import math

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        classify,
    )

    emb = cat.embeddings

    def loss(w):
        rows = classify.logreg_score(emb, w).collect()
        eps = 1e-9
        y = [(1.0 if r.label == 0 else 0.0) for r in rows]
        p = [min(max(r.score, eps), 1 - eps) for r in rows]
        return -sum(
            yi * math.log(pi) + (1 - yi) * math.log(1 - pi)
            for yi, pi in zip(y, p)
        ) / len(rows)

    losses = [
        loss(classify.logreg_train(emb, iters=i, lr=2.0)) for i in (0, 1, 3)
    ]
    assert losses[0] > losses[1] > losses[2], losses

    w1 = classify.logreg_train(emb.repartition(1), iters=2, lr=2.0)
    w32 = classify.logreg_train(emb.repartition(32), iters=2, lr=2.0)
    assert w1 == w32  # bit-identical, not merely close


def test_logreg_blas_twin_bit_equals_fold_form(spark, cat):
    """The GEMM refine-and-verify margin twin (via='blas', the default)
    must reproduce the all-SQL fold form BIT-EXACTLY — trained weights
    list-equal, scores/preds row-equal — because ambiguous rows (sigmoid
    within the provable GEMM error of a 1e-6 rounding boundary) are
    re-decided by the exact sequential fold and sigmoid/round always
    evaluate JVM-side on the refined margin."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        classify,
    )

    emb = cat.embeddings
    w_fold = classify.logreg_train(emb, iters=3, lr=2.0, via="fold")
    w_blas = classify.logreg_train(emb, iters=3, lr=2.0, via="blas")
    assert w_fold == w_blas  # bit-identical, not merely close

    key = lambda rows: sorted(
        (r.vec_id, r.label, r.score, r.pred) for r in rows
    )
    sf = classify.logreg_score(emb, w_fold, via="fold").collect()
    sb = classify.logreg_score(emb, w_fold, via="blas").collect()
    assert key(sf) == key(sb)


def test_logreg_blas_twin_survives_rounding_boundaries(spark):
    """Adversarial probe of the refine-and-verify margin: rows engineered
    so sigmoid(z) sits essentially ON a 1e-6 rounding boundary (where a
    GEMM-vs-fold ulp would flip the quantized activation), plus
    large-magnitude high-dim vectors that amplify BLAS reassociation —
    the blas scores must stay bit-equal to the fold scores on all of
    them."""
    import math

    import numpy as np

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        classify,
    )

    # 1-dim rows whose margin lands a libm-ulp from a rounding boundary:
    # z = logit((k + 0.5) / 1e6) with w = [0, 1] makes sigmoid(z) the
    # exact half-grid point up to double rounding — every row flags
    boundary = [
        (i, [float(math.log(p / (1.0 - p)))], i % 2)
        for i, p in enumerate(
            (k + 0.5) / 1e6 for k in range(100_000, 900_000, 7919)
        )
    ]
    emb_b = spark.createDataFrame(
        boundary, "vec_id long, embedding array<float>, label int"
    )
    kb = lambda rows: sorted((r.vec_id, r.score, r.pred) for r in rows)
    w = [0.0, 1.0]
    assert kb(classify.logreg_score(emb_b, w, via="fold").collect()) == kb(
        classify.logreg_score(emb_b, w, via="blas").collect()
    )

    # high-dim large-magnitude vectors: reassociation error territory
    rng = np.random.default_rng(7)
    big = [
        (i, [float(v) for v in rng.normal(0, 12, 48)], int(i % 3 == 0))
        for i in range(2000)
    ]
    emb_big = spark.createDataFrame(
        big, "vec_id long, embedding array<float>, label int"
    )
    w_big = [float(v) for v in rng.normal(0, 1, 49)]
    assert kb(classify.logreg_score(emb_big, w_big, via="fold").collect()) == kb(
        classify.logreg_score(emb_big, w_big, via="blas").collect()
    )
    # and the full training trajectory stays bit-equal on this data
    assert classify.logreg_train(emb_big, iters=2, via="fold") == \
        classify.logreg_train(emb_big, iters=2, via="blas")


def test_logreg_score_null_embedding_dropped(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        classify,
    )

    emb = spark.createDataFrame(
        [(1, [0.5, -0.25], 0), (2, None, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    w = classify.logreg_train(emb, iters=1, lr=2.0)
    assert len(w) == 3  # intercept + 2 features
    out = classify.logreg_score(emb, w).collect()
    assert [r.vec_id for r in out] == [1]


def test_classifier_model_roundtrip_equals_fused(spark, cat, tmp_path):
    # train-once/score-many: scoring against the persisted txlog model is
    # bit-equal to the fused train-in-query form (parquet round-trips the
    # weight doubles exactly) — the PQ index split, for the classifier
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        classify,
    )

    root = classify.model_build(cat.embeddings, str(tmp_path / "m"), iters=2)
    cached = sorted(map(tuple, classify.model_score(cat.embeddings, root).collect()))
    fused = sorted(
        map(tuple, classify.classifier_scores(cat.embeddings, iters=2).collect())
    )
    assert cached == fused


def test_perplexity_orders_repetitive_below_novel(spark):
    """The LM assigns LOWER perplexity to text made of corpus-frequent
    bigrams than to text of unseen ones — the signal CCNet-style
    filtering relies on; docs with <2 tokens never appear; an entirely
    out-of-vocabulary doc scores exactly the smoothed floor V/(0+V)."""
    import math

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        lm,
    )

    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common, "en") for i in range(8)]
        + [(100, "zq xv qj zq xv", "en"), (200, "the", "en"), (300, "", "en")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in lm.perplexity_scores(docs).collect()}
    assert 200 not in out and 300 not in out  # <2 tokens → no bigrams
    assert out[0].ppl < out[100].ppl  # frequent bigrams → less surprise
    # doc 100's bigrams: (zq,xv)×2 with cnt=2 ctx(zq)=2, (xv,qj) and
    # (qj,zq) with cnt=1 ctx=1 — exact values mirror the add-1 formula
    v = lm.vocab_size(docs)
    expected = [
        round(math.log(3 / (2 + v)), 6),
        round(math.log(2 / (1 + v)), 6),
        round(math.log(2 / (1 + v)), 6),
        round(math.log(3 / (2 + v)), 6),
    ]
    micro = round(sum(expected) * 1e6)
    n = 4
    avg_micro = (2 * -(-micro) + n) // (2 * n) if micro >= 0 else -(
        (2 * -micro + n) // (2 * n)
    )
    assert out[100].avg_logp == avg_micro / 1e6
    assert out[100].n_bigrams == 4


def test_perplexity_partition_invariant(spark, cat):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        lm,
    )

    docs = cat.documents
    a = sorted(map(tuple, lm.perplexity_scores(docs.repartition(1)).collect()))
    b = sorted(map(tuple, lm.perplexity_scores(docs.repartition(32)).collect()))
    assert a == b


def test_kmv_estimate_within_relative_error(spark, cat):
    """KMV's estimate concentrates around the exact distinct count with
    relative error ~1/sqrt(k-2); assert a generous 4-sigma band at k=64
    (±52%%) plus exactness for groups under k distinct keys."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        aggregates,
    )

    ev = cat.events
    exact = {
        r.event_type: r.n
        for r in ev.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r.event_type: r.kmv_distinct
        for r in aggregates.kmv_distinct(ev, k=64).collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        if n < 64:
            assert est[t] == float(n)  # under-k groups are exact
        else:
            assert abs(est[t] - n) / n < 0.52, (t, est[t], n)
