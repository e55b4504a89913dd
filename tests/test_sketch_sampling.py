"""Late-round-5 additions: count-min-sketch heavy hitters and A-ES
weighted sampling — the over-count guarantee, partition invariance, and
weight-proportional membership."""

from __future__ import annotations

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    sampling,
    text,
)


def _exact_counts(documents):
    return {
        r.term: r.n
        for r in documents.select(
            F.explode(text.tokens_col(F.col("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }


def test_cms_never_undercounts_and_error_is_bounded(cat):
    docs = cat.documents
    exact = _exact_counts(docs)
    n_tokens = sum(exact.values())
    width = 1024
    est = {
        r.term: r.cms_count
        for r in text.cms_heavy_hitters(docs, width=width).collect()
    }
    assert est, "sketch returned nothing"
    for term, e in est.items():
        assert e >= exact[term], f"{term}: CMS under-counted {e} < {exact[term]}"
        # e*N/width Markov bound per row, driven to ~certainty by the
        # min over depth=4 independent rows; 4x slack keeps it stable
        assert e - exact[term] <= max(4, 4 * n_tokens / width), (
            f"{term}: over-count {e - exact[term]} breaches the CMS bound"
        )


def test_cms_contains_the_true_top_term_and_is_partition_invariant(cat):
    docs = cat.documents
    exact = _exact_counts(docs)
    top_true = max(exact, key=lambda t: (exact[t], t))
    base = text.cms_heavy_hitters(docs).collect()
    assert top_true in {r.term for r in base}, (
        "CMS never under-counts, so the true #1 term cannot drop out"
    )
    shuffled = text.cms_heavy_hitters(docs.repartition(7)).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_weighted_sample_caps_groups_and_is_partition_invariant(cat):
    docs = cat.documents
    out = sampling.weighted_sample(docs, per_group=20)
    sizes = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    avail = {
        r.source: r.n
        for r in docs.filter(F.col("n_chars") > 0)
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for src, n in sizes.items():
        assert n == min(20, avail[src])
    again = sampling.weighted_sample(docs.repartition(11), per_group=20)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_weighted_sample_prefers_heavy_rows(spark):
    # 200 rows in one group: 10 with weight 1000, 190 with weight 1.
    # Under A-ES a weight-1000 row beats a weight-1 row w.p. 1000/1001,
    # so with 20 slots essentially all heavy rows survive; the draw is
    # a fixed function of md5(id), making the assertion deterministic.
    rows = [(i, "s", 1000 if i < 10 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    kept = {
        r.doc_id
        for r in sampling.weighted_sample(df, per_group=20).collect()
    }
    heavy_kept = sum(1 for i in range(10) if i in kept)
    assert heavy_kept >= 9, f"only {heavy_kept}/10 heavy rows survived"
    assert len(kept) == 20


def test_weighted_sample_drops_nonpositive_and_null_weights(spark):
    rows = [(1, "s", 100), (2, "s", 0), (3, "s", -5), (4, "s", None), (5, "s", 7)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    kept = sorted(
        r.doc_id for r in sampling.weighted_sample(df, per_group=10).collect()
    )
    assert kept == [1, 5]


def test_perplexity_cached_is_bit_equal_to_fused(cat, tmp_path):
    # train-once/score-many for the bigram LM: scoring against the
    # persisted txlog (lm, meta) tables is bit-equal to the fused
    # train-in-query form — quantized logp doubles round-trip parquet
    # exactly, and the persisted vocabulary size pins the smoothing floor
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        lm,
    )

    root = lm.lm_build(cat.documents, str(tmp_path / "lm_model"))
    cached = sorted(map(tuple, lm.perplexity_cached(cat.documents, root).collect()))
    fused = sorted(map(tuple, lm.perplexity_scores(cat.documents).collect()))
    assert cached == fused


def test_hll_distinct_error_bound_and_merge_semantics(spark, cat):
    """From-scratch HLL (m=256): estimate within the standard-error
    envelope of exact (3·1.04/√m ≈ 20%), invariant to duplication (the
    registers are maxima) and to partitioning."""
    from pyspark.sql import functions as F

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.aggregates import (
        hll_distinct,
    )

    e = cat.events
    est = {r.event_type: r.hll_distinct for r in hll_distinct(e).collect()}
    exact = {
        r.event_type: r.d
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for t, d in exact.items():
        assert abs(est[t] - d) <= 0.2 * d + 2, (t, est[t], d)
    # duplication invariance: registers are maxima, so a 3x-replicated
    # stream yields the bit-identical sketch
    tripled = e.union(e).union(e)
    est3 = {r.event_type: r.hll_distinct for r in hll_distinct(tripled).collect()}
    assert est3 == est
    # partition invariance
    est_p = {
        r.event_type: r.hll_distinct
        for r in hll_distinct(e.repartition(13)).collect()
    }
    assert est_p == est


def test_gk_quantiles_rank_error_bound_and_partition_invariance(spark, cat):
    """Mergeable equi-depth quantile summary: every reported quantile's
    TRUE rank is within the summary's rank-error envelope
    (sum of per-shard bucket widths ~ n/B + shards) of the target rank,
    and the summary is invariant to Spark partitioning (the shards are
    md5-derived, not physical)."""
    from pyspark.sql import functions as F

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.aggregates import (
        gk_quantiles,
    )

    e = cat.events
    out = {r.event_type: r for r in gk_quantiles(e).collect()}
    vals = {
        t: sorted(
            r.value
            for r in e.filter(
                (F.col("event_type") == t)
                & F.col("value").isNotNull()
                & F.col("event_id").isNotNull()
            ).collect()
        )
        for t in out
    }
    for t, row in out.items():
        v = vals[t]
        n = len(v)
        assert row.n_events == n
        # rank error: per-shard bucket width ceil(n_s/32) summed over
        # <=16 shards
        eps = n // 32 + 16 + 1
        for q, got in [
            (0.25, row.q25),
            (0.5, row.q50),
            (0.75, row.q75),
            (0.95, row.q95),
        ]:
            target = -((-int(q * 100) * n) // 100)  # ceil(q*n), exact
            # the reported value's true-rank interval [lo, hi]
            import bisect

            lo = bisect.bisect_left(v, got) + 1
            hi = bisect.bisect_right(v, got)
            assert lo - eps <= target <= hi + eps, (t, q, got, target, lo, hi)
    # partition invariance: md5 shards, not physical partitions
    out_p = {
        r.event_type: r for r in gk_quantiles(e.repartition(13)).collect()
    }
    assert {t: tuple(r) for t, r in out_p.items()} == {
        t: tuple(r) for t, r in out.items()
    }


def test_kmv_segment_overlap_error_bounds_and_exact_small_groups(spark, cat):
    """Sketch-based set algebra: every pair estimate lands within the
    KMV error envelope of the exact overlap, and pairs where BOTH
    segments have < k distinct keys are EXACT (theta = 1, the sketch is
    the set)."""
    from pyspark.sql import functions as F

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.aggregates import (
        kmv_segment_overlap,
    )

    e = cat.events
    got = {(r.type_a, r.type_b): r for r in kmv_segment_overlap(e).collect()}
    sets = {
        t: {
            r.user_id
            for r in e.filter(
                (F.col("event_type") == t) & F.col("user_id").isNotNull()
            )
            .select("user_id")
            .distinct()
            .collect()
        }
        for t in {a for a, _ in got} | {b for _, b in got}
    }
    # 3-sigma KMV envelope around 1/sqrt(k-2), plus slack for the
    # small-count regime
    for (a, b), r in got.items():
        A, B = sets[a], sets[b]
        uni, inter = len(A | B), len(A & B)
        tol = 3 * uni / (62**0.5) + 3
        assert abs(r.est_union - uni) <= tol, ((a, b), r.est_union, uni)
        assert abs(r.est_intersect - inter) <= tol, (
            (a, b),
            r.est_intersect,
            inter,
        )
        if len(A) < 64 and len(B) < 64:
            assert (r.est_union, r.est_intersect) == (
                float(uni),
                float(inter),
            ), "small segments must be exact (theta = 1)"
    # partition invariance: sketches are functions of md5, not layout
    got_p = {
        (r.type_a, r.type_b): tuple(r)
        for r in kmv_segment_overlap(e.repartition(13)).collect()
    }
    assert got_p == {k: tuple(r) for k, r in got.items()}
