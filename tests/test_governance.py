"""Training-data governance operators: deterministic sampling, benchmark
decontamination, and PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    dedup,
    sampling,
    text,
)


def test_hash_sample_deterministic_and_near_rate(cat):
    docs = cat.documents
    n = docs.count()
    s1 = sampling.hash_sample(docs, "doc_id", 25.0)
    s2 = sampling.hash_sample(docs.repartition(7), "doc_id", 25.0)
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids1 == ids2, "sample must be partitioning-independent"
    assert 0.15 <= len(ids1) / n <= 0.35, "rate should be near 25%"


def test_quota_sample_caps_every_group_deterministically(cat):
    docs = cat.documents
    out = sampling.quota_sample(docs, per_group=7)
    sizes = out.groupBy("lang", "source").count().collect()
    assert all(r["count"] <= 7 for r in sizes)
    # stable under repartitioning (hash order, not first-seen order)
    again = sampling.quota_sample(docs.repartition(11), per_group=7)
    assert {r.doc_id for r in out.select("doc_id").collect()} == {
        r.doc_id for r in again.select("doc_id").collect()
    }
    # groups smaller than the quota pass through whole
    orig = {(r.lang, r.source): r["count"] for r in
            docs.groupBy("lang", "source").count().collect()}
    for r in sizes:
        assert r["count"] == min(7, orig[(r.lang, r.source)])


def test_decontaminate_flags_overlap_only(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "en", "eval", 36),
        (100, "alpha beta gamma delta nothing else here at all", "en", "web", 47),
        (101, "totally unrelated content with no overlap words", "en", "web", 47),
        (102, "alpha beta gamma words only once though", "en", "web", 39),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    bench = docs.filter(F.col("doc_id") < 100)
    out = {r.doc_id: r for r in dedup.decontaminate(docs, bench, min_shared=2).collect()}
    assert 1 not in out, "benchmark docs are excluded from the verdict"
    assert out[100].is_contaminated and out[100].n_shared_shingles >= 2
    assert not out[101].is_contaminated and out[101].n_shared_shingles == 0
    # doc 102 shares exactly one 3-shingle ('alpha beta gamma') -> below min
    assert out[102].n_shared_shingles == 1 and not out[102].is_contaminated


def test_redact_pii_scrubs_and_counts(spark):
    rows = [
        (1, "contact bob.smith+spam@corp.example.org or call +1 (555) 123-4567 ok", "en", "web", 60),
        (2, "no pii in this document at all", "en", "web", 30),
        (3, "two mails a@b.io c@d.net and year 2023 then 2024", "en", "web", 48),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    out = {r.doc_id: r for r in text.redact_pii(docs).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1 and out[1].had_pii
    assert "<EMAIL>" in out[1].text_redacted and "<PHONE>" in out[1].text_redacted
    assert "@" not in out[1].text_redacted.replace("<EMAIL>", "")
    assert out[2].n_emails == 0 and out[2].n_phones == 0 and not out[2].had_pii
    assert out[2].text_redacted == rows[1][1]
    # isolated short digit groups (years) are not phone-like; note that
    # ADJACENT digit groups ("2023 2024") do redact — the pattern errs
    # toward recall, the right bias for PII scrubbing
    assert out[3].n_emails == 2 and out[3].n_phones == 0
    assert "2023" in out[3].text_redacted


def test_split_assign_deterministic_partition_and_proportions(cat):
    docs = cat.documents
    out = sampling.split_assign(docs, "doc_id")
    rows = out.select("doc_id", "split").collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    n = len(rows)
    frac_train = sum(r.split == "train" for r in rows) / n
    assert 0.8 <= frac_train <= 0.97, "train share should be near 90%"
    # assignment is a pure function of the key: partitioning-independent
    again = {r.doc_id: r.split for r in
             sampling.split_assign(docs.repartition(13), "doc_id")
             .select("doc_id", "split").collect()}
    assert {r.doc_id: r.split for r in rows} == again
    # every row gets exactly one split (no drops, no dupes)
    assert n == docs.count()


def test_boilerplate_segments_removes_cross_doc_banner(spark):
    # 6-token banner: segment 1 ("accept all cookies to continue") is
    # identical across docs 1-3; segment 2 starts with "reading" + unique text
    banner = "accept all cookies to continue reading"
    rows = [
        (1, banner + " unique alpha words for doc one here", "en", "web", 0),
        (2, banner + " different beta content in doc two ok", "en", "web", 0),
        (3, banner + " third gamma body text goes here now", "en", "web", 0),
        (4, "no banner at all just original delta prose here ok", "en", "web", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    out = {r.doc_id: r for r in
           dedup.remove_boilerplate_segments(docs, segment_tokens=5,
                                             max_doc_frequency=2).collect()}
    # the shared first 5-token segment appears in 3 docs > cap -> removed
    for d in (1, 2, 3):
        assert "accept all cookies to continue" not in out[d].text_clean
        assert out[d].n_removed >= 1
    # unique content survives, in order
    assert "unique alpha words for doc" in out[1].text_clean
    assert out[4].n_removed == 0 and out[4].text_clean == rows[3][1]
    # all docs present in the output
    assert set(out) == {1, 2, 3, 4}


def test_boilerplate_fully_duplicated_doc_empties(spark):
    t = "exactly five tokens in here"
    rows = [(i, t, "en", "web", 0) for i in range(1, 5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    out = dedup.remove_boilerplate_segments(docs, segment_tokens=5,
                                            max_doc_frequency=2).collect()
    assert all(r.text_clean == "" and r.n_removed == r.n_segments == 1 for r in out)


def test_repetition_stats_known_values(spark):
    rows = [
        # 6 tokens, all same: distinct 1/6, bigrams 5 all dup after first
        (1, "spam spam spam spam spam spam", "en", "web", 0),
        # 4 distinct tokens, no repeats at all
        (2, "alpha beta gamma delta", "en", "web", 0),
        (3, "", "en", "web", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    out = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    r1 = out[1]
    assert r1.n_tokens == 6
    assert r1.distinct_token_ratio == round(1 / 6, 4)
    assert r1.dup_bigram_frac == round(4 / 5, 4)   # 5 bigrams, 1 distinct
    assert r1.dup_trigram_frac == round(3 / 4, 4)  # 4 trigrams, 1 distinct
    assert r1.top_token_frac == 1.0
    r2 = out[2]
    assert r2.distinct_token_ratio == 1.0
    assert r2.dup_bigram_frac == 0.0 and r2.dup_trigram_frac == 0.0
    assert r2.top_token_frac == 0.25
    r3 = out[3]
    assert r3.n_tokens == 0 and r3.top_token_frac == 0.0


def test_pack_sequences_layout_invariants(cat):
    docs = cat.documents
    budget = 512
    out = sampling.pack_sequences(docs, budget_tokens=budget).collect()
    assert len(out) == docs.count()
    assert all(0 <= r.seq_offset < budget for r in out)
    # reconstruct the global layout: orders by (seq_id, seq_offset) and the
    # running token total must be exactly seq_id*budget + seq_offset
    laid = sorted(out, key=lambda r: (r.seq_id, r.seq_offset, r.doc_id))
    cum = 0
    for r in laid:
        assert r.seq_id * budget + r.seq_offset == cum, r
        cum += r.n_tokens
    # every sequence index up to the last is occupied — holes can only
    # come from a single doc spanning more than one full budget
    if max(r.n_tokens for r in out) < budget:
        seqs = {r.seq_id for r in out}
        assert seqs == set(range(max(seqs) + 1))
    # deterministic under repartitioning
    again = sampling.pack_sequences(docs.repartition(9), budget_tokens=budget).collect()
    assert {(r.doc_id, r.seq_id, r.seq_offset) for r in again} == {
        (r.doc_id, r.seq_id, r.seq_offset) for r in out
    }


def test_mixture_sample_binding_group_and_proportions(cat):
    docs = cat.documents
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    out = sampling.mixture_sample(docs, weights).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # only weighted sources appear
    assert set(by_src) <= set(weights)
    # the binding group (min g_tokens/w — src0 at these near-equal sizes)
    # is kept in full
    rates = {r.source: r.keep_rate for r in out}
    binding = min(rates, key=rates.get) if rates else None
    full = [s for s, rr in rates.items() if rr == 1.0]
    assert full, f"some group must be kept whole: {rates}"
    n_src0_total = docs.filter(F.col("source") == full[0]).count()
    assert len(by_src[full[0]]) == n_src0_total
    # achieved token mixture tracks the targets (hash granularity allows slack)
    toks = {s: sum(r.n_tokens for r in rows) for s, rows in by_src.items()}
    total = sum(toks.values())
    for s, w in weights.items():
        assert abs(toks.get(s, 0) / total - w) < 0.12, (s, toks, total)
    # deterministic under repartitioning
    again = sampling.mixture_sample(docs.repartition(7), weights).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in out}


def test_hash_sample_full_rate_keeps_everything(spark):
    # rate 100% (and anything rounding to >= 256/256) must be a no-op,
    # not a "< 'ff'" compare that drops the 1/256 of keys prefixed 'ff'
    rows = [(i, f"text {i}", "en", "web", 10) for i in range(4096)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    assert sampling.hash_sample(docs, "doc_id", 100.0).count() == 4096
    assert sampling.hash_sample(docs, "doc_id", 99.9).count() == 4096
    # a sub-full rate still filters
    assert sampling.hash_sample(docs, "doc_id", 50.0).count() < 4096


def test_mixture_sample_near_full_rate_rounds_to_full_keep(spark):
    # keep_rate within ~8e-6 below 1.0 rounds to threshold 65536, which
    # printf('%04x') renders as the 5-char '10000' — hex prefixes a-f sort
    # above '1', so without the rounded-threshold bypass the group keeps
    # only ~1/16 of its rows instead of ~100%
    rows = [(i, "tok " * 9 + "end", "en", "src_a" if i < 50 else "src_b", 40)
            for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    # equal token totals; w_b chosen so keep_rate_b*65536 lands in
    # [65535.5, 65536) and rounds up to 65536
    weights = {"src_a": 1.0, "src_b": 1.0 - 7.5e-6}
    out = sampling.mixture_sample(docs, weights)
    assert out.count() == 100, "both groups round to full keep"


def test_column_profile_single_pass_and_values(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.quality import (
        column_profile,
    )

    df = spark.createDataFrame(
        [(1, "a", 2.5, None), (2, "a", -1.0, None), (None, None, 2.5, None)],
        "k long, s string, v double, t timestamp",
    )
    out = {r.column: r for r in column_profile(df).collect()}
    assert out["k"].n_rows == 3 and out["k"].n_nulls == 1 and out["k"].n_distinct == 2
    assert out["k"].vmin == 1.0 and out["k"].vmax == 2.0
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 1
    assert out["s"].vmin is None and out["s"].vmax is None  # strings: no range
    assert out["v"].vmin == -1.0 and out["v"].vmax == 2.5 and out["v"].n_distinct == 2
    assert out["t"].n_nulls == 3 and out["t"].n_distinct == 0
    # one scan, no joins: all k columns profile in a single aggregation pass
    plan = column_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_column_profile_approx_matches_exact_shape_and_error(spark):
    """The HLL-backed twin reproduces the exact profile's null counts and
    ranges identically, estimates every cardinality within the m=256 HLL
    error envelope (~6.5% standard error; assert 25%), and its plan has
    no Expand (the exact count-distinct's k×rows shuffle shape)."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.quality import (
        column_profile,
        column_profile_approx,
    )

    df = spark.range(5000).selectExpr(
        "id AS k",
        "CAST(id % 37 AS STRING) AS s",
        "CAST(id % 1000 AS DOUBLE) / 4 AS v",
        "IF(id % 10 = 0, NULL, CAST(id AS DOUBLE)) AS maybe",
    )
    exact = {r.column: r for r in column_profile(df).collect()}
    approx = {r.column: r for r in column_profile_approx(df).collect()}
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c], approx[c]
        assert (a.n_rows, a.n_nulls, a.vmin, a.vmax) == (
            e.n_rows, e.n_nulls, e.vmin, e.vmax,
        ), c
        if e.n_distinct:
            assert abs(a.n_distinct_approx - e.n_distinct) <= 0.25 * e.n_distinct, (
                c, a.n_distinct_approx, e.n_distinct,
            )
    plan = (
        column_profile_approx(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan and "Join" not in plan
    # all-null column: estimate is exactly 0
    nul = spark.range(3).selectExpr("CAST(NULL AS STRING) AS s")
    row = column_profile_approx(nul).collect()[0]
    assert row.n_distinct_approx == 0.0 and row.n_nulls == 3


def test_column_profile_handles_awkward_column_names(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.quality import (
        column_profile,
    )

    df = spark.createDataFrame([(1, 2.0), (None, 3.5)], ["a.dotted", "with space"])
    out = {r.column: r for r in column_profile(df).collect()}
    assert out["a.dotted"].n_nulls == 1 and out["a.dotted"].vmax == 1.0
    assert out["with space"].n_distinct == 2 and out["with space"].vmin == 2.0
