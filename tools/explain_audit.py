"""Plan audit: dump `explain formatted` for the headline queries and
grep-able one-line verdicts for the plan properties the engine claims
(pushdown, broadcast joins, partial aggregation, top-k without sort).

Usage: python tools/explain_audit.py [sf_dir] [query ...] > PLANS.md
"""

from __future__ import annotations

import os
import sys

HEADLINE = [
    "star_fact",
    "agg_pair_daily",
    "top_pairs",
    "returned_items",
    "rollup_revenue",
    "sole_late_suppliers",
    "important_parts",
    "curate_documents",
    "embedding_near_dup_lsh",
    "ann_ivf_topk",
    "decontaminate",
    "hash_sample",
    "minhash_lsh_pairs",
    "repeated_spans",
    "span_coverage",
    "corpus_report",
    "scd2_user_history",
    "merge_upsert",
    "incremental_agg",
    "top_terms",
    "scd2_point_in_time",
    "adaptive_quality",
    "incremental_dedup",
    "kmeans_clusters",
    # round-5 additions: the newly-oracled LSH/PQ family + SemDeDup
    "simhash_near_pairs",
    "ann_lsh_topk",
    "ann_pq_topk",
    "semantic_dedup",
    "near_dedup_incremental",
    "classifier_scores",
    # late-round-5 additions (trade_pagerank is omitted: its result is
    # an eager localCheckpoint, so the interesting plans execute inside
    # pagerank() — the probe and tests/test_graph.py cover it)
    "rank_fusion_cached",
    "bpe_subword_counts",
    "dsir_weights",
    # round-6 additions: the mergeable quantile summary, the skew-safe
    # salted join, and the collapse-first n-gram Jaccard rewrite
    "gk_quantiles",
    "skewed_hot_key_join",
    "ngram_jaccard_pairs",
    # round-7 additions: the sketch-backed profile twin and the
    # embedding-space leakage gate
    "column_profile_approx",
    "embedding_leakage_report",
]

CLAIMS = {
    "star_fact": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    "top_pairs": [("TakeOrderedAndProject", True)],
    "returned_items": [("BroadcastHashJoin", True), ("EqualTo(l_returnflag,R)", True)],
    "rollup_revenue": [("Expand", True)],
    # eval-set shingles broadcast; the corpus side must never sort-merge
    "decontaminate": [("BroadcastHashJoin", True)],
    # sampling filter must reach the scan as a data filter, not a
    # post-scan Filter-only plan (md5 isn't a pushable predicate, but the
    # scan must still project nothing extra)
    "hash_sample": [("Scan parquet", True)],
    # bucket cap is a broadcast anti-join against hot keys
    "minhash_lsh_pairs": [("BroadcastHashJoin LeftAnti", True)],
    # survivor text recovery broadcasts the small side; the exploded
    # span relation must never sort-merge
    "repeated_spans": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    "span_coverage": [("BroadcastHashJoin", True)],
    # one scan, one shuffle: a single Exchange pair for the grouped agg
    # (plus countDistinct's internal expand), no joins at all
    "corpus_report": [("Join", False)],
    # both Window passes ride ONE Exchange on the key; no joins
    "scd2_user_history": [("Join", False), ("Window", True)],
    # MERGE = broadcast anti join + union; never a full outer join
    "merge_upsert": [("BroadcastHashJoin LeftAnti", True), ("SortMergeJoin", False)],
    # summary ∪ delta-partials re-aggregated: pure hash agg, no joins
    "incremental_agg": [("Join", False), ("HashAggregate", True)],
    # heavy hitters: partial count absorbs repeats; top-k without sort
    "top_terms": [("TakeOrderedAndProject", True), ("Join", False)],
    # union-sort PIT shape: Window over the union, NO join of any kind
    # (the naive range join would show facts × versions here)
    "scd2_point_in_time": [("Join", False), ("Window", True), ("Union", True)],
    # per-lang thresholds broadcast back onto the scan; corpus never SMJs
    "adaptive_quality": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # digest anti-join against the standing corpus; payload re-attach is
    # a semi join — no full-width shuffle of surviving text
    "incremental_dedup": [("LeftAnti", True), ("LeftSemi", True)],
    # final assignment is scan + literal-centroid argmin: no join at all
    "kmeans_clusters": [("Join", False), ("Scan parquet", True)],
    # hot-chunk cap is a broadcast anti-join; the 16-bit pigeonhole
    # candidate join shuffles id-keyed rows only
    "simhash_near_pairs": [("BroadcastHashJoin LeftAnti", True)],
    # query bands broadcast against the corpus scan; never sort-merge
    "ann_lsh_topk": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # ADC LUT and the shortlist both broadcast; partial agg absorbs the
    # m-fold code expansion before any Exchange
    "ann_pq_topk": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # corpus band keys join incoming band keys on id-only rows; the
    # text re-attach for Jaccard verification is hash-keyed
    "near_dedup_incremental": [("BroadcastHashJoin LeftAnti", True)],
    # scoring under trained weight literals: pure scan + project, no join
    "classifier_scores": [("Join", False), ("Scan parquet", True)],
    # fusion over persisted models: the three signal joins broadcast;
    # the four windows share one (lang, source) Exchange — never SMJ
    "rank_fusion_cached": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # per-word subword lengths broadcast onto the word explode
    "bpe_subword_counts": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # the B-row log-ratio table broadcasts back onto the feature explode
    "dsir_weights": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # summary merge shuffles shards×B rows per group; no joins at all
    "gk_quantiles": [("Join", False), ("Window", True)],
    # the dim side salt-replicates then broadcasts; the Zipf-head fact
    # side must never sort-merge onto one reducer
    "skewed_hot_key_join": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # block cap + collapse-first: hot blocks leave via broadcast anti-join
    "ngram_jaccard_pairs": [("BroadcastHashJoin LeftAnti", True)],
    # the whole point of the twin: registers replace the exact
    # count-distinct's Expand, and the unpivot+two-level agg never joins
    "column_profile_approx": [("Expand", False), ("Join", False)],
    # inherits the LSH bucket cap (broadcast anti-join); candidate and
    # split joins stay hash/broadcast, never a cartesian
    "embedding_leakage_report": [
        ("BroadcastHashJoin LeftAnti", True),
        ("CartesianProduct", False),
    ],
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or HEADLINE

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark import (
        get_spark,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"# Plan audit @ {sf_dir}\n")
    failures = 0
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )
        print(f"## {name}\n")
        for claim, expected in CLAIMS.get(name, []):
            present = claim in plan
            ok = present == expected
            failures += not ok
            verdict = "ok" if ok else "VIOLATED"
            want = "present" if expected else "absent"
            print(f"- claim `{claim}` {want}: **{verdict}**")
        print("\n```\n" + plan.strip() + "\n```\n")
    spark.stop()
    print(f"\n_{failures} claim violations_\n", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
