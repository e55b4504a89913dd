"""Three-decade scaling probe: min-of-2 wall times for the scale-sensitive
query subset at an arbitrary sf directory (see SCALING.md "Three-decade
probe" for the recorded sf0.1 / sf1 / sf10 table).

Build the scaled inputs first:

    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf10 100

then:

    python tools/bench_scale_probe.py /tmp/sf10 > probe_sf10.json

Unlike bench.py (the per-round driver bench, warm-up + min-of-2 over the
full suite), this probe skips the warm-up run: at 100× the queries are
seconds long, so codegen JIT noise is a rounding error and a third
execution of the heavy LSH queries costs real minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "star_fact",
    "agg_pair_daily",
    "pricing_summary",
    "priority_shipping",
    "sole_late_suppliers",
    "event_funnel",
    "top_pairs",
    "dedup_exact",
    "incremental_dedup",
    "repeated_spans",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "embedding_near_dup_lsh",
    # split-PQ search: first trial pays the one-time index build over the
    # probe corpus (train + refine-and-verify encode of every vector),
    # min-of-2 reports the cached ADC search — both paths scale-relevant
    "ann_pq_cached_topk",
    "ann_ivf_topk",
    # iterative supervised training: 3 GD jobs, d+1-state shuffles
    "classifier_scores",
    # bigram-LM train + perplexity score: two (w1[,w2]) count shuffles
    "perplexity_scores",
    "kmeans_clusters",
    "curate_documents",
    "top_terms",
    "pack_sequences",
    "mixture_sample",
    "scd2_point_in_time",
    # round-5 additions: the worst sf1 scalers not previously probed,
    # plus the queries round 5 touched
    "market_share",
    "returned_items",
    "local_supplier_volume",
    "scd2_user_history",
    "merge_upsert",
    "near_dedup_incremental",
    "embedding_near_dup",
    "near_dup_clusters",
    "kept_vectors",
    # late-round-5 additions: the fixed-memory CMS sketch (shuffle bounded
    # at partitions x depth x width regardless of corpus size) and the
    # per-source A-ES weighted sample (one window shuffle, capped output)
    "cms_heavy_hitters",
    "weighted_sample",
    # the ensemble fusion (three in-query model trainings + one fused
    # window shuffle) and the train-once/score-many splits of the
    # classifier and the bigram LM (txlog-persisted models; first trial
    # pays the build, min-of-2 reports the cached scoring path)
    "rank_fusion_curation",
    "classifier_cached_scores",
    "perplexity_cached",
    # fusion against the persisted models (first trial pays both model
    # builds, min-of-2 reports the score-and-fuse path)
    "rank_fusion_cached",
    # distributed BPE training: one corpus scan to the distinct-word
    # table, then 8 pair-count rounds over that vocabulary-sized
    # relation — cost should track distinct words, not corpus size
    "bpe_train_merges",
    "bpe_subword_counts",
    # token accounting against the txlog-persisted tokenizer (first
    # trial pays the build, min-of-2 reports the apply path)
    "bpe_counts_cached",
    # iterative graph centrality: edge build + 3 join-aggregate rounds
    # over the src-partitioned cached edge list
    "trade_pagerank",
    # DSIR importance weights: two passes over corpus tokens + a
    # B-bounded cell shuffle + a broadcast log-ratio table
    "dsir_weights",
    # scoring against the persisted ratio table (first trial pays the
    # build, min-of-2 reports the single scoring pass)
    "dsir_weights_cached",
    # round-6 additions: the remaining sketch/profile families, the
    # round-5 watch item (ngram_jaccard_pairs, 5.6x at sf1 on the
    # dup-heavy corpus), and the three new round-6 queries
    "hll_distinct",
    "column_profile",
    "ngram_jaccard_pairs",
    "gk_quantiles",
    "skewed_hot_key_join",
    "decoded_media_stats",
    "kmv_segment_overlap",
    "bloom_prejoin_revenue",
    # round-6 mining trio (re-anchored min-of-2 in round 7 — the first
    # sitting was cold single runs) and the round-6 release gate
    "hard_negatives",
    "triplet_mining",
    "int8_quantize",
    "split_leakage_report",
    # round-7 additions: the HLL-backed profile twin (the fix for
    # column_profile's 5.3x/decade exact count-distinct Expand) and the
    # embedding-space leakage gate (composes the LSH near-dup + split)
    "column_profile_approx",
    "embedding_leakage_report",
    # round 8: the DNF SQL-DML end-to-end (OR/paren DELETE + UPDATE over
    # a fresh txlog table — near-flat: rewrite bounded by candidates)
    "sql_dnf_row_ops",
]


def _extra_probes():
    """Scale-sensitive operators whose REGISTRY query pins oracle-friendly
    parameters that are wrong at probe scale: semantic_dedup's registry
    entry pins k=8 + the fold pairing (what the DuckDB unroll mirrors),
    which is quadratic at a 100x corpus — the production contract is the
    adaptive default (k = ceil(sqrt(n)), GEMM twins), so that is what the
    probe measures.  (embedding_near_dup_lsh needs no such twin: its
    registry query IS the adaptive production form — the round-5 oracle
    re-derives the adaptive geometry from the same exact count, so the
    mirror did not force a pin.)"""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    def semantic_dedup_adaptive(spark, sf_dir):
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        return similarity.semantic_dedup(emb)

    def cdc_apply_loop(spark, sf_dir):
        """The streaming/upsert.py apply loop on a 10-slice change stream
        derived from the probe-scale events table: each slice inserts its
        event_id range and re-emits ~3% of the previous range as updates
        (CDC time-locality), so every merge exercises stats-pruned
        insert+update against a growing txlog table."""
        import uuid

        from pyspark.sql import functions as F

        from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.io import (
            load_events,
        )
        from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.txlog import (
            TableLog,
        )
        from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming.upsert import (
            apply_changes_batch,
        )

        root = f"/tmp/cdc_probe_{uuid.uuid4().hex}"
        ev = load_events(spark, os.path.join(sf_dir, "events.parquet")).select(
            "event_id", "user_id", "event_type", "value"
        )
        id_max = ev.agg(F.max("event_id")).head()[0]
        step = id_max // 10 + 1
        for i in range(10):
            inserts = ev.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ).withColumn("lsn", F.col("event_id"))
            batch = inserts
            if i:
                updates = (
                    ev.filter(
                        (F.col("event_id") >= (i - 1) * step)
                        & (F.col("event_id") < i * step)
                        & (F.col("event_id") % 31 == 0)
                    )
                    .withColumn("value", F.col("value") + 1)
                    .withColumn("lsn", F.col("event_id") + F.lit(10 * step))
                )
                batch = inserts.unionByName(updates)
            apply_changes_batch(
                spark, batch, root, ["event_id"], "lsn",
                txn=("cdc-probe", i),
            )
        return TableLog(spark, root).read()

    return {
        "semantic_dedup_adaptive": semantic_dedup_adaptive,
        "cdc_apply_loop": cdc_apply_loop,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    only = set(sys.argv[2:])  # optional subset of probe names to re-measure
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark import (
        get_spark,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    spark = get_spark("bench-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    runners = {name: QUERIES[name] for name in SUBSET}
    runners.update(_extra_probes())
    if only:
        unknown = only - set(runners)
        if unknown:
            # a typo must not silently emit an empty probe record (a
            # value-0 total reads as a dramatic speedup in a run-total
            # comparison)
            raise SystemExit(f"unknown probe name(s): {sorted(unknown)}")
        runners = {n: f for n, f in runners.items() if n in only}
    times: dict[str, float] = {}
    for name, fn in runners.items():
        trials = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            trials.append(time.time() - t0)
            spark.catalog.clearCache()
        times[name] = round(min(trials), 3)
        print(f"probe {name}: {times[name]}s", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "metric": "scale_probe_runtime",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
