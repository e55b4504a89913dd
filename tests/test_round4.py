"""Round-4 operators: point-in-time join, incremental corpus dedup,
adaptive quality filter, distributed k-means."""

from __future__ import annotations

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    changes,
    dedup,
    similarity,
    text,
)


# ---------------------------------------------------------------------------
# point_in_time_join
# ---------------------------------------------------------------------------


def _pit(spark, facts_rows, dim_rows):
    facts = spark.createDataFrame(facts_rows, ["fid", "uid", "ts"])
    dim = spark.createDataFrame(dim_rows, ["uid", "attr", "valid_from", "version_no"])
    return changes.point_in_time_join(
        facts, dim, key="uid", ts_col="ts", from_col="valid_from",
        attr_cols=["attr", "version_no"], seq_col="version_no",
    )


def test_pit_picks_effective_version(spark):
    out = _pit(
        spark,
        [(1, 1, 5), (2, 1, 10), (3, 1, 15), (4, 1, 25)],
        [(1, "a", 10, 1), (1, "b", 20, 2)],
    ).collect()
    got = {r.fid: (r.dim_attr, r.dim_version_no) for r in out}
    # fact before the first version -> nulls (left-join semantics)
    assert got[1] == (None, None)
    # fact at exactly valid_from gets the version starting there
    assert got[2] == ("a", 1)
    assert got[3] == ("a", 1)
    assert got[4] == ("b", 2)


def test_pit_unknown_key_gets_nulls(spark):
    out = _pit(spark, [(1, 99, 10)], [(1, "a", 5, 1)]).collect()
    assert out[0].dim_attr is None and out[0].dim_version_no is None


def test_pit_same_timestamp_versions_later_wins(spark):
    # two versions share valid_from: version 1 is zero-width, version 2
    # must win for facts at and after that timestamp (range-join parity)
    out = _pit(
        spark,
        [(1, 1, 10), (2, 1, 30)],
        [(1, "old", 10, 1), (1, "new", 10, 2)],
    ).collect()
    got = {r.fid: r.dim_attr for r in out}
    assert got == {1: "new", 2: "new"}


def test_pit_null_attribute_value_survives(spark):
    # a version whose attribute is legitimately null must NOT resurrect
    # the previous version's value (struct-wrapped last, not per-column)
    facts = spark.createDataFrame([(1, 1, 25)], ["fid", "uid", "ts"])
    dim = spark.createDataFrame(
        [(1, "a", 10, 1), (1, None, 20, 2)],
        ["uid", "attr", "valid_from", "version_no"],
    )
    out = changes.point_in_time_join(
        facts, dim, key="uid", ts_col="ts", from_col="valid_from",
        attr_cols=["attr", "version_no"], seq_col="version_no",
    ).collect()
    assert out[0].dim_attr is None
    assert out[0].dim_version_no == 2  # ...but the version itself applied


def test_pit_output_row_count_equals_facts(spark):
    # union-sort shape: |facts| rows out, never facts x versions
    out = _pit(
        spark,
        [(i, 1, 15) for i in range(20)],
        [(1, "a", 10, 1), (1, "b", 12, 2), (1, "c", 14, 3)],
    )
    assert out.count() == 20


# ---------------------------------------------------------------------------
# dedup_against_corpus
# ---------------------------------------------------------------------------


def test_incremental_dedup_drops_known_and_collapses_batch(spark):
    corpus = spark.createDataFrame(
        [(1, "known text"), (2, "other text")], ["doc_id", "text"]
    )
    incoming = spark.createDataFrame(
        [
            (10, "known text"),   # already in corpus -> dropped
            (11, "fresh one"),    # new -> kept
            (12, "fresh two"),    # new, duplicated in batch -> min id kept
            (13, "fresh two"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r.doc_id
        for r in dedup.dedup_against_corpus(incoming, corpus).collect()
    )
    assert kept == [11, 12]


def test_incremental_dedup_empty_corpus_is_plain_exact_dedup(spark):
    corpus = spark.createDataFrame([], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], ["doc_id", "text"]
    )
    kept = sorted(
        r.doc_id
        for r in dedup.dedup_against_corpus(incoming, corpus).collect()
    )
    assert kept == [1, 2]


# ---------------------------------------------------------------------------
# adaptive_quality_filter
# ---------------------------------------------------------------------------


def test_adaptive_quality_thresholds_are_per_language(spark):
    # en: diversities 1.0, 1.0, 0.5, 0.25 -> p25 = 0.4375 -> doc 4 dropped
    # fr: all identical -> threshold equals the score -> all kept
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "s", 1),
            (2, "e f g h", "en", "s", 1),
            (3, "a a b b", "en", "s", 1),
            (4, "a a a a", "en", "s", 1),
            (5, "x x", "fr", "s", 1),
            (6, "y y", "fr", "s", 1),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    kept = sorted(
        r.doc_id for r in text.adaptive_quality_filter(docs).collect()
    )
    assert kept == [1, 2, 3, 5, 6]


def test_adaptive_quality_empty_text_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, "a b", "en", "s", 3),
         (3, "c d", "en", "s", 3), (4, "e f", "en", "s", 3)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r.doc_id: r.diversity for r in
           text.adaptive_quality_filter(docs).collect()}
    # p25 over [0.0, 1.0, 1.0, 1.0] = 0.75: the empty doc is cut
    assert 1 not in out and set(out) == {2, 3, 4}


# ---------------------------------------------------------------------------
# kmeans_clusters
# ---------------------------------------------------------------------------


def test_kmeans_partition_invariant(spark, cat):
    emb = cat.embeddings
    base = {
        (r.vec_id, r.cluster)
        for r in similarity.kmeans_clusters(emb, k=4, iters=2).collect()
    }
    shuffled = {
        (r.vec_id, r.cluster)
        for r in similarity.kmeans_clusters(
            emb.repartition(7), k=4, iters=2
        ).collect()
    }
    assert base == shuffled
    assert len(base) == emb.count()


def test_kmeans_iterations_reduce_inertia(spark, cat):
    # Lloyd's guarantee: total within-cluster distance is non-increasing
    # per iteration. Compare inertia after 0 vs 2 updates.
    emb = cat.embeddings

    def inertia(iters):
        assigned = similarity.kmeans_clusters(emb, k=4, iters=iters)
        corpus = emb.withColumn(
            "ev", F.col("embedding").cast("array<double>")
        ).select("vec_id", "ev")
        joined = assigned.join(corpus, "vec_id")
        cents = (
            joined.select("cluster", F.posexplode("ev").alias("pos", "e"))
            .groupBy("cluster", "pos")
            .agg(F.avg("e").alias("c"))
        )
        back = (
            joined.select("vec_id", "cluster", F.posexplode("ev").alias("pos", "e"))
            .join(cents, ["cluster", "pos"])
            .groupBy("vec_id")
            .agg(F.sum((F.col("e") - F.col("c")) ** 2).alias("d"))
        )
        return back.agg(F.sum("d")).collect()[0][0]

    assert inertia(2) <= inertia(0) + 1e-9


# ---------------------------------------------------------------------------
# streaming point-in-time enrichment (stream-static range join twin)
# ---------------------------------------------------------------------------


def test_stream_pit_enrich_matches_batch_operator(spark, cat, tmp_path):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources import io
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming.enrich import (
        pit_enrich_events_stream,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming.events import (
        read_events_stream,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    ev = io.load_events(spark, src).filter(F.col("user_id") % 97 == 0)
    profile = ev.filter(F.col("event_id") % 3 == 0)
    dim = changes.scd2_history(
        profile, "user_id", "event_type", ["ts_us", "event_id"]
    )

    stream = read_events_stream(spark, src).filter(
        (F.col("user_id") % 97 == 0) & (F.col("event_id") % 3 != 0)
    )
    # the raw stream carries ns-as-long ts; rebuild ts_us like load_events
    ts_field = dict(
        (f.name, f.dataType.simpleString())
        for f in stream.schema.fields
    ).get("ts")
    if ts_field == "bigint":
        stream = stream.withColumn("ts_us", F.expr("ts DIV 1000"))
    else:
        stream = stream.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        )
    enriched = pit_enrich_events_stream(
        stream.select("event_id", "user_id", "ts_us"),
        dim,
        attr_cols=["event_type", "version_no"],
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("pit_enrich_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pit"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.event_id, r.dim_event_type, r.dim_version_no)
        for r in spark.table("pit_enrich_test").collect()
    }

    facts = ev.filter(F.col("event_id") % 3 != 0).select(
        "event_id", "user_id", "ts_us"
    )
    batch = changes.point_in_time_join(
        facts, dim, key="user_id", ts_col="ts_us", from_col="valid_from",
        attr_cols=["event_type", "version_no"], seq_col="version_no",
    )
    expected = {
        (r.event_id, r.dim_event_type, r.dim_version_no)
        for r in batch.collect()
    }
    assert streamed == expected and len(expected) > 0


# ---------------------------------------------------------------------------
# review fixes: MERGE delete scope, dedup null-vs-empty, kmeans sparse ids
# ---------------------------------------------------------------------------


def test_merge_upsert_unmatched_delete_row_still_inserts(spark):
    # SQL MERGE scopes the delete to WHEN MATCHED: a delete-flagged source
    # row with no target match falls through to INSERT, never vanishes
    target = spark.createDataFrame([(1, "keep", 0), (2, "kill", 0)],
                                   ["k", "flag", "v"])
    source = spark.createDataFrame(
        [
            (2, "kill", 9),   # matched + delete flag -> target row removed
            (3, "kill", 9),   # UNMATCHED + delete flag -> inserted
            (4, "keep", 9),   # unmatched, no flag -> inserted
            (1, "keep", 9),   # matched, no flag -> updated
        ],
        ["k", "flag", "v"],
    )
    out = sorted(
        (r.k, r.flag, r.v)
        for r in changes.merge_upsert(
            target, source, ["k"], delete_condition=F.col("flag") == "kill"
        ).collect()
    )
    assert out == [(1, "keep", 9), (3, "kill", 9), (4, "keep", 9)]


def test_incremental_dedup_null_text_distinct_from_empty(spark):
    corpus = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    incoming = spark.createDataFrame(
        [(10, None), (11, "")], "doc_id long, text string"
    )
    kept = sorted(
        r.doc_id
        for r in dedup.dedup_against_corpus(incoming, corpus).collect()
    )
    # '' is a known content -> dropped; NULL is NOT the same content -> kept
    assert kept == [10]


def test_kmeans_seeds_k_centroids_with_sparse_ids(spark, cat):
    # offset id space: a `vec_id < k` init would seed ZERO centroids and
    # return all-null clusters; the k-lowest-ids init must still work
    emb = cat.embeddings.withColumn("vec_id", F.col("vec_id") + 100000)
    out = similarity.kmeans_clusters(emb, k=4, iters=1)
    rows = out.collect()
    assert all(r.cluster is not None for r in rows)
    assert len({r.cluster for r in rows}) == 4


def test_near_dedup_against_corpus(spark):
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango")
    near = base.rsplit(" ", 1)[0] + " uniform"   # one word changed at end
    corpus = spark.createDataFrame([(1, base)], ["doc_id", "text"])
    incoming = spark.createDataFrame(
        [
            (10, base),                      # exact copy -> dropped
            (11, near),                      # near-dup (jaccard ~0.84) -> dropped
            (12, "completely different words with nothing shared at all ok"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r.doc_id
        for r in dedup.near_dedup_against_corpus(
            incoming, corpus, threshold=0.5
        ).collect()
    )
    assert kept == [12]


def test_near_dedup_against_empty_corpus_keeps_all(spark):
    corpus = spark.createDataFrame([], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(1, "some words here for a doc"), (2, "other words there")],
        ["doc_id", "text"],
    )
    kept = sorted(
        r.doc_id
        for r in dedup.near_dedup_against_corpus(incoming, corpus).collect()
    )
    assert kept == [1, 2]
