"""Round-2 surface tests: streaming dedup, JSON/ORC io, multimodal
resize/frame-sample, and physical-plan shape assertions for the new
analytic queries."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    multimodal,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources import io

SF_DIR = "/root/testdata/sf0.001"


def test_stream_dedup_removes_redelivered(spark, tmp_path):
    # simulate at-least-once delivery: the same events file lands twice
    src = f"{SF_DIR}/events.parquet"
    dup_dir = tmp_path / "events_dup"
    dup_dir.mkdir()
    shutil.copy(src, dup_dir / "delivery1.parquet")
    shutil.copy(src, dup_dir / "delivery2.parquet")

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming import (
        run_stream_dedup,
    )

    run_stream_dedup(
        spark, str(dup_dir), str(tmp_path / "ckpt"), sink_table="dedup_test"
    )
    n_unique = io.load_events(spark, src).select("event_id").distinct().count()
    assert spark.table("dedup_test").count() == n_unique


def test_stream_document_dedup_by_content_hash(spark, tmp_path):
    """A re-crawled page (same text, later ingest_ts, different doc_id)
    is dropped within the watermark delay; distinct texts pass. NULL text
    and '' are distinct contents (null-distinguishing digest, matching
    the batch collapse)."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming import (
        dedup_documents_stream,
    )

    src = tmp_path / "docs_stream"
    src.mkdir()
    staging = tmp_path / "staging"
    spark.createDataFrame(
        [
            (1, "same page text", "2024-01-01 00:00:00"),
            (2, "same page text", "2024-01-01 01:00:00"),  # re-crawl: dropped
            (3, "different text", "2024-01-01 02:00:00"),
            (4, None, "2024-01-01 03:00:00"),
            (5, "", "2024-01-01 03:30:00"),  # distinct from NULL
        ],
        "doc_id long, text string, ingest_ts string",
    ).withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp")).coalesce(
        1
    ).write.parquet(str(staging))
    for i, part in enumerate(staging.glob("part-*.parquet")):
        shutil.copy(part, src / f"delivery{i}.parquet")
    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(str(src))
    q = (
        dedup_documents_stream(stream, delay="24 hours")
        .writeStream.format("memory")
        .queryName("doc_dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.table("doc_dedup_test").collect()}
    assert 3 in kept and 4 in kept and 5 in kept
    assert len(kept & {1, 2}) == 1  # exactly one copy of the re-crawled page
    assert "text_hash" not in spark.table("doc_dedup_test").columns


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], "id long, s string, v double"
    )
    path = str(tmp_path / "j")
    io.write_json(df, path)
    back = io.read_json(spark, path, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "x", 30)], "id long, part string, v long"
    )
    path = str(tmp_path / "o")
    io.write_orc(df, path, partition_cols=["part"])
    back = io.read_orc(spark, path).select("id", "part", "v")
    assert sorted((r.id, r.part, r.v) for r in back.collect()) == [
        (1, "x", 10), (2, "y", 20), (3, "x", 30),
    ]


def test_resize_images_shape_and_determinism(cat):
    media = multimodal.documents_as_media(cat.documents.limit(30))
    out = multimodal.resize_images(media, width=8, height=8).collect()
    n_images = len([r for r in media.collect() if r.media_type == "image"])
    assert len(out) == n_images > 0
    assert all(len(r.thumbnail) == 8 * 8 * 3 for r in out)
    again = multimodal.resize_images(media, width=8, height=8).collect()
    assert sorted(r.media_id for r in out) == sorted(r.media_id for r in again)


def test_sample_frames_fanout(spark):
    docs = spark.createDataFrame(
        # doc_id % 3 == 2 -> video; 9000 bytes -> 3 frames
        [(2, "x" * 9000, "en", "s", 9000), (5, "y" * 100, "en", "s", 100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = multimodal.documents_as_media(docs)
    frames = multimodal.sample_frames(media, every_s=10).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[2]) == 3 and len(by_id[5]) == 1
    assert [r.frame_ts_s for r in sorted(by_id[2], key=lambda r: r.frame_idx)] == [
        0, 10, 20,
    ]
    # digests are content+index keyed: all distinct
    assert len({r.frame_md5 for r in frames}) == len(frames)


# ---------------------------------------------------------------------------
# physical plan shape: the optimizations we claim must appear in the plan
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_returned_items_broadcasts_dims_and_pushes_filter(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    df = QUERIES["returned_items"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims broadcast at this scale
    # the returnflag filter must reach the parquet scan
    assert "PushedFilters" in plan and "l_returnflag" in plan.split("PushedFilters", 1)[1][:400]


def test_large_volume_orders_aggregates_before_join(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    plan = _plan(QUERIES["large_volume_orders"](spark, SF_DIR))
    # partial aggregation (map-side combine) must run below the shuffle
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_rollup_is_single_expand_not_multiple_scans(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    plan = _plan(QUERIES["rollup_revenue"](spark, SF_DIR))
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1


def test_approx_sketches_within_error_bounds(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        aggregates,
    )

    ev = io.load_events(spark, f"{SF_DIR}/events.parquet")
    approx = {r.event_type: r for r in aggregates.approx_event_stats(ev).collect()}
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert a.n_events == e.n
        # HLL++ rsd=1%: allow 5% slack
        assert abs(a.approx_users - e.users) <= max(0.05 * e.users, 2)
        # the GK sketch guarantees RANK error (±n/accuracy), and returns a
        # real data value (no interpolation, unlike exact percentile()) —
        # so assert the rank contract, not value closeness
        for frac, got in ((0.5, a.p50_value), (0.95, a.p95_value)):
            rank = ev.filter(
                (F.col("event_type") == et) & (F.col("value") <= got)
            ).count()
            eps = e.n / 10000 + 1
            assert frac * e.n - eps <= rank <= frac * e.n + eps


def test_stream_static_enrich_matches_batch_join(spark, cat, tmp_path):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming import (
        run_stream_enrich,
    )

    src = f"{SF_DIR}/events.parquet"
    run_stream_enrich(
        spark, src, cat.customer, str(tmp_path / "ckpt_enr"), sink_table="enrich_test"
    )
    streamed = spark.table("enrich_test")
    ev = io.load_events(spark, src)
    batch = ev.join(
        cat.customer.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        ),
        "user_id",
        "left",
    )
    assert streamed.count() == ev.count() == batch.count()
    s_seg = {
        (r.user_id, r.user_segment)
        for r in streamed.select("user_id", "user_segment").distinct().collect()
    }
    b_seg = {
        (r.user_id, r.c_mktsegment)
        for r in batch.select("user_id", "c_mktsegment").distinct().collect()
    }
    assert s_seg == b_seg


def test_observed_quality_piggybacks_on_single_action(spark, cat, tmp_path):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        fact as fact_mod,
        quality,
    )

    f = fact_mod.build_fact(
        cat.lineitem, cat.orders, cat.customer, cat.supplier, cat.nation
    )
    observed, obs = quality.observed_quality(f)
    # ONE action (the write); metrics ride along with it
    observed.write.mode("overwrite").parquet(str(tmp_path / "fact_out"))
    m = obs.get
    direct = quality.quality_counts(f).head()
    assert m["total_rows"] == direct.total_rows
    assert m["missing_a"] == direct.missing_a
    assert m["missing_b"] == direct.missing_b
    assert m["invalid_range"] == direct.invalid_range


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 tiny files
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    n = io.compact_parquet(spark, path, target_file_mb=128)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert before == 64 and n == 1 and after == 1
    assert spark.read.parquet(path).count() == 10000


def test_foreach_batch_sink_is_idempotent_per_batch(spark, tmp_path):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming.events import (
        run_stream_to_parquet,
    )

    src = f"{SF_DIR}/events.parquet"
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt_fb")
    run_stream_to_parquet(spark, src, out, ckpt)
    n_src = io.load_events(spark, src).count()
    written = spark.read.parquet(out)
    assert written.count() == n_src
    # re-running with the same checkpoint is a no-op (no new batches)
    run_stream_to_parquet(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == n_src


def test_stream_stream_join_matches_batch_interval_join(spark, tmp_path):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming.events import (
        run_stream_stream_join,
    )

    src = f"{SF_DIR}/events.parquet"
    run_stream_stream_join(
        spark, src, str(tmp_path / "ckpt_ssj"), sink_table="ssj_test", within="1 hour"
    )
    streamed = spark.table("ssj_test")
    ev = io.load_events(spark, src)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"), "ts_us"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("p_ts_us"),
    )
    batch = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts_us") > F.col("ts_us"))
        & (F.col("p_ts_us") <= F.col("ts_us") + 3_600_000_000),
    )
    assert streamed.count() == batch.count() > 0
    s_pairs = {
        (r.view_id, r.purchase_id)
        for r in streamed.select("view_id", "purchase_id").collect()
    }
    b_pairs = {
        (r.view_id, r.purchase_id)
        for r in batch.select("view_id", "purchase_id").collect()
    }
    assert s_pairs == b_pairs


def test_resolve_clusters_transitive_chain(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        dedup,
    )

    # chain 1-2-3-4 (never compared 1~4), separate pair 10-11, and a star
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22), (20, 23)],
        "id_a long, id_b long",
    )
    out = {
        r.member_id: r.cluster_id
        for r in dedup.resolve_clusters(pairs).collect()
    }
    assert {k: out[k] for k in (1, 2, 3, 4)} == {1: 1, 2: 1, 3: 1, 4: 1}
    assert out[10] == out[11] == 10
    assert out[20] == out[21] == out[22] == out[23] == 20


def test_resolve_clusters_on_real_near_dups(cat):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        dedup,
    )

    pairs = dedup.embedding_near_dup_pairs(cat.embeddings, threshold=0.35)
    clusters = dedup.resolve_clusters(pairs).collect()
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, set()).add(r.member_id)
    # every cluster id is its own smallest member
    for cid, members in by_cluster.items():
        assert cid == min(members)
    # every paired node appears in exactly one cluster
    n_nodes = len({r.member_id for r in clusters})
    assert sum(len(m) for m in by_cluster.values()) == n_nodes


def test_audio_chunks_fanout_and_bounds(spark):
    docs = spark.createDataFrame(
        # doc_id % 3 == 1 -> audio; 800000 bytes -> 51s -> 2 chunks of 30s
        [(1, "a" * 800000, "en", "s", 800000), (4, "b" * 100, "en", "s", 100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = multimodal.documents_as_media(docs)
    chunks = multimodal.audio_chunks(media, chunk_s=30).collect()
    by_id = {}
    for r in chunks:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 2 and len(by_id[4]) == 1
    c0, c1 = sorted(by_id[1], key=lambda r: r.chunk_idx)
    assert (c0.start_s, c0.end_s) == (0, 30)
    assert (c1.start_s, c1.end_s) == (30, 51)
    assert len({r.chunk_md5 for r in chunks}) == len(chunks)


def test_pandas_cosine_twin_equals_jvm_fold(cat):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        similarity,
    )

    jvm = similarity.ann_cosine_topk(cat.embeddings, n_queries=3, k=5).collect()
    arrow = similarity.ann_cosine_topk_pandas(cat.embeddings, n_queries=3, k=5).collect()
    assert sorted(map(tuple, jvm)) == sorted(map(tuple, arrow))


def test_warehouse_partition_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, 2020 + i % 3, float(i)) for i in range(300)], "id long, year int, v double"
    )
    path = str(tmp_path / "pt")
    df.write.partitionBy("year").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("year") == 2021)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the year predicate must prune at the PARTITION level, not post-scan
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "year" in seg
    assert scan.count() == 100


def test_udtf_chunk_tokens_fanout(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        udtfs,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(70)), "en", "s", 0),
         (2, "only three words", "en", "s", 0),
         (3, None, "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = udtfs.chunk_tokens(docs, chunk_size=32).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.n_tokens for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [32, 32, 6]
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 3
    assert 3 not in by_doc  # null text yields no chunks


def test_event_funnel_is_monotone(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    row = QUERIES["event_funnel"](spark, SF_DIR).head()
    assert row.n_viewed >= row.n_clicked_after_view >= row.n_purchased_after_click >= 0
    if row.n_viewed:
        assert 0.0 <= row.view_to_purchase_rate <= 1.0


def test_reference_zone_lookup_csv_parity(spark):
    """S4 parity against the REFERENCE'S actual lookup file (reference
    data/taxi-zone-lookup.csv, declared at README.md:50): 265 zones,
    LocationID int-typed, both boroughs of the reference's when-chain
    bucketing present."""
    import os

    import pytest as _pytest

    path = "/root/reference/data/taxi-zone-lookup.csv"
    if not os.path.exists(path):
        _pytest.skip("reference checkout not present")
    df = io.read_csv(spark, path)
    assert df.columns == ["LocationID", "Borough", "Zone"]
    assert dict(df.dtypes)["LocationID"] == "int"
    n = df.count()
    assert n == 265
    assert df.filter(F.col("LocationID").isNull()).count() == 0
    boroughs = {r.Borough for r in df.select("Borough").distinct().collect()}
    assert {"Manhattan", "Brooklyn"} <= boroughs


def test_pipeline_cli_single_stage(tmp_path):
    """The per-stage CLI is the reference's per-job spark-submit parity
    surface (SURVEY §3.4) — run one stage in a fresh subprocess the way
    an orchestrator would."""
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans.pipeline",
            "--sf-dir", SF_DIR,
            "--warehouse", str(tmp_path / "wh_cli"),
            "--stage", "ingest",
        ],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=300,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "6000" in proc.stdout.splitlines()[-1]


def test_fact_inline_calendar_equals_date_dim_join(cat):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        fact as fact_mod,
    )

    joined = fact_mod.build_fact(
        cat.lineitem, cat.orders, cat.customer, cat.supplier, cat.nation
    )
    inline = fact_mod.build_fact(
        cat.lineitem, cat.orders, cat.customer, cat.supplier, cat.nation,
        derive_calendar_inline=True,
    )
    assert joined.schema == inline.schema
    assert joined.exceptAll(inline).count() == 0
    assert inline.exceptAll(joined).count() == 0
    # and the fast path's plan really dropped a join
    pj = joined._jdf.queryExecution().executedPlan().toString()
    pi = inline._jdf.queryExecution().executedPlan().toString()
    assert pi.count("BroadcastHashJoin") == pj.count("BroadcastHashJoin") - 1


def test_salted_join_equals_plain_join(spark, cat):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        custom,
    )

    ev = io.load_events(spark, f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    users = cat.customer.select(
        F.col("c_custkey").alias("u_key"), "c_mktsegment"
    )
    salted = custom.salted_join(ev, users, "user_id", "u_key", n_salts=4)
    plain = ev.join(users, ev["user_id"] == users["u_key"]).drop("u_key")
    assert sorted(salted.columns) == sorted(plain.columns)
    cols = sorted(salted.columns)
    assert sorted(map(tuple, salted.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_incremental_partition_refresh_equals_full_recompute(spark, tmp_path):
    """The incremental-ETL contract: when one day's data is restated,
    dynamic-partition overwrite of JUST that day's aggregate equals a full
    recompute — no other partition is touched (their files keep their
    original content)."""
    wh = str(tmp_path / "incr")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS incr_db LOCATION '{wh}'")
    days = [(d, i, float(i * 10)) for d in ("2024-01-01", "2024-01-02") for i in range(5)]
    src = spark.createDataFrame(days, "day string, id int, v double")

    def daily_agg(df):
        return df.groupBy("day").agg(
            F.sum("v").alias("total"), F.count("*").alias("n")
        )

    io.overwrite_table(daily_agg(src), "incr_db.daily", ["day"])

    # restate day 2 (one row dropped) and refresh only that partition
    src2 = src.filter(~((F.col("day") == "2024-01-02") & (F.col("id") == 4)))
    restated = daily_agg(src2.filter(F.col("day") == "2024-01-02"))
    io.overwrite_partitions(restated, "incr_db.daily", ["day"])

    got = {r.day: (r.total, r.n) for r in spark.table("incr_db.daily").collect()}
    want = {r.day: (r.total, r.n) for r in daily_agg(src2).collect()}
    assert got == want
    spark.sql("DROP DATABASE incr_db CASCADE")


def test_rollup_subtotals_are_internally_consistent(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    rows = QUERIES["rollup_revenue"](spark, SF_DIR).collect()
    detail = [r for r in rows if r.l_returnflag is not None and r.l_linestatus is not None]
    flag_subtotals = {
        r.l_returnflag: r
        for r in rows
        if r.l_returnflag is not None and r.l_linestatus is None
    }
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1
    assert grand[0].n_rows == sum(r.n_rows for r in detail)
    for flag, sub in flag_subtotals.items():
        mine = [r for r in detail if r.l_returnflag == flag]
        assert sub.n_rows == sum(r.n_rows for r in mine)
        # exact-decimal sums: subtotal equals the sum of its details exactly
        assert abs(sub.revenue - sum(r.revenue for r in mine)) < 1e-6


def test_entry_contract_stable(spark):
    import __spark_entry__ as e

    a = e.entry(spark)
    b = e.entry(spark)
    assert a.schema == b.schema
    ra, rb = a.collect(), b.collect()
    assert len(ra) == len(rb) > 0
    assert sorted(map(tuple, ra)) == sorted(map(tuple, rb))


def test_minhash_collapse_expands_exact_dup_groups(spark):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import dedup
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = (
        [(i, base, "en", "web", 0) for i in (1, 2, 3)]       # exact-dup group
        + [(10, near, "en", "web", 0), (11, near, "en", "web", 0)]  # second group, near the first
        + [(20, "totally different words with zero overlap here now", "en", "web", 0)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    out = {(r.doc_a, r.doc_b): r.jaccard
           for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # intra-group pairs of both exact-dup groups, jaccard exactly 1.0
    for pair in [(1, 2), (1, 3), (2, 3), (10, 11)]:
        assert out.get(pair) == 1.0, f"missing intra pair {pair}: {out}"
    # cross-group near-dups expand to EVERY member combination
    cross = {p for p in out if p[0] in (1, 2, 3) and p[1] in (10, 11)}
    assert cross == {(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 11)}
    # all six cross pairs carry the identical representative score
    assert len({out[p] for p in cross}) == 1
    assert not any(20 in p for p in out), "unrelated doc must not pair"


def test_embedding_lsh_collapse_mode_expands_dup_groups(spark):
    import random
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import dedup
    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(30)]
    rows = []
    vid = 0
    for vec in base:
        for _ in range(3):            # every vector duplicated 3x
            rows.append((vid, [float(x) for x in vec], "l0"))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    out = dedup.embedding_near_dup_lsh(emb, threshold=0.9, collapse_exact=True).collect()
    pairs = {(r.id_a, r.id_b): r.cosine for r in out}
    # every intra-group pair present at cosine exactly 1.0: groups are
    # {3k, 3k+1, 3k+2}
    for g in range(30):
        a, b, c = 3 * g, 3 * g + 1, 3 * g + 2
        for p in [(a, b), (a, c), (b, c)]:
            assert pairs.get(p) == 1.0, (p, len(pairs))
    # random gaussians are near-orthogonal: no cross-group pair at 0.9
    cross = [p for p in pairs if p[0] // 3 != p[1] // 3]
    assert not cross


def test_tpch_tail_queries_plan_shapes(spark):
    """The six round-2 TPC-H shapes produce the plans we'd want at scale:
    dims broadcast, no cartesian product, Q6's predicates pushed to the
    scan, Q13's order filter preserved under the LEFT join."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )

    for name in [
        "forecast_revenue", "product_type_profit", "customer_distribution",
        "top_supplier", "supplier_part_counts", "promotable_suppliers",
    ]:
        plan = _plan(QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan or name == "top_supplier", name

    q6 = _plan(QUERIES["forecast_revenue"](spark, SF_DIR))
    pushed = q6.split("PushedFilters", 1)[1][:400]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed

    q9 = _plan(QUERIES["product_type_profit"](spark, SF_DIR))
    assert q9.count("BroadcastHashJoin") >= 3  # part, supplier, nation

    # Q13: zero-order customers must survive with c_count = 0
    rows = {r.c_count: r.custdist for r in
            QUERIES["customer_distribution"](spark, SF_DIR).collect()}
    import duckdb
    zero = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{SF_DIR}/customer.parquet') c
            WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{SF_DIR}/orders.parquet') o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority <> '4-NOT SPECIFIED')"""
    ).fetchone()[0]
    assert rows.get(0, 0) == zero


def test_promotable_suppliers_majority_semantics(spark):
    """A supplier qualifies iff it shipped a strict majority of some
    small%-part's 1997 volume — cross-checked row-by-row in pandas."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        QUERIES,
    )
    import duckdb

    got = {r.suppkey for r in
           QUERIES["promotable_suppliers"](spark, SF_DIR).collect()}
    want = {
        r[0]
        for r in duckdb.sql(
            f"""WITH s AS (
                 SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
                 FROM read_parquet('{SF_DIR}/lineitem.parquet')
                 WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'
                   AND l_partkey IN (SELECT p_partkey
                                     FROM read_parquet('{SF_DIR}/part.parquet')
                                     WHERE p_name LIKE 'small%')
                 GROUP BY 1, 2)
               SELECT DISTINCT l_suppkey FROM s
               JOIN (SELECT l_partkey AS pk, sum(q) AS tot FROM s GROUP BY 1)
                 ON l_partkey = pk
               WHERE q > 0.5 * tot"""
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_bm25_ranking_semantics(spark):
    """BM25 orders by tf saturation + length normalization + idf: more
    hits beat fewer, shorter docs beat longer at equal tf, rare terms
    outweigh common ones."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import text as t

    pad = " ".join(["filler"] * 40)
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana", "en", "s", 1),   # heavy on both
            (2, "apple banana", "en", "s", 1),               # short, one each
            (3, "apple banana " + pad, "en", "s", 1),        # same tf, long
            (4, "banana", "en", "s", 1),                     # rare term only
            (5, "apple " + pad, "en", "s", 1),               # common term only
            (6, "cherry " + pad, "en", "s", 1),              # no hit
            (7, "apple cherry cherry banana", "en", "s", 1), # doc1 minus 2 apples
        ] + [(10 + i, "apple " + pad, "en", "s", 1) for i in range(21)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r.bm25 for r in
           t.bm25_topk(docs, ["apple", "banana"], k=30).collect()}
    assert 6 not in out, "doc without any query term must not appear"
    assert out[2] > out[3], "length normalization: shorter doc wins at equal tf"
    # banana appears in 5/28 docs, apple in 26/28: doc4 (rare only) must
    # beat doc5 (common only) despite identical length profile being worse
    assert out[4] > out[5], "idf: rare-term match outweighs common-term match"
    # tf monotonicity must be compared at EQUAL document length: doc1 and
    # doc7 both have dl=4 and one banana; doc1's two extra apples must win.
    # (doc2 — half the length — legitimately outranks doc1: near-saturated
    # common-term tf adds less than the length-norm penalty on banana.)
    assert out[1] > out[7], "higher tf at equal length and idf profile wins"
