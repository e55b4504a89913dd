"""Round-12 optimization equivalence tests.

Every optimization that changed an operator's internals keeps a test
proving the rewrite is output-identical to the reference form:

- ``simhash_signatures`` (Arrow-batched numpy vote fold + raw-text
  prefilter) must be BIT-identical to the interpreted-HOF
  ``with_simhash(...).filter(simhash.isNotNull())`` it replaced inside
  ``simhash_near_pairs``.
- ``_nonempty_text`` (raw-text prefilter) must keep exactly the rows
  whose MinHash signature is non-NULL — including the NULL-text row,
  which shingles to [''] and carries a REAL signature.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    dedup,
)

EDGE_ROWS = [
    (1, "hello world foo bar"),
    (2, None),
    (3, "   "),
    (4, ""),
    (5, "x"),
    (6, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    (7, "  padded   spaces\tand\ttabs  "),
    (8, "ünïcödé tökens ß ∆"),
    (9, "dup dup dup dup dup"),
    (10, "one-token"),
]


@pytest.fixture(scope="module")
def edge_docs(spark):
    return spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")


def test_simhash_signatures_bit_identical_edge(edge_docs):
    old = (
        dedup.with_simhash(edge_docs)
        .filter(F.col("simhash").isNotNull())
        .select("doc_id", F.col("simhash").alias("old"))
    )
    new = dedup.simhash_signatures(edge_docs).withColumnRenamed("simhash", "new")
    joined = old.join(new, "doc_id", "full")
    rows = joined.collect()
    assert len(rows) == old.count() == new.count()
    for r in rows:
        assert r.old is not None and r.new is not None, r
        assert r.old == r.new, r


def test_simhash_signatures_bit_identical_corpus(cat):
    docs = cat.documents
    reps, memb = dedup._collapse_exact_dups(docs)
    old = (
        dedup.with_simhash(reps)
        .filter(F.col("simhash").isNotNull())
        .select("doc_id", F.col("simhash").alias("old"))
    )
    new = dedup.simhash_signatures(reps).withColumnRenamed("simhash", "new")
    joined = old.join(new, "doc_id", "full")
    n_old = old.count()
    bad = joined.filter(
        F.col("old").isNull() | F.col("new").isNull() | (F.col("old") != F.col("new"))
    ).count()
    memb.unpersist()
    assert n_old > 0
    assert bad == 0


def test_nonempty_text_matches_minhash_isnotnull(edge_docs):
    old = (
        dedup.with_minhash(edge_docs)
        .filter(F.col("minhash").isNotNull())
        .select("doc_id", F.col("minhash").alias("old"))
    )
    new = dedup.with_minhash(dedup._nonempty_text(edge_docs)).select(
        "doc_id", F.col("minhash").alias("new")
    )
    joined = old.join(new, "doc_id", "full").collect()
    assert len(joined) == old.count() == new.count()
    for r in joined:
        assert r.old is not None and r.new is not None, r
        assert r.old == r.new, r
    # the NULL-text row must be KEPT (shingles to [''] — a real signature)
    kept = {r.doc_id for r in new.select("doc_id").collect()}
    assert 2 in kept and 3 not in kept and 4 not in kept


def test_user_median_vectorized_matches_grouped_map(spark, cat):
    """user_median_value's batched mapInPandas must equal the per-group
    applyInPandas it replaced — including NULL user_id (its own group),
    NULL values (skipped by median, counted by n_events), and groups
    split across Arrow batch boundaries (forced 7-row batches)."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        custom,
    )

    def old_form(events):
        def _median(pdf):
            import pandas as _pd

            return _pd.DataFrame(
                {
                    "user_id": [pdf["user_id"].iloc[0]],
                    "n_events": [len(pdf)],
                    "median_value": [float(pdf["value"].median())],
                }
            )

        return (
            events.select("user_id", "value")
            .groupBy("user_id")
            .applyInPandas(_median, schema=custom.MEDIAN_SCHEMA)
        )

    rows = []
    for uid in [None, 1, 2, 3]:
        for i in range(23):
            rows.append((uid, float(i) if i % 5 else None))
    syn = spark.createDataFrame(rows, "user_id long, value double")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", 7)
    try:
        old = {
            (r.user_id): (r.n_events, r.median_value)
            for r in old_form(syn).collect()
        }
        new = {
            (r.user_id): (r.n_events, r.median_value)
            for r in custom.user_median_value(syn).collect()
        }
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert old == new and len(new) == 4

    ev = cat.events
    old = old_form(ev)
    new = custom.user_median_value(ev)
    assert old.count() == new.count()
    from pyspark.sql import functions as F

    j = (
        old.withColumnRenamed("n_events", "na").withColumnRenamed("median_value", "ma")
        .join(
            new.withColumnRenamed("n_events", "nb").withColumnRenamed(
                "median_value", "mb"
            ),
            "user_id",
            "full",
        )
    )
    assert (
        j.filter(
            F.col("na").isNull()
            | F.col("nb").isNull()
            | (F.col("na") != F.col("nb"))
            | (F.col("ma") != F.col("mb"))
        ).count()
        == 0
    )
