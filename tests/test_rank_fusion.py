"""Borda rank-fusion curation: fusion math against a pandas recompute,
per-slice caps, partition invariance, and the one-Exchange window plan."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    curation,
)


def test_rank_fusion_matches_pandas_recompute_and_caps_slices(spark, cat):
    out = curation.rank_fusion_curation(cat.documents, cat.embeddings).toPandas()
    # every slice emits at most 25 rows and ranks are within-slice valid
    for (_, _), g in out.groupby(["lang", "source"]):
        assert len(g) <= 25
        assert g.borda.tolist() == (g.r_cls + g.r_ppl + g.r_q).tolist()
        for col in ["r_cls", "r_ppl", "r_q"]:
            assert g[col].min() >= 1
    # uncapped run = every fully-signaled doc, with per-slice rank sets
    # that are exact permutations of 1..slice_size
    full = curation.rank_fusion_curation(
        cat.documents, cat.embeddings, per_group=10**9
    ).toPandas()
    for (_, _), g in full.groupby(["lang", "source"]):
        n = len(g)
        for col in ["r_cls", "r_ppl", "r_q"]:
            assert sorted(g[col]) == list(range(1, n + 1))
    # the capped output is exactly the borda-smallest 25 (doc_id ties)
    # of the uncapped ranking, slice by slice
    for key, g in full.groupby(["lang", "source"]):
        want = g.sort_values(["borda", "doc_id"]).head(25)["doc_id"].tolist()
        got = out[(out.lang == key[0]) & (out.source == key[1])]
        got = got.sort_values(["borda", "doc_id"])["doc_id"].tolist()
        assert got == want


def test_rank_fusion_is_partition_invariant(spark, cat):
    a = curation.rank_fusion_curation(cat.documents, cat.embeddings).collect()
    b = curation.rank_fusion_curation(
        cat.documents.repartition(13), cat.embeddings.repartition(5)
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rank_fusion_cached_is_bit_equal_to_fused(spark, cat, tmp_path):
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        classify,
        lm,
    )

    cls_root = classify.model_build(cat.embeddings, str(tmp_path / "cls"))
    lm_root = lm.lm_build(cat.documents, str(tmp_path / "lm"))
    fused = curation.rank_fusion_curation(cat.documents, cat.embeddings).collect()
    cached = curation.rank_fusion_cached(
        cat.documents, cat.embeddings, cls_root, lm_root
    ).collect()
    assert sorted(map(tuple, fused)) == sorted(map(tuple, cached))


def test_rank_fusion_windows_share_one_exchange(spark, cat):
    df = curation.rank_fusion_curation(cat.documents, cat.embeddings)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # all four row_number windows (3 signal ranks + the top-k) must sit
    # above a single (lang, source) exchange — fusion adds ONE shuffle
    assert len(re.findall(r"Exchange hashpartitioning\(lang", plan)) == 1
    # and Spark should push the per-slice top-k into the window sort
    assert "WindowGroupLimit" in plan
