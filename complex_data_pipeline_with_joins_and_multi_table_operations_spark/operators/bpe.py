"""Distributed BPE tokenizer training (Sennrich et al. 2016, public
algorithm) — the missing half of the token-accounting surface: where
``text.bpe_token_counts`` counts pre-tokens under a FIXED regex, this
module LEARNS the subword vocabulary from the corpus itself, the way a
real pretraining pipeline does before any token budget can be priced.

Scale shape (the kmeans/classifier discipline applied to tokenizer
training):

- ONE corpus scan collapses the corpus to its distinct-word frequency
  table — vocabulary-sized, millions of rows at 100 TB where the corpus
  is billions of documents.  Every subsequent round runs over that
  relation, never the corpus.
- Each merge round is a pair-count partial aggregate over the word
  table (map-side combine; the shuffle carries distinct symbol pairs,
  not word occurrences) plus a TakeOrdered(1) argmax — the chosen merge
  is driver-side metadata, exactly like k-means centroids between
  Lloyd's iterations.  No vector/corpus data ever reaches the driver.
- Applying a merge is a scan-local literal string replace on the
  symbol column; round r's symbols are r nested replaces over the
  persisted base — no shuffle.

Determinism / oracle: pair counts are exact integer sums; the argmax
tie-break is (count DESC, left ASC, right ASC) under binary string
ordering, identical in the JVM and DuckDB; symbol strings use literal
leftmost-non-overlapping ``replace`` which Java ``String.replace``,
DuckDB ``replace()`` and Python ``str.replace`` all implement
identically (asserted against a pure-Python reference in tests,
including hypothesis-random corpora).  The whole k-round trajectory is
therefore bit-deterministic and the DuckDB oracle unrolls it round by
round (``plans/registry.py::_bpe_sql``).

Merge-application spec — one documented deviation from Sennrich's
symbol-LIST formulation: on back-to-back occurrences of the winning
pair inside one word (``a b a b``), the space-delimited replace merges
only the FIRST occurrence that round (the shared middle space is
consumed by the match), where the list form merges both.  The leftover
pair keeps counting in later rounds and merges if (a, b) wins again.
This is the price of a merge step that is a single scan-local
codegen'd ``replace`` on every engine rather than an interpreted
per-word fold; counts, argmax, and the oracle all share the exact same
spec, so correctness is unaffected — only the (rare: a repeated-pair
word) learned-rule sequence differs from a list-based trainer's.

Words are lowercased whitespace tokens restricted to ``^[a-z]+$`` —
the alphabetic core an LLM tokenizer spends its merges on — which also
pins the char-split to ASCII where both engines agree byte-for-byte.
The end-of-word marker ``</w>`` is the classic Sennrich formulation:
merges never cross word boundaries, and a word-final subword is a
distinct symbol from the same subword mid-word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_RE = "^[a-z]+$"
EOW = "</w>"


def word_freqs(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the distinct-word frequency table — the one corpus
    scan of the whole training procedure."""
    from .text import tokens_col

    return (
        documents.select(
            F.explode(tokens_col(F.col(text_col))).alias("tok")
        )
        .select(F.lower("tok").alias("word"))
        .filter(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _base_symbols(wf: DataFrame) -> DataFrame:
    """(word, freq, sym): each word as a space-padded char-symbol string
    ``' l o w </w> '`` — the representation every merge round rewrites
    with one literal replace."""
    sym = F.concat(
        F.lit(" "),
        F.regexp_replace("word", "(.)", "$1 "),
        F.lit(EOW + " "),
    )
    return wf.select("word", "freq", sym.alias("sym"))


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair frequencies, weighted by word
    frequency.  Overlapping occurrences count once per position — the
    canonical BPE statistic."""
    syms = F.split(F.trim("sym"), " ")
    pairs = F.arrays_zip(
        F.slice(syms, 1, F.size(syms) - 1).alias("a"),
        F.slice(syms, 2, F.size(syms) - 1).alias("b"),
    )
    return (
        symbols.select("freq", F.explode(pairs).alias("pr"))
        .select("freq", F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(documents: DataFrame, merges: int = 8) -> DataFrame:
    """Learn ``merges`` BPE merge rules from the corpus; returns the
    merge table ``(step, lhs, rhs, merged, freq)`` — step is 1-based
    rule order (rules must be applied in this order), freq the pair
    count that won the round.  Stops early if the corpus runs out of
    repeated pairs (never at any realistic scale)."""
    spark = documents.sparkSession
    wf = word_freqs(documents)
    base = _base_symbols(wf).persist()
    rows: list[tuple] = []
    try:
        cur = base
        for step in range(1, merges + 1):
            best = (
                _pair_counts(cur)
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < 2:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            rows.append((step, a, b, a + b, cnt))
            cur = cur.withColumn(
                "sym",
                F.replace(
                    F.col("sym"), F.lit(f" {a} {b} "), F.lit(f" {a + b} ")
                ),
            )
    finally:
        base.unpersist()
    return spark.createDataFrame(
        rows, "step int, lhs string, rhs string, merged string, freq bigint"
    )


def apply_merges(symbols: DataFrame, merge_rows: list) -> DataFrame:
    """Rewrite the symbol column under an ordered merge-rule list
    (driver-side metadata — ``bpe_train``'s output collected, or a
    persisted model table read back).  k literal replaces, scan-local."""
    cur = symbols
    for r in sorted(merge_rows, key=lambda r: r["step"]):
        cur = cur.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f" {r['lhs']} {r['rhs']} "),
                F.lit(f" {r['merged']} "),
            ),
        )
    return cur


def bpe_build(documents: DataFrame, root: str, merges: int = 8) -> str:
    """Train-once half of the production split (the model_build /
    lm_build / pq_index_build pattern): persist the ordered merge table
    as a transaction-log table — a versioned tokenizer registry, the
    artifact every downstream token count, budget cut and packing run
    must agree on.  Retraining after a corpus append commits a new
    snapshot; ``versionAsOf`` pins old tokenizations — exactly the
    reproducibility contract a real pretraining pipeline needs from its
    tokenizer.  Returns the model table path."""
    from ..sources.txlog import TableLog

    TableLog(documents.sparkSession, root).write(
        bpe_train(documents, merges=merges), mode="overwrite"
    )
    return root


def subword_counts_cached(documents: DataFrame, root: str) -> DataFrame:
    """Apply-many half: read the persisted merge rules back (strings and
    integers round-trip parquet exactly, so the rewrite is bit-equal to
    the fused form — asserted in tests) and count without retraining."""
    from ..sources.txlog import TableLog

    merge_rows = TableLog(documents.sparkSession, root).read().collect()
    return _subword_counts(documents, merge_rows)


def bpe_subword_counts(
    documents: DataFrame, merges: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_words, n_subwords): per-document token accounting
    under the corpus-trained BPE vocabulary — the price a training run
    actually pays per document, vs the fixed-regex estimate of
    ``bpe_token_counts``.  Train (see :func:`bpe_train`), broadcast the
    per-word subword length (vocabulary-sized), and aggregate per
    document; only ``^[a-z]+$`` words are counted, mirroring training.
    """
    merge_rows = bpe_train(documents, merges=merges).collect()
    return _subword_counts(documents, merge_rows, id_col=id_col)


def _subword_counts(
    documents: DataFrame, merge_rows: list, id_col: str = "doc_id"
) -> DataFrame:
    wf = word_freqs(documents)
    lens = apply_merges(_base_symbols(wf), merge_rows).select(
        "word", F.size(F.split(F.trim("sym"), " ")).alias("n_sub")
    )
    from .text import tokens_col

    words = (
        documents.select(id_col, F.explode(tokens_col(F.col("text"))).alias("tok"))
        .select(id_col, F.lower("tok").alias("word"))
        .filter(F.col("word").rlike(WORD_RE))
    )
    return (
        words.join(F.broadcast(lens), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )
