"""Text-analysis operators over the documents table: tokenization, quality
scoring, language-ID heuristic, document fingerprinting.

All pure built-in column expressions (split / regexp / higher-order array
functions) — JVM-side, whole-stage-codegen'd, no Python in the hot path.
At 100 TB these are embarrassingly parallel single-pass projections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokens: split on runs of whitespace after trim; empty text → 0 tokens.
PUNCT_CLASS = "[.,;:!?]"
STOPWORDS = ("the", "a", "an", "of", "and", "is", "to", "in")

# marker words per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "les", "et", "des"),
    "de": ("der", "die", "und", "das"),
}
LANG_DEFAULT = "und"


def tokens_col(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def quality_cols(text: Column) -> tuple[Column, Column]:
    """(n_tokens, quality_score) as pure column expressions over ``text`` —
    the single-scan building block shared by text_stats and the curation
    pipeline (identical formulas, so both stay oracle-consistent)."""
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    quality = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return n_tokens.cast("int"), F.round(quality, 2)


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document token count, length, punctuation ratio, stopword ratio,
    and a composite quality score (the length/punct/stopword heuristics a
    pretraining-data pipeline uses for filtering)."""
    toks = tokens_col(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col("text"))
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), PUNCT_CLASS, ""))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    avg_token_len = F.when(
        n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens
    ).otherwise(F.lit(0.0))
    quality = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return documents.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars_actual"),
        n_punct.cast("int").alias("n_punct"),
        n_stop.cast("int").alias("n_stopwords"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(avg_token_len, 4).alias("avg_token_len"),
        F.round(quality, 2).alias("quality_score"),
    )


def adaptive_quality_filter(documents: DataFrame, p: float = 0.25) -> DataFrame:
    """Per-language adaptive quality cut: keep documents whose lexical
    diversity (distinct-token ratio, rounded to the 1e-6 grid) is at or
    above their OWN language's exact ``p``-quantile.

    A fixed global threshold over-prunes whichever language happens to
    tokenize densest; the adaptive form is what multilingual pretraining
    curation actually does. Two passes, both cheap at 100 TB: the
    per-language quantile is a tiny aggregate (n_langs rows) that
    broadcasts back onto the scan — the corpus itself is never shuffled.
    ``percentile`` (exact, linearly interpolated) rather than
    ``percentile_approx``: the threshold is deterministic and
    cross-engine reproducible (DuckDB ``quantile_cont`` interpolates the
    same order statistics), so the filter is oracle-checkable. Scores sit
    on the 1e-6 grid while an interpolated threshold lies strictly
    between adjacent order statistics, so the >= comparison cannot flip
    on ulp-level interpolation differences between engines.
    """
    toks = tokens_col(F.col("text"))
    diversity = F.when(
        F.size(toks) > 0,
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6),
    ).otherwise(F.lit(0.0))
    scored = documents.select(
        "doc_id", "lang", "source", diversity.alias("diversity")
    )
    thresholds = scored.groupBy("lang").agg(
        F.expr(f"percentile(diversity, CAST({p} AS DOUBLE))").alias("__thr")
    )
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .filter(F.col("diversity") >= F.col("__thr"))
        .select("doc_id", "lang", "source", "diversity")
    )


def dedup_rate_report(documents: DataFrame) -> DataFrame:
    """Per-slice duplication report: doc count, distinct-content count
    (md5 of text — the shared cross-engine digest), and the exact-dup
    ratio. The first number a pretraining-data owner asks for per
    (lang, source) slice; one grouped aggregate, uniform digest keys."""
    return (
        documents.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_distinct"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                (F.col("n_docs") - F.col("n_distinct"))
                / F.col("n_docs").cast("double"),
                6,
            ),
        )
    )


# power-of-two token-length buckets for packing planning: integer range
# comparisons only — a float log2 would flip at exact powers of two
# where ln(n)/ln(2) lands an ulp off on one engine
LENGTH_BUCKETS = [(0, 0)] + [(1 << p, (1 << (p + 1)) - 1) for p in range(21)]


def length_histogram(documents: DataFrame) -> DataFrame:
    """Token-length histogram over power-of-two buckets: how many docs
    and tokens land in each [2^p, 2^(p+1)) band — the planning input
    for sequence packing (pick max_seq_len, estimate padding waste).
    One scan, one small grouped aggregate; bucketing is a when-chain of
    INTEGER between comparisons (see LENGTH_BUCKETS note)."""
    n_tokens = F.size(tokens_col(F.col("text")))
    bucket = F.lit(None).cast("long")
    for lo, hi in reversed(LENGTH_BUCKETS):
        bucket = F.when(n_tokens.between(lo, hi), F.lit(lo)).otherwise(bucket)
    return (
        documents.select(bucket.alias("bucket_lo"), n_tokens.alias("n"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
        )
    )


def corpus_report(documents: DataFrame) -> DataFrame:
    """Per-(source, lang) corpus data card: doc counts, token totals,
    exact-dup rate, mean quality, and median length — the summary a
    pretraining-data pipeline publishes per ingest slice.

    ONE corpus scan, one shuffle (the groupBy): every signal is a column
    expression (quality_cols, md5 digest) folded into a single grouped
    aggregate — composing the per-doc operators would scan the corpus
    once per signal. countDistinct and the exact ``percentile`` both
    expand inside the same aggregate; at 100 TB swap ``percentile`` for
    ``approx_percentile`` (fixed-memory GK sketch, same call shape) —
    the exact form is kept here because it is what the DuckDB oracle can
    mirror bit-for-bit. avg quality sums in DECIMAL then divides, the
    cross-engine-exact pattern used everywhere doubles are summed.
    """
    n_tokens, quality = quality_cols(F.col("text"))
    df = documents.select(
        "source",
        "lang",
        n_tokens.alias("n_tokens"),
        quality.alias("quality"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_hash"),
    )
    return (
        df.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("text_hash").alias("distinct_texts"),
            (
                F.sum(F.col("quality").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("_avg_q"),
            F.expr("percentile(n_tokens, 0.5D)").alias("p50_tokens"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "total_tokens",
            "distinct_texts",
            F.round(
                1 - F.col("distinct_texts") / F.col("n_docs"), 6
            ).alias("dup_rate"),
            F.round(F.col("_avg_q"), 4).alias("avg_quality"),
            "p50_tokens",
        )
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Intra-document repetition signals (the Gopher-rule family: a page
    whose content is mostly repeated n-grams is boilerplate/spam however
    good its other stats look):

    - ``distinct_token_ratio`` — |distinct tokens| / |tokens|;
    - ``dup_bigram_frac`` / ``dup_trigram_frac`` — fraction of n-gram
      OCCURRENCES that are repeats of an n-gram already seen in the doc
      (1 - distinct/total);
    - ``top_token_frac`` — occurrences of the doc's most frequent token
      / |tokens| (dominance: 'click click click …').

    Everything but the dominance term is a pure projection over array
    built-ins (no shuffle, scan-local). Dominance needs per-(doc, token)
    counts: one explode + two aggregations, both keyed on doc_id —
    uniform, skew-free, linear at corpus scale.
    """
    toks = tokens_col(F.col("text"))
    base = documents.select("doc_id", "lang", "source", toks.alias("toks"))

    def ngrams(n: int):
        return F.expr(
            f"CASE WHEN size(toks) < {n} THEN CAST(array() AS ARRAY<STRING>) "
            f"ELSE transform(sequence(1, size(toks) - {n - 1}), "
            f"i -> concat_ws(' ', slice(toks, i, {n}))) END"
        )

    def dup_frac(col):
        total = F.size(col)
        return F.when(
            total > 0, (total - F.size(F.array_distinct(col))) / total
        ).otherwise(F.lit(0.0))

    proj = base.select(
        "doc_id",
        "lang",
        "source",
        F.size("toks").cast("int").alias("n_tokens"),
        F.when(
            F.size("toks") > 0, F.size(F.array_distinct("toks")) / F.size("toks")
        )
        .otherwise(F.lit(0.0))
        .alias("distinct_token_ratio"),
        dup_frac(ngrams(2)).alias("dup_bigram_frac"),
        dup_frac(ngrams(3)).alias("dup_trigram_frac"),
    )
    top = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_count"))
    )
    return (
        proj.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            F.round("distinct_token_ratio", 4).alias("distinct_token_ratio"),
            F.round("dup_bigram_frac", 4).alias("dup_bigram_frac"),
            F.round("dup_trigram_frac", 4).alias("dup_trigram_frac"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce("top_count", F.lit(0)) / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("top_token_frac"),
        )
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: count marker-word hits per language, predict
    the argmax (ties broken by fixed language order), 'und' when no hits."""
    toks = tokens_col(F.lower(F.col("text")))
    df = documents.select("doc_id", "lang", toks.alias("toks"))
    for code, markers in LANG_MARKERS.items():
        in_list = ", ".join(f"'{m}'" for m in markers)
        df = df.withColumn(
            f"hits_{code}", F.expr(f"size(filter(toks, x -> x IN ({in_list})))")
        )
    best = F.greatest(*[F.col(f"hits_{c}") for c in LANG_MARKERS])
    # when-chain in declared order: first language matching the max wins ties
    expr = None
    for code in LANG_MARKERS:
        cond = (best > 0) & (F.col(f"hits_{code}") == best)
        expr = F.when(cond, code) if expr is None else expr.when(cond, code)
    pred = expr.otherwise(F.lit(LANG_DEFAULT))
    return df.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.col(f"hits_{c}").cast("int").alias(f"hits_{c}") for c in LANG_MARKERS],
        pred.alias("predicted_lang"),
    )


def doc_fingerprint(documents: DataFrame, k: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: minimum hash over all character k-grams
    (md5 hex compared lexicographically — engine-portable, deterministic).
    One projection, no shuffle; the fingerprint is a join/dedup key."""
    # substring with a dynamic start needs expr-form (positional substring)
    fp = F.expr(
        f"array_min(transform(sequence(1, greatest(length(text) - {k - 1}, 1)), "
        f"i -> md5(substring(text, i, {k}))))"
    )
    return documents.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars_actual"),
        fp.alias("fingerprint"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("full_hash"),
    )


# PII patterns restricted to the Java-regex ∩ RE2 subset (no lookarounds)
# so the Spark operator and the SQL oracle redact identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"


def redact_pii(documents: DataFrame) -> DataFrame:
    """PII scrubbing for training corpora: replace emails and phone-like
    digit runs with typed placeholder tokens, and count what was removed
    (the redaction-rate signal a pipeline monitors for drift).

    Emails redact FIRST so the phone pattern can't fire on digits inside
    an address. Pure JVM regexp projections — single pass, no shuffle,
    embarrassingly parallel at any scale."""
    n_emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), 0))
    no_email = F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>")
    n_phones = F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), 0))
    redacted = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    return documents.select(
        "doc_id",
        "lang",
        "source",
        redacted.alias("text_redacted"),
        n_emails.cast("int").alias("n_emails"),
        n_phones.cast("int").alias("n_phones"),
        (n_emails + n_phones > 0).alias("had_pii"),
    )


# BPE-ish pre-tokenizer: letter runs, digit groups of <=3 (as modern BPE
# vocabularies split numbers), and single non-alnum symbols. Restricted to
# a regex subset that Java (Spark) and RE2 (DuckDB/oracle) treat
# identically — no lookarounds, no \p classes.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def bpe_token_counts(documents: DataFrame) -> DataFrame:
    """Token accounting for pretraining-data budgeting: whitespace tokens,
    BPE-ish pre-tokens (:data:`BPE_TOKEN_RE`), and chars-per-token — the
    compression-rate proxy used to estimate token cost per document.
    Single-pass projection, no shuffle; the regex runs in the JVM
    (regexp_extract_all), not in Python."""
    toks = tokens_col(F.col("text"))
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), 0)
    n_bpe = F.size(bpe)
    n_chars = F.length(F.col("text"))
    return documents.select(
        "doc_id",
        "lang",
        F.size(toks).cast("int").alias("n_ws_tokens"),
        n_bpe.cast("int").alias("n_bpe_tokens"),
        F.round(
            F.when(n_bpe > 0, n_chars.cast("double") / n_bpe).otherwise(F.lit(0.0)), 4
        ).alias("chars_per_token"),
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` documents for a bag of query
    terms (Robertson/Spärck Jones probabilistic relevance; the lexical
    side of a hybrid retrieval stack next to the ANN operators).

    Scale shape: each doc's token array is pruned to the query terms
    BEFORE the explode, so the postings shuffle carries only matching
    (doc_id, term) rows — the classic inverted-index posting list, built
    lazily per query instead of materialized.  Per-term document
    frequencies are a tiny aggregate (≤ |query| rows) and broadcast; the
    corpus stats (N, avgdl) are a one-row broadcast.  Final ranking is
    orderBy+limit → TakeOrderedAndProject, never a global sort.

    Determinism: avgdl = exact long sum / count; per-term contributions
    are identical IEEE expressions in both engines (same parenthesization,
    same libm) summed on a DECIMAL(18,8) grid so partition order can't
    reorder double additions.
    """
    toks = tokens_col(F.col("text"))
    docs = documents.select(
        "doc_id",
        F.size(toks).alias("dl"),
        F.filter(toks, lambda x: x.isin(*query_terms)).alias("qtoks"),
    )
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum(F.col("dl").cast("long")).cast("double") / F.count("*")).alias(
            "avgdl"
        ),
    )
    tf = (
        docs.filter(F.size("qtoks") > 0)
        .select("doc_id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df_t"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(contrib.cast("decimal(18,8)")).cast("double").alias("bm25"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


def top_terms(documents: DataFrame, k: int = 25) -> DataFrame:
    """Exact corpus-wide heavy hitters: the k most frequent tokens with
    their counts, tie-broken on the term so the set is deterministic.

    Plan: explode → partial count (map-side combine absorbs each
    partition's repeats, so the shuffle carries one row per distinct term
    per partition, not one per token) → final count → TakeOrderedAndProject.
    This is the exact baseline :func:`approx_top_terms` is bounded against.
    """
    return (
        documents.select(F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(k)
    )


def approx_top_terms(documents: DataFrame, k: int = 25, capacity: int = 4096) -> DataFrame:
    """Approximate heavy hitters via Misra-Gries summaries (public
    algorithm: Misra & Gries 1982; merge step per Agarwal et al. 2012,
    "Mergeable Summaries").

    Each partition folds its tokens into a ``capacity``-counter summary
    inside one Arrow-batched pass (mapInPandas); summaries — at most
    ``capacity`` rows each, regardless of data size — are then merged by
    summing per-term lower bounds and re-truncating globally. Guarantee
    carried by the merged summary: every term with true frequency
    > n/capacity survives, and each reported count undercounts by at most
    n/capacity (asserted against :func:`top_terms` in tests). The shuffle
    moves O(partitions × capacity) rows — constant in corpus size, which
    is the whole point at 100 TB where the exact path's shuffle is
    O(distinct terms).
    """
    def mg_partition(batches):
        # self-contained closure: workers don't share the driver's sys.path
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["term"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"term": list(counters), "n": list(counters.values())})

    # tokenize in the JVM with the SAME tokens_col the exact top_terms
    # uses (one definition, no silent drift between the bounded pair);
    # explode is partition-preserving, so the MG summaries still see
    # whole partitions and the O(partitions × capacity) shuffle bound
    # holds unchanged
    terms = documents.select(F.explode(tokens_col(F.col("text"))).alias("term"))
    summaries = terms.mapInPandas(mg_partition, "term string, n long")
    # merging = summing per-partition counter lower bounds; the undercount
    # bound is additive across partitions (mergeable-summaries property)
    return (
        summaries.groupBy("term")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(k)
    )


def cms_heavy_hitters(
    documents: DataFrame, depth: int = 4, width: int = 1024, k: int = 50
) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005) —
    the third member of the heavy-hitter family and, like
    :func:`~..aggregates.kmv_distinct`, a CROSS-ENGINE-EXACT sketch:
    every counter is a pure function of md5, so DuckDB rebuilds the
    identical sketch and the driver hash-checks an approximate algorithm
    exactly (where Misra-Gries' :func:`approx_top_terms` is
    partitioning-dependent and only bounds-testable).

    Sketch: ``depth`` hash rows x ``width`` cells; token t increments
    cell (r, md5(r:t) mod width) in every row; est(t) = min over rows of
    its cells. Guarantees: est >= true count always (counters only ever
    over-count), and est <= true + e*N/width with prob 1-exp(-depth)
    (N = total tokens) — both asserted in tests.

    Scale shape (round-7 restructure): the raw token stream shuffles
    exactly ONCE — a plain term-frequency aggregate (map-side combine to
    per-partition vocabularies) — and everything sketch-shaped happens
    on the VOCABULARY-sized (term, tf) relation: cells increment by tf
    (identical counters — a cell's count is the token total of the terms
    hashing into it, whether added 1-at-a-time or tf-at-a-time), the
    estimate join needs no distinct (one row per (term, r) by
    construction), and the finished sketch stays a <= depth*width-row
    relation — fixed memory regardless of corpus size, the whole point
    at 100 TB. The previous form exploded the corpus token stream
    ×depth through TWO branches (sketch + vocabulary distinct);
    corpora multiply tokens, not vocabulary (Heaps' law), so the
    tf-first form is the one whose decade cost tracks the scan.
    Mergeable by construction: counters are sums, so sketches of two
    corpora add cell-wise.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{r}:"), F.col("term"))), 1, 8
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                    F.lit(width),
                ).alias("cell"),
            )
            for r in range(depth)
        ]
    )
    tf = (
        documents.select(F.explode(tokens_col(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hashed = tf.withColumn("rc", F.explode(cells)).select(
        "term", "tf", "rc.r", "rc.cell"
    )
    sketch = hashed.groupBy("r", "cell").agg(F.sum("tf").alias("cnt"))
    return (
        hashed.join(F.broadcast(sketch), ["r", "cell"])
        .groupBy("term")
        .agg(F.min("cnt").alias("cms_count"))
        .orderBy(F.desc("cms_count"), "term")
        .limit(k)
    )
