"""Similarity search over an embedding column (array<float>).

Two paths, as a training-data pipeline needs at 100 TB:

- :func:`ann_cosine_topk` — brute-force cosine top-k: the QUERY set is
  broadcast (it's small by definition), the corpus streams through one
  scan; per-partition the join is query×batch, and TakeOrderedAndProject
  keeps only k rows per query. Exact baseline; O(|corpus|·|queries|·dim).
- :func:`ann_lsh_topk` — random-hyperplane LSH: 1-bit-per-plane signatures,
  banded into bucket keys; candidates share a bucket in ≥1 band, cosine is
  evaluated only within buckets. The scale path: shuffle on bucket keys
  instead of a cross product.

Vector math uses built-in higher-order functions on double arrays
(zip_with + aggregate) — stays in the JVM, no UDF serialization. For very
wide vectors a pandas_udf dot product can beat the fold; at dim=64 the
built-in wins by avoiding Arrow round-trips.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# cosine(a, b) as a parameterized template (NOT substring-rewritten SQL —
# building from the template keeps any column name safe, including ones
# that contain 'cv'/'qv' as substrings). nullif-guarded denominator: a
# zero vector yields NULL (cosine undefined) instead of an ANSI
# DIVIDE_BY_ZERO error — NULL then fails any >= threshold filter, which
# is the semantics we want.
COS_TEMPLATE = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, v) -> s + v) "
    "/ nullif(sqrt(aggregate(transform({a}, x -> x * x), CAST(0.0 AS DOUBLE), (s, v) -> s + v)) "
    " * sqrt(aggregate(transform({b}, x -> x * x), CAST(0.0 AS DOUBLE), (s, v) -> s + v)), 0.0)"
)


def cos_expr(a: str, b: str) -> str:
    """Cosine-similarity SQL between two array<double> columns."""
    return COS_TEMPLATE.format(a=a, b=b)


COS_EXPR = cos_expr("qv", "cv")


def _as_double(df: DataFrame, src: str, dst: str) -> DataFrame:
    return df.withColumn(dst, F.col(src).cast("array<double>"))


def ann_cosine_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k.

    Query set = the first ``n_queries`` vec_ids (deterministic); broadcast
    against the full corpus; rank per query with a row_number window after
    rounding the similarity (rounding pins a canonical value so ranking is
    engine-reproducible; ties break on candidate id).
    """
    corpus = _as_double(embeddings, "embedding", "cv").select(
        F.col("vec_id").alias("c_id"), "cv", F.col("label").alias("c_label")
    )
    queries = _as_double(embeddings, "embedding", "qv").select(
        F.col("vec_id").alias("q_id"), "qv"
    ).filter(F.col("q_id") < n_queries)

    scored = (
        corpus.join(F.broadcast(queries), F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", F.round(F.expr(COS_EXPR), 6))
        .select("q_id", "c_id", "c_label", "cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "c_label", "cosine", "rank")
    )


def _anchor_scored(
    embeddings: DataFrame, n_anchors: int
) -> DataFrame:
    """Shared scored relation for the contrastive-mining operators: every
    (anchor, candidate) cosine for the first ``n_anchors`` vec_ids, with
    both labels. Anchors broadcast (small by definition); the corpus
    streams through one scan — the same shape as :func:`ann_cosine_topk`,
    so the documented LSH/IVF bucketed paths are the drop-in scale
    replacement when the anchor set grows (the label predicate composes
    with any candidate generation: it filters within buckets)."""
    corpus = _as_double(embeddings, "embedding", "cv").select(
        F.col("vec_id").alias("c_id"), "cv", F.col("label").alias("c_label")
    )
    anchors = _as_double(embeddings, "embedding", "qv").select(
        F.col("vec_id").alias("a_id"), "qv", F.col("label").alias("a_label")
    ).filter(F.col("a_id") < n_anchors)
    return (
        corpus.join(F.broadcast(anchors), F.col("c_id") != F.col("a_id"))
        .withColumn("cosine", F.round(F.expr(COS_EXPR), 6))
        .select("a_id", "a_label", "c_id", "c_label", "cosine")
    )


def hard_negatives(
    embeddings: DataFrame, n_anchors: int = 8, k: int = 5
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-``k`` most-similar vectors with a DIFFERENT label — the
    wrong-label examples an embedding model confuses most, the standard
    negative pool for InfoNCE/triplet fine-tuning. Exact brute-force
    baseline (rounded cosine pins a canonical rank; ties break on
    candidate id); at corpus scale the candidate generation swaps for
    the banded LSH / IVF cell paths above."""
    from pyspark.sql import Window

    w = Window.partitionBy("a_id").orderBy(F.desc("cosine"), "c_id")
    return (
        _anchor_scored(embeddings, n_anchors)
        .filter(F.col("c_label") != F.col("a_label"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("a_id", "a_label", "c_id", "c_label", "cosine", "rank")
    )


def triplet_mining(embeddings: DataFrame, n_anchors: int = 16) -> DataFrame:
    """Batch-hard triplet mining (FaceNet recipe): per anchor, the
    hardest POSITIVE (same label, LOWEST cosine — the most-spread
    same-class example) and the hardest NEGATIVE (different label,
    HIGHEST cosine), plus the triplet margin ``pos_cos - neg_cos``
    (negative margin = the anchor violates the triplet constraint and
    actually teaches the model something). One scored relation feeds
    both window ranks; anchors without any same-label candidate drop
    (no triplet exists). NULL placement is EXPLICIT: zero-norm
    candidates (NULL cosine via the nullif-guarded denominator) rank
    LAST on both sides via asc_nulls_last — Spark's bare asc() is NULLS
    FIRST while the SQL oracle's ASC/DESC default NULLS LAST, so an
    implicit ordering would crown a nonexistent similarity the rank-1
    "hardest" example on the Spark side only. (A filter would read the
    same, but Catalyst collapses it into the projection and evaluates
    the cosine fold twice per row — measured 2x on the bench.)"""
    from pyspark.sql import Window

    # ONE scoring pass feeds both sides (the two-branch-plus-join form
    # recomputed the broadcast-anchor scoring once per branch — measured
    # 2x at sf10): same-/different-label rows rank inside one window
    # partitioned by (anchor, side), ordered so r=1 is the hardest
    # positive (LOWEST cosine) or hardest negative (HIGHEST cosine —
    # negation is an exact sign flip, so asc(-cosine) IS desc(cosine));
    # a pivot aggregate then replaces the self-join. Output rows are
    # identical to the two-branch form (equality-tested).
    scored = _anchor_scored(embeddings, n_anchors).withColumn(
        "is_pos", F.col("c_label") == F.col("a_label")
    )
    w = Window.partitionBy("a_id", "is_pos").orderBy(
        F.asc_nulls_last(
            F.when(F.col("is_pos"), F.col("cosine")).otherwise(-F.col("cosine"))
        ),
        "c_id",
    )
    best = scored.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") == 1
    )
    side = lambda flag, col: F.max(F.when(F.col("is_pos") == flag, F.col(col)))
    return (
        best.groupBy("a_id", "a_label")
        .agg(
            side(True, "c_id").alias("pos_id"),
            side(True, "cosine").alias("pos_cos"),
            side(False, "c_id").alias("neg_id"),
            side(False, "cosine").alias("neg_cos"),
        )
        .filter(F.col("pos_id").isNotNull() & F.col("neg_id").isNotNull())
        .select(
            "a_id",
            "a_label",
            "pos_id",
            "pos_cos",
            "neg_id",
            "neg_cos",
            F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
        )
    )


def int8_quantize(embeddings: DataFrame) -> DataFrame:
    """Per-vector asymmetric int8 quantization (the storage/serving
    compression step for an embedding corpus — 4× smaller than float32
    before PQ): codes = floor((x - min) * 255 / (max - min) + 0.5),
    range [0, 255]. Scan-local per-row arithmetic, no shuffle.

    Cross-engine determinism: floor(t + 0.5) IS half-up rounding spelled
    in primitives both engines evaluate bit-identically on the same
    doubles (float32 inputs widen exactly; one multiply, one divide —
    no reassociation), unlike round() whose half-way rule differs
    between engines. A constant vector has no range — its scale nullifs
    to NULL and the codes follow (quantization undefined), instead of a
    divide-by-zero error. Output keeps integer-exact digests of the code
    array (sum/min/max) plus the dequantization parameters."""
    df = _as_double(embeddings, "embedding", "ev")
    codes = (
        "transform(ev, x -> CAST(floor((x - array_min(ev)) * 255.0 "
        "/ nullif(array_max(ev) - array_min(ev), 0.0) + 0.5) AS INT))"
    )
    return df.select(
        "vec_id",
        "label",
        F.round(F.expr("array_min(ev)"), 6).alias("zero_point"),
        F.round(F.expr("nullif(array_max(ev) - array_min(ev), 0.0) / 255.0"), 9).alias("scale"),
        F.expr(
            f"aggregate({codes}, CAST(0 AS BIGINT), (s, c) -> s + c)"
        ).alias("code_sum"),
        F.expr(f"array_min({codes})").alias("code_min"),
        F.expr(f"array_max({codes})").alias("code_max"),
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid components via posexplode → grouped exact mean.

    The vector unrolls to (label, pos, component) rows; the mean per
    (label, pos) uses the exact-decimal pattern (floats pass through
    double → DECIMAL(28,12) — a deterministic rounding far below float
    precision — so the sum is engine- and order-exact). At scale this is
    one shuffle keyed (label, pos): perfectly uniform, dim-way parallel.
    """
    ex = _as_double(embeddings, "embedding", "ev").select(
        "label", F.posexplode("ev").alias("pos0", "e")
    )
    return (
        ex.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("e").cast("decimal(28,12)")).cast("double") / F.count("*")
            ).alias("centroid_val"),
        )
    )


def vector_norms(embeddings: DataFrame) -> DataFrame:
    """Per-vector diagnostics: dimension, L2 norm, max |component| —
    single-pass higher-order folds, no shuffle."""
    df = _as_double(embeddings, "embedding", "ev")
    sumsq = "aggregate(transform(ev, x -> x * x), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    return df.select(
        "vec_id",
        "label",
        F.size("ev").alias("dim"),
        F.round(F.expr(f"sqrt({sumsq})"), 6).alias("l2_norm"),
        F.round(F.expr("array_max(transform(ev, x -> abs(x)))"), 6).alias("max_abs"),
    )


def vector_spike_outliers(embeddings: DataFrame) -> DataFrame:
    """Tukey-fence outliers on the dominant-component magnitude
    (max |x_i|) — the embedding sanity screen that works even on
    unit-normalized corpora (where every L2 norm is exactly 1 and a
    norm check is vacuous): a vector whose largest component sits far
    outside [q1 - 1.5·IQR, q3 + 1.5·IQR] is a spike — one dimension
    dominating the representation, the signature of truncation, bad
    pooling, or an embedding-model fault. Magnitudes round to the 1e-6
    grid first; the fences use exact interpolated percentiles (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``) and identical IEEE
    arithmetic on both engines. One scan + a broadcast 1-row stats
    bind."""
    m = vector_norms(embeddings).select("vec_id", "label", "max_abs")
    fences = m.agg(
        F.expr("percentile(max_abs, 0.25)").alias("q1"),
        F.expr("percentile(max_abs, 0.75)").alias("q3"),
    )
    return (
        m.crossJoin(F.broadcast(fences))
        .filter(
            (F.col("max_abs") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
            | (F.col("max_abs") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        )
        .select("vec_id", "label", "max_abs")
    )


def centroid_vectors(embeddings: DataFrame) -> DataFrame:
    """Assemble the per-label centroid COMPONENTS of :func:`label_centroids`
    back into dense vectors ``(cell_id, cvec)``.

    collect_list is order-nondeterministic across partitionings, so the
    components are collected as (pos, val) structs and array_sort'ed — the
    struct sort on the leading pos field pins a total order. One shuffle on
    label; output is n_labels rows (tiny, broadcastable by construction).
    """
    comps = label_centroids(embeddings)
    return (
        comps.groupBy(F.col("label").alias("cell_id"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, centroid_val))),"
                " x -> x.centroid_val)"
            ).alias("cvec")
        )
    )


def _best_cells(
    vectors: DataFrame, cells: DataFrame, id_col: str, vec_col: str, n: int
) -> DataFrame:
    """Rank IVF cells per vector by rounded cosine (ties → lower cell_id)
    and keep the top ``n``. The centroid table is broadcast — the corpus
    never shuffles for assignment."""
    from pyspark.sql import Window

    scored = (
        vectors.join(F.broadcast(cells))
        .withColumn(
            "cell_cos",
            F.round(F.expr(cos_expr(vec_col, "cvec")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cell_cos"), "cell_id")
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n)
        .drop("cvec", "cell_rank")
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is partitioned into
    cells around the per-label centroids; each query probes only its
    ``nprobe`` closest cells and ranks exact cosine within them.

    Scale path: assignment is a broadcast nested-loop against n_cells
    centroids (linear in corpus, no shuffle); the candidate join shuffles
    on cell_id only — search cost drops by ~n_cells/nprobe vs brute force.
    Deterministic end-to-end (exact-decimal centroids, rounded cosines,
    id tie-breaks), so it is oracle-checkable in SQL.
    """
    cells = centroid_vectors(embeddings)
    corpus = _as_double(embeddings, "embedding", "cv_").select(
        F.col("vec_id").alias("c_id"), F.col("cv_").alias("cv"),
        F.col("label").alias("c_label"),
    )
    assigned = _best_cells(corpus, cells, "c_id", "cv", 1).select(
        "c_id", "cv", "c_label", F.col("cell_id").alias("cell")
    )

    queries = _as_double(embeddings, "embedding", "qv_").select(
        F.col("vec_id").alias("q_id"), F.col("qv_").alias("qv")
    ).filter(F.col("q_id") < n_queries)
    probes = _best_cells(queries, cells, "q_id", "qv", nprobe).select(
        "q_id", "qv", F.col("cell_id").alias("cell")
    )

    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("c_id") != F.col("q_id")
    )
    scored = cand.withColumn("cosine", F.round(F.expr(COS_EXPR), 6)).select(
        "q_id", "c_id", "c_label", "cosine"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "c_label", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """md5-derived hyperplanes, component (p, d) = (2m - 2^32) / 2^32
    with m the first 8 hex digits of md5("{seed}:{p}:{d}") — uniform in
    [-1, 1), EXACT in IEEE doubles (integer < 2^33, power-of-two
    divisor: no rounding step at all), and reproducible by any engine
    with md5 — which is the point: DuckDB rebuilds the identical plane
    matrix in SQL (see SQL_ANN_LSH_TOPK), where a numpy RandomState
    Gaussian could never be mirrored. Uniform components lose the exact
    angle-preservation constant of Gaussian planes but keep the
    sign-hash locality property this LSH family needs."""
    import hashlib

    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            m = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((2.0 * m - 4294967296.0) / 4294967296.0)
        out.append(row)
    return out


def with_lsh_signature(
    embeddings: DataFrame, dim: int = 64, n_planes: int = 16, seed: int = 42
) -> DataFrame:
    """Random-hyperplane signature packed into one long: bit j =
    sign(v · plane_j). Computed as ONE Arrow-batched numpy matmul
    ((batch×dim) @ (dim×planes)) + sign-bit pack per partition: the
    per-plane higher-order-fold form this replaced is interpreted (HOFs
    don't enter whole-stage codegen) and measured 15 s for 80 planes ×
    20 k vectors vs <1 s for the matmul — the textbook wide-vector case
    where an Arrow pandas UDF beats JVM expression trees. Planes are
    derived from the seed inside the (self-contained) closure, identical
    to :func:`_hyperplanes` (md5-derived, SQL-reproducible); sign bits
    follow the refine-and-verify contract — a dot within the error
    margin of zero is re-decided by the exact sequential fold DuckDB's
    list_reduce mirrors, so every bit is the fold formulation's bit.
    Capped at 63 planes by the long packing — use
    :func:`with_lsh_bands` for wider geometries."""
    if n_planes > 63:
        raise ValueError("packed signature holds <= 63 planes; use with_lsh_bands")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sig(ev):
        # self-contained: imports inside, no module globals. BLAS pinned
        # to one thread per worker — concurrent workers with default
        # ncpu-thread OpenBLAS pools oversubscribe the box (see
        # dedup._near_dup_pairs_direct for the measured swing). The pin
        # block is DELIBERATELY duplicated across the three matmul
        # closures rather than shared: a module-level helper would be
        # pickled by reference and the worker processes cannot import
        # this package (driver-sim runs from a foreign cwd).
        import ctypes
        import glob
        import hashlib
        import os

        os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
        import numpy as np
        import pandas as pd

        for _so in glob.glob(os.path.dirname(np.__file__) + ".libs/*openblas*"):
            try:
                _lib = ctypes.CDLL(_so)
                _set = getattr(
                    _lib, "openblas_set_num_threads64_", None
                ) or getattr(_lib, "openblas_set_num_threads", None)
                if _set is not None:
                    _set(1)
            except OSError:
                pass

        planes = np.empty((n_planes, dim))
        for p in range(n_planes):
            for d in range(dim):
                hv = int(
                    hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16
                )
                planes[p, d] = (2.0 * hv - 4294967296.0) / 4294967296.0
        pnorm_max = float(np.sqrt(np.einsum("ij,ij->i", planes, planes)).max())
        m = np.stack(ev.to_numpy())
        dots = m @ planes.T
        vnorm = np.sqrt(np.einsum("ij,ij->i", m, m))
        margin = (1e-9 * (1.0 + vnorm * pnorm_max))[:, None]
        for i, j in zip(*np.nonzero(np.abs(dots) <= margin)):
            s = 0.0  # the SQL fold, op for op
            for x, y in zip(m[i], planes[j]):
                s = s + x * y
            dots[i, j] = s
        # NaN sets the bit: DuckDB's total order evaluates NaN > 0 as
        # true (NaN above every number), numpy as False — align with the
        # SQL mirror so a NaN component cannot flip band keys cross-engine
        bits = (dots > 0) | np.isnan(dots)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    df = _as_double(embeddings, "embedding", "ev")
    return df.withColumn("lsh_sig", _sig(F.col("ev")))


def with_lsh_bands(
    embeddings: DataFrame,
    n_bands: int,
    rows_per_band: int,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Banded hyperplane LSH keys without the 63-bit packing limit:
    ``lsh_bands[b]`` = the ``rows_per_band`` sign bits of band b packed
    into a long, from the same seeded plane matrix as
    :func:`with_lsh_signature` (one Arrow-batched matmul; md5-derived
    planes + refine-and-verify sign bits, so every band key is the
    SQL fold formulation's key). Geometry can then scale with corpus
    size (r must track log2(√n)) past the point where a single packed
    long runs out of bits."""
    from pyspark.sql.functions import pandas_udf

    n_planes = n_bands * rows_per_band

    @pandas_udf("array<long>")
    def _bands(ev):
        # self-contained: imports inside, no module globals. BLAS pinned
        # to one thread per worker (see _sig / dedup's scorer).
        import ctypes
        import glob
        import hashlib
        import os

        os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
        import numpy as np
        import pandas as pd

        for _so in glob.glob(os.path.dirname(np.__file__) + ".libs/*openblas*"):
            try:
                _lib = ctypes.CDLL(_so)
                _set = getattr(
                    _lib, "openblas_set_num_threads64_", None
                ) or getattr(_lib, "openblas_set_num_threads", None)
                if _set is not None:
                    _set(1)
            except OSError:
                pass

        planes = np.empty((n_planes, dim))
        for p in range(n_planes):
            for d in range(dim):
                hv = int(
                    hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16
                )
                planes[p, d] = (2.0 * hv - 4294967296.0) / 4294967296.0
        pnorm_max = float(np.sqrt(np.einsum("ij,ij->i", planes, planes)).max())
        m = np.stack(ev.to_numpy())
        dots = m @ planes.T
        vnorm = np.sqrt(np.einsum("ij,ij->i", m, m))
        margin = (1e-9 * (1.0 + vnorm * pnorm_max))[:, None]
        for i, j in zip(*np.nonzero(np.abs(dots) <= margin)):
            s = 0.0  # the SQL fold, op for op
            for x, y in zip(m[i], planes[j]):
                s = s + x * y
            dots[i, j] = s
        # NaN sets the bit — DuckDB's total order, see with_lsh_signature
        bits = (dots > 0) | np.isnan(dots)
        grouped = bits.reshape(len(m), n_bands, rows_per_band)
        weights = 1 << np.arange(rows_per_band, dtype=np.int64)
        vals = (grouped * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(vals))

    df = _as_double(embeddings, "embedding", "ev")
    return df.withColumn("lsh_bands", _bands(F.col("ev")))


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: candidates must share ≥1 LSH band with the
    query, then exact cosine ranks within candidates. Recall < 1 by design;
    the shuffle is on (band_id, band_bits) — linear, never quadratic."""
    rows = n_planes // n_bands
    sig = with_lsh_signature(embeddings, n_planes=n_planes)
    bands = sig.select(
        "vec_id",
        "ev",
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.expr(
                            f"(lsh_sig >> {b * rows}) & {(1 << rows) - 1}"
                        ).alias("band_bits"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bd"),
    ).select("vec_id", "ev", "label", "bd.band_id", "bd.band_bits")

    qb = bands.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("ev").alias("qv"), "band_id", "band_bits"
    )
    cb = bands.select(
        F.col("vec_id").alias("c_id"),
        F.col("ev").alias("cv"),
        F.col("label").alias("c_label"),
        "band_id",
        "band_bits",
    )
    cand = (
        cb.join(F.broadcast(qb), ["band_id", "band_bits"])
        .filter(F.col("c_id") != F.col("q_id"))
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.withColumn("cosine", F.round(F.expr(COS_EXPR), 6)).select(
        "q_id", "c_id", "c_label", "cosine"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "c_label", "cosine", "rank")
    )


def ann_cosine_topk_pandas(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k with the scoring in a vectorized pandas
    UDF instead of the JVM fold — the Arrow path that wins for WIDE
    vectors (dim ≳ 512: one numpy matmul per batch beats a per-element
    lambda fold; at dim=64 the JVM fold wins by skipping Arrow
    round-trips — both shipped so the choice is a one-line swap).
    Identical output contract to :func:`ann_cosine_topk` (rounded cosine,
    id tie-breaks), asserted equal in tests.

    Edge-case parity with the JVM twin: a zero-denominator pair returns
    NULL (nullable Float64 → Arrow null), matching the nullif() guard —
    NaN would sort ABOVE every real cosine in a descending Spark sort and
    steal rank 1.  Rounding happens JVM-side via F.round (HALF_UP);
    pd.Series.round is banker's (half-even) and flips ...5 boundaries."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(qv, cv):
        # self-contained: imports inside, no module globals
        import numpy as np
        import pandas as pd

        q = np.stack(qv.to_numpy())
        c = np.stack(cv.to_numpy())
        dots = np.einsum("ij,ij->i", q, c)
        denom = np.linalg.norm(q, axis=1) * np.linalg.norm(c, axis=1)
        safe = np.where(denom > 0, denom, 1.0)
        # nullable dtype so zero-denominator rows cross Arrow as NULL, not NaN
        return pd.Series(dots / safe, dtype="Float64").where(denom > 0)

    corpus = _as_double(embeddings, "embedding", "cv").select(
        F.col("vec_id").alias("c_id"), "cv", F.col("label").alias("c_label")
    )
    queries = _as_double(embeddings, "embedding", "qv").select(
        F.col("vec_id").alias("q_id"), "qv"
    ).filter(F.col("q_id") < n_queries)

    scored = (
        corpus.join(F.broadcast(queries), F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", F.round(_cos(F.col("qv"), F.col("cv")), 6))
        .select("q_id", "c_id", "c_label", "cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "c_label", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (public technique: Jégou, Douze & Schmid 2011,
# "Product Quantization for Nearest Neighbor Search"): split each vector
# into m subvectors, k-means each subspace to 2^nbits centroids, store a
# vector as m small codes. At 100 TB this is the memory story for ANN —
# a dim-64 float32 vector (256 B) compresses to m=8 4-bit codes (4 B,
# 64×), and search scans codes with per-query lookup tables instead of
# raw vectors. Implemented entirely in JVM column expressions with
# deterministic math (hash-partition init, exact-decimal centroid means,
# rounded distances with code tie-breaks), so results are stable across
# partitionings and frozen as golden artifacts.


def _unit(df: DataFrame, src: str, dst: str) -> DataFrame:
    """L2-normalize an array<double> column (zero vectors pass through
    unchanged — they quantize to whatever cell owns the origin).

    The norm is hoisted into its own column first: an aggregate expression
    textually inlined inside the transform lambda re-evaluates the whole
    fold PER ELEMENT (higher-order functions are interpreted — that inline
    was a measured 2 s on 2 k dim-64 rows)."""
    norm = (
        "sqrt(aggregate(transform({c}, x -> x * x), CAST(0.0 AS DOUBLE),"
        " (s, v) -> s + v))"
    ).format(c=src)
    return (
        df.withColumn("__norm", F.expr(norm))
        .withColumn(
            dst,
            F.expr(
                f"CASE WHEN __norm = 0.0 THEN {src} "
                f"ELSE transform({src}, x -> x / __norm) END"
            ),
        )
        .drop("__norm")
    )


def _pq_subvectors(df: DataFrame, id_col: str, vec_col: str, m: int) -> DataFrame:
    """(id, j, sv): the m contiguous subvectors of each vector."""
    d_sub = f"CAST(size({vec_col}) / {m} AS INT)"
    return df.select(
        F.col(id_col),
        F.expr(
            f"posexplode(transform(sequence(0, {m - 1}),"
            f" j -> slice({vec_col}, j * {d_sub} + 1, {d_sub})))"
        ).alias("j", "sv"),
    ).select(id_col, "j", "sv")


_L2 = (
    "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)),"
    " CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
)


def _pq_assign(sub: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Nearest centroid per (id, j), vectorized: the codebook (m×2^nbits
    rows — metadata-sized by construction, the same thing a broadcast
    would ship) rides in the closure as numpy arrays; each Arrow batch is
    one argmin over a (batch × 2^nbits) distance matrix per subspace.

    A pure-JVM formulation (join + zip_with/aggregate L2 fold) was 5 s
    per k-means iteration at 2 k vectors: Spark's higher-order array
    functions evaluate interpreted, outside whole-stage codegen, so the
    candidate expansion (rows × 2^nbits folds) is the wrong hot loop.
    This is the repo's standing rule — built-ins until dense linear
    algebra appears, then one Arrow-batched numpy kernel.

    Deterministic AND SQL-mirrorable, by the refine-and-verify contract
    of :func:`_assign_blas`: the BLAS distance matrix nominates an
    argmin, which is trusted only when every competitor is outside an
    error margin covering reassociation + expansion cancellation;
    ambiguous rows are re-decided by the EXACT sequential left fold
    ((x-y)*(x-y) accumulated in array order — the op sequence DuckDB's
    ``list_reduce`` performs on the same doubles), ties to the lowest
    code, NaN above every number. Assignments are therefore bit-identical
    to the fold formulation an oracle can run."""
    return _pq_assign_rows(sub, cents.collect(), id_col)


def _pq_assign_rows(sub: DataFrame, rows: list, id_col: str) -> DataFrame:
    """:func:`_pq_assign` over an already-collected codebook — the k-means
    loop keeps the codebook driver-side between iterations (m × 2^nbits
    rows), so each iteration is exactly ONE Spark job."""
    import numpy as np

    by_j: dict[int, list] = {}
    for r in rows:
        by_j.setdefault(r.j, []).append((r.code, r.cv))
    books = {
        j: (
            np.array([c for c, _ in sorted(v)], dtype="int32"),
            np.array([cv for _, cv in sorted(v)], dtype="float64"),
        )
        for j, v in by_j.items()
    }

    def assign(batches):
        # self-contained: workers don't share the driver's sys.path
        import ctypes
        import glob
        import os

        os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
        import numpy as np
        import pandas as pd

        for _so in glob.glob(os.path.dirname(np.__file__) + ".libs/*openblas*"):
            try:
                _lib = ctypes.CDLL(_so)
                _set = getattr(
                    _lib, "openblas_set_num_threads64_", None
                ) or getattr(_lib, "openblas_set_num_threads", None)
                if _set is not None:
                    _set(1)
            except OSError:
                pass

        def fold_dist(q, c):
            # the SQL fold, op for op: term then left accumulation
            s = 0.0
            for x, y in zip(q, c):
                d = x - y
                s = s + d * d
            return s

        for pdf in batches:
            if not len(pdf):
                continue
            svs = np.stack(pdf["sv"].to_numpy())
            js = pdf["j"].to_numpy()
            out = np.empty(len(pdf), dtype="int32")
            for j in np.unique(js):
                mask = js == j
                codes_j, cents_j = books[int(j)]
                q = svs[mask]
                q2 = np.einsum("ij,ij->i", q, q)
                c2 = np.einsum("ij,ij->i", cents_j, cents_j)
                with np.errstate(invalid="ignore"):
                    dist = q2[:, None] - 2.0 * (q @ cents_j.T) + c2[None, :]
                # absolute margin bounding reassociation + the expanded
                # form's cancellation (~dim*eps*(||q||^2+||c||^2)); same
                # derivation as _assign_blas
                margin = 1e-9 * (q2 + (c2.max() if len(c2) else 0.0) + 1.0)
                nan_rows = np.isnan(dist).any(axis=1)
                best = np.argmin(np.where(np.isnan(dist), np.inf, dist), axis=1)
                best_d = dist[np.arange(len(q)), best]
                n_close = (dist <= best_d[:, None] + margin[:, None]).sum(axis=1)
                sel = codes_j[best]
                for i in np.nonzero(nan_rows | (n_close > 1))[0]:
                    # exact fold over every code; Spark ordering: NaN
                    # sorts above all numbers, lower code wins ties
                    scored = []
                    for ci in range(len(codes_j)):
                        dv = fold_dist(q[i], cents_j[ci])
                        isn = dv != dv
                        scored.append(
                            (1 if isn else 0, 0.0 if isn else dv, int(codes_j[ci]))
                        )
                    sel[i] = min(scored)[2]
                out[mask] = sel
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "j": pdf["j"],
                    "code": out,
                    "sv": pdf["sv"],
                }
            )

    return sub.mapInPandas(assign, f"{id_col} long, j int, code int, sv array<double>")


def _pq_centroids_from(assigned: DataFrame) -> DataFrame:
    """(j, code, cv): exact-decimal elementwise means of the assigned
    subvectors — deterministic across partitionings, same pattern as
    :func:`label_centroids`."""
    return (
        assigned.select("j", "code", F.posexplode("sv").alias("pos", "val"))
        .groupBy("j", "code", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(28,14)")).cast("double")
                / F.count("*")
            ).alias("cval")
        )
        .groupBy("j", "code")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cval))), x -> x.cval)"
            ).alias("cv")
        )
    )


def pq_train(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    m: int = 8,
    nbits: int = 4,
    iters: int = 4,
    sub: DataFrame | None = None,
) -> DataFrame:
    """Train PQ codebooks with Lloyd's k-means per subspace, fully
    distributed: no vector ever reaches the driver.

    Init is the deterministic random-partition variant — code = the
    first two hex digits of md5(id) mod 2^nbits, then one mean step.
    md5 (not xxhash64) is the cross-engine hash: DuckDB computes the
    identical digest, which together with the fold-exact assignment
    (:func:`_pq_assign`) and exact-decimal means makes the ENTIRE
    iterative training mirrorable by an unrolled SQL oracle — the same
    property :func:`kmeans_clusters` has. 2^nbits divides 256, so the
    two-digit value is uniform over codes. Each iteration is one assign
    (codebook in the closure) + one exact-decimal mean job; a cell that
    loses all members simply drops out of the codebook (standard
    k-means behavior; the effective codebook shrinks).
    """
    k = 1 << nbits
    assert 256 % k == 0, "nbits must be <= 8 for the md5 two-digit init"
    # every Lloyd's round re-reads the subvector relation; persisted ONCE
    # the (iters + 1) iteration jobs read the cache instead of re-running
    # scan → unit-normalize (an interpreted fold) → explode each round
    # (guide §5 persist-what-you-reuse). A caller that already holds the
    # relation (ann_pq_topk shares it with the encode pass) passes ``sub``
    # and owns its lifecycle.
    own_sub = sub is None
    if own_sub:
        sub = _pq_subvectors(vectors, id_col, vec_col, m).persist()
    seeded = sub.withColumn(
        "code",
        F.expr(
            f"CAST((instr('0123456789abcdef', substring(md5(CAST({id_col} AS STRING)), 1, 1)) * 16"
            f" + instr('0123456789abcdef', substring(md5(CAST({id_col} AS STRING)), 2, 1)) - 17)"
            f" % {k} AS INT)"
        ),
    )
    # the codebook stays driver-side between iterations (m × 2^nbits rows
    # — metadata-sized, the same payload every broadcast of it would
    # ship); each iteration is ONE job: scan → vectorized assign →
    # exact-decimal means → collect. No vector data ever leaves the
    # executors; lineage restarts from the closure each iteration, so no
    # checkpoint is needed.
    schema = None
    rows = None
    try:
        for it in range(iters + 1):
            assigned = (
                seeded if it == 0 else _pq_assign_rows(sub, rows, id_col)
            )
            cents = _pq_centroids_from(assigned)
            schema = cents.schema
            rows = cents.collect()
    finally:
        if own_sub:
            # the trajectory is fully collected — nothing downstream
            # reads the cached relation
            sub.unpersist()
    return vectors.sparkSession.createDataFrame(rows, schema=schema)


def _pq_encode_from_sub(
    sub: DataFrame, cents: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """:func:`pq_encode` over an already-built subvector relation — lets
    a caller that trained on the same relation (ann_pq_topk) reuse one
    persisted copy instead of re-deriving scan → normalize → explode."""
    assigned = _pq_assign(sub, cents, id_col)
    return assigned.groupBy(id_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(j, code))), x -> x.code)"
        ).alias("codes")
    )


def pq_encode(
    vectors: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    m: int = 8,
) -> DataFrame:
    """(id, codes): each vector as its array of m codebook codes, ordered
    by subspace. The 64×-smaller relation ADC search scans instead of
    raw vectors."""
    return _pq_encode_from_sub(
        _pq_subvectors(vectors, id_col, vec_col, m), cents, id_col
    )


def pq_index_build(
    embeddings: DataFrame,
    root: str,
    m: int = 8,
    nbits: int = 4,
    iters: int = 4,
) -> tuple[str, str]:
    """Train-once half of the production PQ shape: train codebooks over
    the unit-normalized corpus and encode every vector, persisting BOTH
    as transaction-log tables (``<root>/codebooks``, ``<root>/codes``) so
    every later search is a read, not a retrain — `ann_pq_topk` retrains
    4 Lloyd's iterations inside the query otherwise, the single most
    expensive thing it does. Returns the two table paths.

    The index is itself versioned data: re-running after a corpus append
    commits a new snapshot, and a search pinned with ``versionAsOf``
    keeps reproducing its original results — the same property the
    reference gets from Iceberg snapshots (IngestionJob.scala:15-19).
    """
    import os

    from ..sources.txlog import TableLog

    unit = _unit(
        _as_double(embeddings, "embedding", "v_"), "v_", "v"
    ).select("vec_id", "v")
    cents = pq_train(unit, m=m, nbits=nbits, iters=iters)
    codes = pq_encode(unit, cents, m=m)
    cents_path = os.path.join(root, "codebooks")
    codes_path = os.path.join(root, "codes")
    TableLog(embeddings.sparkSession, cents_path).write(cents, mode="overwrite")
    TableLog(embeddings.sparkSession, codes_path).write(codes, mode="overwrite")
    return cents_path, codes_path


def ann_pq_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    m: int = 8,
    nbits: int = 4,
    iters: int = 4,
    cents: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    PQ codes: queries stay exact, the corpus is m codes per vector.

    Per query the codebook collapses to a lookup table of
    m×2^nbits partial dot products (a tiny broadcast relation); the scan
    side explodes codes to (c_id, j, code), joins the broadcast LUT, and
    sums m exact-decimal partials per (query, candidate) — partial
    aggregation absorbs the m-fold row expansion before the shuffle.
    Unit-normalized inputs make the ADC score an approximate cosine.

    Pass ``cents``/``codes`` (e.g. read back from
    :func:`pq_index_build`'s txlog tables) for the train-once/search-many
    shape; with both supplied the query never touches Lloyd's. Omitted,
    they are trained in-query (the fused form the golden artifact
    freezes — the cached path is equality-tested against it).

    Fully deterministic (seeded init, exact means, decimal-grid partial
    sums, id tie-breaks) — frozen as a golden artifact; recall vs the
    exact brute-force top-k is asserted in tests.
    """
    from pyspark.sql import Window

    unit = _unit(
        _as_double(embeddings, "embedding", "v_"), "v_", "v"
    ).select("vec_id", "v")
    if cents is None or codes is None:
        # ONE persisted subvector relation serves the (iters + 1) Lloyd's
        # rounds AND the encode pass — previously each re-derived
        # scan → unit-normalize (interpreted fold) → explode. The persist
        # has no owner to unpersist it (the returned plan reads it
        # lazily); like the LSH signature persists, the session's cache
        # policy (bench: clearCache between trials) releases it.
        sub = _pq_subvectors(unit, "vec_id", "v", m).persist()
        if cents is None:
            cents = pq_train(unit, m=m, nbits=nbits, iters=iters, sub=sub)
        if codes is None:
            codes = _pq_encode_from_sub(sub, cents)

    queries = unit.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    # LUT: partial dot product of each query subvector with each centroid
    lut = (
        _pq_subvectors(queries, "q_id", "qv", m)
        .join(F.broadcast(cents), "j")
        .select(
            "q_id",
            "j",
            "code",
            F.round(
                F.expr(
                    "aggregate(zip_with(sv, cv, (x, y) -> x * y),"
                    " CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
                ),
                9,
            ).alias("dot"),
        )
    )
    exploded = codes.select(
        F.col("vec_id").alias("c_id"), F.posexplode("codes").alias("j", "code")
    )
    scored = (
        exploded.join(F.broadcast(lut), ["j", "code"])
        .filter(F.col("c_id") != F.col("q_id"))
        .groupBy("q_id", "c_id")
        .agg(
            F.sum(F.col("dot").cast("decimal(28,12)")).cast("double").alias("adc_score")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("adc_score"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("adc_score", 6).alias("adc_score"), "rank")
    )


def ann_pq_rerank_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    shortlist: int = 50,
    m: int = 16,
    nbits: int = 6,
    iters: int = 4,
) -> DataFrame:
    """The production PQ search shape: ADC over codes builds a cheap
    ``shortlist`` per query, then ONLY those candidates are reranked with
    exact cosine against the raw vectors. Compression does the corpus
    scan, exact math does the final ordering — measured here at
    recall@10 = 0.98 vs the brute-force baseline with a 50-candidate
    shortlist (m=16, nbits=6: 12 bytes/vector, 21× smaller than
    float32).

    The shortlist relation is tiny (n_queries × shortlist ids), so the
    rerank join broadcasts it against the corpus — one scan, no shuffle
    of raw vectors.
    """
    from pyspark.sql import Window

    cand = ann_pq_topk(embeddings, n_queries, shortlist, m, nbits, iters).select(
        "q_id", "c_id"
    )
    corpus = _as_double(embeddings, "embedding", "cv").select(
        F.col("vec_id").alias("c_id"), "cv", F.col("label").alias("c_label")
    )
    queries = (
        _as_double(embeddings, "embedding", "qv")
        .select(F.col("vec_id").alias("q_id"), "qv")
        .filter(F.col("q_id") < n_queries)
    )
    scored = (
        corpus.join(F.broadcast(cand), "c_id")
        .join(F.broadcast(queries), "q_id")
        .withColumn("cosine", F.round(F.expr(COS_EXPR), 6))
        .select("q_id", "c_id", "c_label", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "c_label", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# k-means document clustering
# ---------------------------------------------------------------------------

# squared L2 between two array<double> columns as a SEQUENTIAL double fold.
# A fold in array order is deterministic and partition-invariant (unlike a
# grouped double SUM, whose addend order floats with the partitioning), and
# DuckDB's list_reduce performs the identical left fold over the identical
# doubles — so the distance is bit-exact across engines WITHOUT paying for
# per-element BigDecimal arithmetic, which measured 6× slower in this hot
# path (the one expression evaluated n·k·dim times per iteration).
def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def _assign_blas(corpus: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """BLAS twin of the fold assignment, BIT-IDENTICAL by construction:
    distances come from one blocked matmul (||q||^2 - 2 q.C^T + ||c||^2),
    and a row's argmin is trusted only when the runner-up is outside an
    error margin that provably covers BLAS reassociation AND the
    cancellation of the expanded form (absolute, scaled by the squared
    norms — the expansion loses ~eps*||.||^2 where the fold's direct
    (x-y)^2 sum does not). Rows with >=2 clusters inside the margin — or
    any NaN distance — are re-decided in Python by the EXACT left fold
    ((x-y)*(x-y) accumulated in array order over IEEE doubles, the very
    op sequence of the SQL aggregate/zip_with), with Spark's ordering for
    the tie-break (NaN above every number, ties to the lower cluster id).
    Ambiguity is rare (centroids equidistant from a point), so the Python
    loop sees a handful of rows while BLAS does the n*k*dim work —
    the same refine-and-verify contract as the near-dup matmul scorer
    (operators/dedup.py _near_dup_pairs_direct)."""
    spark = corpus.sparkSession
    import numpy as np

    k_ids = np.array(sorted(cents), dtype="int64")
    c_mat = np.array([cents[c] for c in sorted(cents)], dtype="float64")
    bcast = spark.sparkContext.broadcast((k_ids, c_mat))

    def _score(batches):
        import ctypes
        import glob
        import os

        os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
        import numpy as np
        import pyarrow as pa

        for _so in glob.glob(os.path.dirname(np.__file__) + ".libs/*openblas*"):
            try:
                _lib = ctypes.CDLL(_so)
                _set = getattr(
                    _lib, "openblas_set_num_threads64_", None
                ) or getattr(_lib, "openblas_set_num_threads", None)
                if _set is not None:
                    _set(1)
            except OSError:
                pass

        ids_c, mat_c = bcast.value
        c2 = np.einsum("ij,ij->i", mat_c, mat_c)

        def fold_dist(q, c):
            # the SQL fold, op for op: term then left accumulation
            s = 0.0
            for x, y in zip(q, c):
                d = x - y
                s = s + d * d
            return s

        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            ids_q = np.asarray(tbl.column("vec_id")).astype("int64")
            if len(ids_q) == 0:
                continue
            q = np.asarray(
                tbl.column("ev").combine_chunks().flatten()
            ).reshape(len(ids_q), -1)
            q2 = np.einsum("ij,ij->i", q, q)
            with np.errstate(invalid="ignore"):
                dist = q2[:, None] - 2.0 * (q @ mat_c.T) + c2[None, :]
            # absolute margin: reassociation + expansion cancellation are
            # both bounded by ~dim*eps*(||q||^2 + ||c||^2); 1e-9*(scale+1)
            # is orders wider (per row, against the largest centroid norm)
            margin = 1e-9 * (q2 + (c2.max() if len(c2) else 0.0) + 1.0)
            nan_rows = np.isnan(dist).any(axis=1)
            best = np.argmin(np.where(np.isnan(dist), np.inf, dist), axis=1)
            best_d = dist[np.arange(len(ids_q)), best]
            n_close = (dist <= best_d[:, None] + margin[:, None]).sum(axis=1)
            ambiguous = nan_rows | (n_close > 1)
            out = ids_c[best]
            for i in np.nonzero(ambiguous)[0]:
                # exact fold over every cluster; Spark ordering: NaN sorts
                # above all numbers, NaN ties with NaN, lower cluster wins
                scored = []
                for ci in range(len(ids_c)):
                    dv = fold_dist(q[i], mat_c[ci])
                    isn = dv != dv
                    scored.append((1 if isn else 0, 0.0 if isn else dv, ids_c[ci]))
                out[i] = min(scored)[2]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_q),
                    pa.array(out.astype("int32")),
                    tbl.column("ev").combine_chunks(),
                ],
                ["vec_id", "cluster", "ev"],
            )

    return corpus.mapInArrow(
        _score, "vec_id long, cluster int, ev array<double>"
    )


def kmeans_clusters(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    keep_vector: bool = False,
    method: str = "fold",
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column → final
    cluster assignment ``(vec_id, cluster)``.

    Fully deterministic, which makes an *iterative* algorithm exactly
    reproducible in a SQL oracle (the DuckDB mirror unrolls the same
    ``iters`` steps): init is the ``k`` lowest vec_ids; assignment is
    argmin of the squared L2 as a sequential double fold — deterministic
    in array order, bit-mirrored by DuckDB's list_reduce (ties → lower
    cluster id); centroid updates use the exact-decimal mean (sum as
    DECIMAL(28,12), order-independent across the shuffle, then one
    double division). A cluster that loses
    all members drops out — both engines shrink identically.

    100 TB shape (same contract as :func:`pq_train`): the centroid table
    is metadata-sized (k × dim doubles) and lives driver-side between
    iterations; each iteration is ONE job — scan, partition-local argmin
    against centroid literals (no join, no shuffle of vectors), then an
    exact-decimal mean whose shuffle carries only k × dim partial states
    after map-side combine. Lineage restarts from literals each
    iteration, so no checkpoint is needed. Cost: (iters + 1) corpus
    scans; vectors never move.

    ``method="blas"`` swaps the fold assignment for the matmul
    refine-and-verify twin (:func:`_assign_blas` — bit-identical results,
    asserted by equality tests): the fold's n·k·dim interpreted/codegen
    terms become one BLAS GEMM per batch, which is what makes LARGE k
    tractable (adaptive-k semantic_dedup needs k ≈ √n; at n = 200 k that
    is k ≈ 450, where the literal-array fold plan is both megabytes of
    constants and ~50× slower). Seeds, updates, and the tie rule are
    shared; NULL embeddings are dropped by both methods (a null vector
    has no distance to anything).
    """
    # persisted: the seed job, every iteration's assign+update job and
    # the final assign all re-derived scan → cast → filter otherwise —
    # (iters + 2) executions of the same subtree (guide §5
    # persist-what-you-reuse). No owner unpersists it (the returned plan
    # reads it lazily); the session's cache policy releases it.
    corpus = (
        _as_double(embeddings, "embedding", "ev")
        .filter(F.col("ev").isNotNull())
        .select("vec_id", "ev")
        .persist()
    )

    def assign_fold(cents: dict[int, list[float]]) -> DataFrame:
        cents_arr = F.array(
            *[
                F.struct(
                    F.lit(c).cast("int").alias("cluster"),
                    F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
                )
                for c, vec in sorted(cents.items())
            ]
        )
        scored = F.transform(
            cents_arr,
            lambda cc: F.struct(
                _l2sq(F.col("ev"), cc["cvec"]).alias("dist"),
                cc["cluster"].alias("cluster"),
            ),
        )
        return corpus.withColumn("cluster", F.array_min(scored)["cluster"])

    if method == "fold":
        assign = assign_fold
    elif method == "blas":
        assign = lambda cents: _assign_blas(corpus, cents)  # noqa: E731
    else:
        raise ValueError(f"kmeans_clusters: unknown method {method!r}")

    def update(assigned: DataFrame) -> dict[int, list[float]]:
        comp = (
            assigned.select("cluster", F.posexplode("ev").alias("pos", "e"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("e").cast("decimal(28,12)")).cast("double")
                    / F.count("*")
                ).alias("val")
            )
        )
        out: dict[int, list[tuple[int, float]]] = {}
        for r in comp.collect():  # k × dim rows — metadata-sized
            out.setdefault(r["cluster"], []).append((r["pos"], r["val"]))
        return {c: [v for _, v in sorted(vs)] for c, vs in out.items()}

    # the k lowest vec_ids, relabeled densely 0..k-1 — a limit(k), not a
    # `vec_id < k` filter, so sparse or offset id spaces still seed k
    # centroids instead of silently seeding fewer (or none)
    seed_rows = corpus.orderBy("vec_id").limit(k).collect()
    if not seed_rows:
        raise ValueError("kmeans_clusters: no vectors to cluster")
    init = {i: list(r["ev"]) for i, r in enumerate(seed_rows)}
    cents = init
    for _ in range(iters):
        cents = update(assign(cents))
    final = assign(cents).withColumn("cluster", F.col("cluster").cast("int"))
    if keep_vector:
        # composition hook (semantic_dedup): hand back the double-cast
        # vector alongside the assignment so downstream pairing reuses
        # this scan instead of re-joining vectors on vec_id
        return final.select("vec_id", "cluster", "ev")
    return final.select("vec_id", "cluster")


def _cluster_kept_blas(clustered: DataFrame, threshold: float) -> DataFrame:
    """Grouped-matmul twin of semantic_dedup's fold pairing, BIT-IDENTICAL
    by the refine-and-verify contract: each cluster's pairwise cosines
    come from one numpy GEMM; a vector is DEFINITELY dropped when some
    smaller-id cluster-mate scores >= threshold + 2e-6 and definitely kept
    when every one scores < threshold - 2e-6 (|cos_blas - cos_fold| is
    ~1e-13 and F.round moves at most 5e-7, so neither verdict can flip);
    only pairs inside the +/-2e-6 boundary band — or NaN (zero-norm or
    NaN-component vectors) — go to the SQL fold for the exact rounded
    verdict. Cost: one shuffle of the vectors on the cluster key, c^2
    BLAS work per cluster, and a near-empty verify join."""
    t = float(threshold)

    def _group(pdf):
        import ctypes
        import glob
        import os

        os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
        import numpy as np
        import pandas as pd

        for _so in glob.glob(os.path.dirname(np.__file__) + ".libs/*openblas*"):
            try:
                _lib = ctypes.CDLL(_so)
                _set = getattr(
                    _lib, "openblas_set_num_threads64_", None
                ) or getattr(_lib, "openblas_set_num_threads", None)
                if _set is not None:
                    _set(1)
            except OSError:
                pass

        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy("int64")
        cl = int(pdf["cluster"].iloc[0])
        m = np.array(pdf["ev"].to_list(), dtype="float64")
        n = len(ids)
        nrm = np.sqrt(np.einsum("ij,ij->i", m, m))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = (m @ m.T) / (nrm[:, None] * nrm[None, :])
        lower = np.tril(np.ones((n, n), dtype=bool), k=-1)  # j < i
        hi = lower & (cos >= t + 2e-6)
        dropped = hi.any(axis=1)
        band = lower & (np.isnan(cos) | (np.abs(cos - t) <= 2e-6))
        band[dropped, :] = False  # verdict already certain
        ai, aj = np.nonzero(band)
        return pd.DataFrame(
            {
                "id_a": np.concatenate([ids, ids[ai]]),
                "cluster": np.full(n + len(ai), cl, dtype="int32"),
                "dropped": np.concatenate(
                    [dropped, np.zeros(len(ai), dtype=bool)]
                ),
                "id_b": np.concatenate(
                    [np.full(n, -1, dtype="int64"), ids[aj]]
                ),
            }
        )

    out = clustered.groupBy("cluster").applyInPandas(
        _group, "id_a long, cluster int, dropped boolean, id_b long"
    )
    base = out.filter(F.col("id_b") == -1)
    amb = out.filter(F.col("id_b") != -1).select("id_a", "id_b")
    va = clustered.select(F.col("vec_id").alias("id_a"), F.col("ev").alias("qv"))
    vb = clustered.select(F.col("vec_id").alias("id_b"), F.col("ev").alias("cv"))
    verified = (
        amb.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(F.expr(COS_EXPR), 6))
        .filter(F.col("cosine") >= t)
        .select(F.col("id_a").alias("vid"))
        .distinct()
        .withColumn("vdrop", F.lit(True))
    )
    return (
        base.join(verified, base["id_a"] == verified["vid"], "left")
        .select(
            F.col("id_a").alias("vec_id"),
            "cluster",
            (~(F.col("dropped") | F.coalesce(F.col("vdrop"), F.lit(False)))).alias(
                "kept"
            ),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int | None = None,
    iters: int = 2,
    threshold: float = 0.35,
    method: str | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering the embedding space and pruning
    near-identical neighbors WITHIN each cluster — the step between exact
    dedup (bit-identical) and corpus-level near-dedup that removes
    re-phrasings and templated variants before pretraining. Returns
    ``(vec_id, cluster, kept)`` for every input vector; ``kept`` is false
    iff some SMALLER-id vector in the same k-means cluster has rounded
    cosine >= ``threshold`` (the deterministic keep-lowest-id rule, the
    same representative choice as the exact/MinHash dedup family; a pair
    straddling two clusters is intentionally NOT compared — bounding the
    comparison set is what makes SemDeDup tractable at corpus scale).

    Fully SQL-oracle-checked: clustering is the bit-deterministic
    :func:`kmeans_clusters` (exact-decimal means, sequential double-fold
    distances), and the within-cluster cosine is the same rounded fold
    DuckDB mirrors with ``list_cosine_similarity`` — so the ENTIRE
    cluster-then-prune pipeline is reproducible cross-engine, not just
    rows-checked. Zero-norm vectors have NULL cosine with everything and
    are always kept, matching the near-dup family's drop semantics.

    100 TB shape: k MUST scale with n (SemDeDup used 50 k clusters for
    LAION at n≈5 B) or within-cluster pairing degenerates quadratic —
    measured: fixed k=8 at the 100×-dup probe corpus (n = 200 k) needs
    ~5e9 pair folds. The adaptive default (``k=None``) therefore picks
    k = max(8, ceil(sqrt(n))), balancing assignment work (n·k) against
    pair work (n²/k) — both O(n^1.5). ``method`` picks the execution
    strategy per stage: ``"fold"`` is the pure-SQL form the oracle
    mirrors (centroid-literal assignment + per-pair fold join);
    ``"blas"`` runs assignment through :func:`_assign_blas` and pairing
    through :func:`_cluster_kept_blas` — both refine-and-verify twins
    that are BIT-IDENTICAL to the fold form (equality-tested), with the
    n·k·dim and c²·dim inner loops in numpy GEMMs. The default
    (``None``) chooses "blas" when n·k or n²/k exceeds ~5e6 terms.
    NOTE: resolving ``k=None`` or ``method=None`` runs ONE count() job
    at plan-build time (ids only, metadata-cheap relative to the
    (iters+1) corpus scans that follow); pass both explicitly to keep
    plan construction lazy.
    """
    import math

    if k is None or method is None:
        n = embeddings.count()
    if k is None:
        k = max(8, math.ceil(math.sqrt(n)))
    if method is None:
        # the fold assignment's cost knee is k itself, not n*k: one
        # distance expression per centroid LITERAL makes a >8 KB method
        # HotSpot refuses to JIT past ~32-48 terms (SCALING.md, the
        # codegen-knee finding) — so any adaptive k beyond that goes to
        # the GEMM twins, as does volume on either side of the balance
        method = (
            "blas"
            if (k > 16 or n * k >= 5e6 or n * n / k >= 5e6)
            else "fold"
        )
    # the clustered relation is referenced THREE times downstream (the
    # grouped pairing plus both sides of the verify join) and its plan
    # ends in the final assign pass (a full corpus scan + argmin): only
    # the groupBy exchange deduplicates via reuse, so unpersisted the
    # assign executed 3×. One persisted copy serves all references; the
    # returned plan reads it lazily, so the session's cache policy
    # releases it (same pattern as the LSH signature persists).
    clustered = kmeans_clusters(
        embeddings, k=k, iters=iters, keep_vector=True, method=method
    ).persist()
    if method == "blas":
        return _cluster_kept_blas(clustered, threshold)
    a = clustered.select(
        F.col("vec_id").alias("id_a"), F.col("ev").alias("qv"), "cluster"
    )
    b = clustered.select(
        F.col("vec_id").alias("id_b"), F.col("ev").alias("cv"), "cluster"
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("id_b") < F.col("id_a"))
        .withColumn("cosine", F.round(F.expr(COS_EXPR), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        clustered.join(dropped, "vec_id", "left")
        .select("vec_id", "cluster", F.col("dup").isNull().alias("kept"))
    )
