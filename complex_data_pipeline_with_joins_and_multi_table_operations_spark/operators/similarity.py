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
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


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
    to :func:`_hyperplanes`. Capped at 63 planes by the long packing —
    use :func:`with_lsh_bands` for wider geometries."""
    if n_planes > 63:
        raise ValueError("packed signature holds <= 63 planes; use with_lsh_bands")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sig(ev):
        # self-contained: imports inside, no module globals
        import numpy as np
        import pandas as pd

        planes = (
            np.random.RandomState(seed).standard_normal((n_planes, dim)).round(6)
        )
        m = np.stack(ev.to_numpy())
        bits = (m @ planes.T) > 0
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
    :func:`with_lsh_signature` (one Arrow-batched matmul). Geometry can
    then scale with corpus size (r must track log2(√n)) past the point
    where a single packed long runs out of bits."""
    from pyspark.sql.functions import pandas_udf

    n_planes = n_bands * rows_per_band

    @pandas_udf("array<long>")
    def _bands(ev):
        # self-contained: imports inside, no module globals
        import numpy as np
        import pandas as pd

        planes = (
            np.random.RandomState(seed).standard_normal((n_planes, dim)).round(6)
        )
        m = np.stack(ev.to_numpy())
        bits = (m @ planes.T) > 0
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
