"""Model-based curation: distributed classifier training + scoring over
the embedding corpus.

The modern pretraining-curation loop scores documents with a LEARNED
model (a small classifier over embeddings — the FineWeb-Edu recipe), not
only heuristics. This module supplies that component in the engine's
determinism discipline: full-batch gradient-descent logistic regression
whose every iteration is bit-reproducible AND mirrorable by a SQL
oracle, the supervised counterpart of :func:`similarity.kmeans_clusters`
(which proved the pattern for unsupervised training).

Determinism recipe (same three moves as k-means, plus one):

- the margin ``z`` is a sequential left fold over the (1 ⊕ x) · w
  products — array-ordered, partition-invariant, op-for-op identical to
  DuckDB's ``list_reduce`` (0.0-seeded);
- the activation is **quantized**: ``p = round(sigmoid(z), 6)``. libm
  ``exp`` is NOT bit-identical across engines (JVM vs DuckDB differ in
  the last ulp), so raw sigmoid values would poison the gradient sums;
  the 1e-6 grid absorbs ulp noise (a flip needs the true value within
  ~1e-16 of a grid boundary — odds ~1e-10 per term) and costs nothing
  against fp32 embeddings;
- gradient components sum through DECIMAL(28,14) — order-independent
  across the shuffle, so the update is partition-invariant;
- the weight vector is driver-side metadata (d+1 doubles) between
  iterations, exactly like the k-means centroids: each iteration is ONE
  job (scan → fold margin → quantized residual → d+1 partial decimal
  sums), no vector ever reaches the driver.

100 TB shape: per iteration the shuffle carries d+1 partial states after
map-side combine; weights broadcast in the closure as literals. The fold
margin evaluates interpreted (HOFs are outside codegen) — at probe scale
that is the measured-but-acceptable cost, and the refine-and-verify GEMM
twin (`similarity._assign_blas` pattern) is the documented upgrade path
when n·d·iters turns hot.

Reference parity note: the reference pipeline has no model-based
filtering; this extends SURVEY §2's north-star set (quality scoring)
with its learned form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_features(embeddings: DataFrame, target_label: int) -> DataFrame:
    """(vec_id, label, y, xv): binary target + the 1-prepended feature
    vector (intercept as feature 0, so the gradient job needs no special
    case)."""
    return (
        embeddings.filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            "label",
            (F.col("label") == target_label).cast("double").alias("y"),
            F.expr(
                "concat(array(CAST(1.0 AS DOUBLE)), CAST(embedding AS ARRAY<DOUBLE>))"
            ).alias("xv"),
        )
    )


def _margin_expr(w: list[float]) -> str:
    """z = sequential fold of xv · w (0.0-seeded, array order) — the op
    sequence DuckDB's list_reduce(list_prepend(0.0, …)) mirrors. Weight
    literals are shortest-round-trip reprs: both engines' literal
    parsers are correctly-rounded, so the closure's doubles reconstruct
    exactly."""
    arr = ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in w)
    return (
        f"aggregate(zip_with(xv, array({arr}), (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
    )


def _with_margins_blas(x: DataFrame, w: list[float]) -> DataFrame:
    """GEMM refine-and-verify twin of ``_margin_expr``: appends a ``z``
    column such that ``round(sigmoid(z), 6)`` is BIT-IDENTICAL to the
    fold form's quantized activation for every row.

    The contract (the `similarity._assign_blas` pattern): one blocked
    matmul nominates z for the whole batch; a row is trusted only when
    its sigmoid sits FURTHER from the nearest 1e-6 rounding boundary
    than the provable GEMM-vs-fold error (reassociation, bounded by
    ~4·d·eps·(Σ|x_j·w_j| + |z|), times the sigmoid Lipschitz 1/4, plus a
    cushion for the numpy-vs-JVM exp ulp in the margin TEST itself).
    Ambiguous rows — sigmoid within that margin of a boundary — are
    re-decided in Python by the EXACT sequential fold (multiply then
    left-accumulate over IEEE doubles, op for op the
    aggregate(zip_with(...)) sequence), after which their z is
    bit-equal to the fold z, so any downstream sigmoid/round agrees by
    identity. sigmoid+round themselves are NOT computed here: the
    caller evaluates them JVM-side on z, so libm differences between
    engines never enter the data path. Ambiguity needs a sigmoid within
    ~1e-12 of a grid boundary — a handful of rows while BLAS does the
    n·d work."""
    spark = x.sparkSession
    import numpy as np

    wv = np.array([float(v) for v in w], dtype="float64")
    bcast = spark.sparkContext.broadcast(wv)
    pass_cols = x.columns
    pass_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in x.schema.fields
    )

    def _gen(batches):
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

        wv_c = bcast.value
        aw = np.abs(wv_c)
        eps = float(np.finfo("float64").eps)
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            n = batch.num_rows
            if n == 0:
                continue
            xv = np.asarray(
                tbl.column("xv").combine_chunks().flatten()
            ).reshape(n, -1)
            z = xv @ wv_c
            amag = np.abs(xv) @ aw
            err = 4.0 * xv.shape[1] * eps * (amag + np.abs(z))
            with np.errstate(over="ignore"):
                s = 1.0 / (1.0 + np.exp(-z))
            t = s * 1e6
            dist = np.abs(t - (np.floor(t) + 0.5)) * 1e-6
            ambiguous = ~(dist > 0.25 * err + 1e-12)  # NaN-safe: NaN -> True
            for i in np.nonzero(ambiguous)[0]:
                # the exact fold: term multiply then left accumulation in
                # array order — the very op sequence of the SQL
                # aggregate(zip_with(xv, w, (x, y) -> x * y), 0.0, +)
                acc = 0.0
                row = xv[i]
                for j in range(row.shape[0]):
                    acc = acc + (row[j] * wv_c[j])
                z[i] = acc
            yield pa.RecordBatch.from_arrays(
                [tbl.column(c).combine_chunks() for c in pass_cols]
                + [pa.array(z, pa.float64())],
                pass_cols + ["z"],
            )

    return x.mapInArrow(_gen, f"{pass_schema}, z double")


_SIGMOID_Z = "round(1.0 / (1.0 + exp(-z)), 6)"


def logreg_train(
    embeddings: DataFrame,
    target_label: int = 0,
    iters: int = 3,
    lr: float = 2.0,
    via: str = "blas",
    features: DataFrame | None = None,
) -> list[float]:
    """Full-batch GD logistic regression for ``P(label == target_label)``
    over the embedding corpus; returns the trained weights (intercept
    first, d+1 doubles — driver-side metadata, the same thing a model
    registry would store). Deterministic per the module recipe, so the
    whole training run unrolls into the SQL oracle (`_logreg_sql` in
    plans/registry.py).

    ``via="blas"`` (default) computes the margin through the GEMM
    refine-and-verify twin — bit-identical weights (asserted in tests),
    ~n·d interpreted lambda terms per pass replaced by one Arrow-batched
    matmul; ``via="fold"`` keeps the original all-SQL form the oracle
    mirrors op for op."""
    # ``features``: a caller that also SCORES the same relation
    # (classifier_scores) passes one persisted copy and owns its
    # lifecycle — train and score then share a single cached derivation
    # instead of re-running scan → feature projection for each.
    own_x = features is None
    x = (
        _with_features(embeddings, target_label).persist()
        if own_x
        else features
    )
    try:
        # ONE materializing job for both scalars (count + feature width);
        # the old count()-then-head() shape paid a second job just to
        # read the dimension off an already-cached relation
        n, dim = x.agg(
            F.count(F.lit(1)), F.first(F.size("xv"))
        ).head()
        w = [0.0] * dim
        for _ in range(iters):
            if via == "blas":
                scored = _with_margins_blas(x.select("y", "xv"), w)
                p = F.expr(_SIGMOID_Z)
            else:
                scored = x
                p = F.expr(f"round(1.0 / (1.0 + exp(-({_margin_expr(w)}))), 6)")
            grads = (
                scored.select(
                    (p - F.col("y")).alias("r"),
                    F.posexplode("xv").alias("pos", "v"),
                )
                .groupBy("pos")
                .agg(
                    F.sum((F.col("r") * F.col("v")).cast("decimal(28,14)"))
                    .cast("double")
                    .alias("gsum")
                )
                .collect()
            )
            by_pos = {r.pos: r.gsum for r in grads}
            w = [w[j] - lr * (by_pos[j] / n) for j in range(dim)]
        return w
    finally:
        if own_x:
            x.unpersist()


def logreg_score(
    embeddings: DataFrame,
    w: list[float],
    target_label: int = 0,
    via: str = "fold",
    features: DataFrame | None = None,
) -> DataFrame:
    """Scoring under trained weights: (vec_id, label, score, pred).

    ``via="fold"`` (default) is the scan-local all-SQL form: weights
    ride as literals — no join, no shuffle, pure JVM, and a filter on
    ``score`` pushes to the scan. Scoring is ONE pass, where the
    interpreted fold beats the Arrow round-trip at every measured scale
    (sf10: 0.25 s fold vs 0.56 s blas); training is where the fold
    loses (iters passes — `logreg_train` defaults to the GEMM twin,
    21.6 s -> 6.0 s at sf10). ``via="blas"`` nominates the margin with
    one Arrow-batched matmul (the `_with_margins_blas` contract —
    bit-identical scores) for when d grows past the fold's comfort."""
    x = (
        _with_features(embeddings, target_label)
        if features is None
        else features
    )
    if via == "blas":
        scored = _with_margins_blas(x, w).withColumn(
            "score", F.expr(_SIGMOID_Z)
        )
    else:
        score = F.expr(f"round(1.0 / (1.0 + exp(-({_margin_expr(w)}))), 6)")
        scored = x.withColumn("score", score)
    return scored.select(
        "vec_id",
        "label",
        "score",
        (F.col("score") >= 0.5).cast("int").alias("pred"),
    )


def classifier_scores(
    embeddings: DataFrame,
    target_label: int = 0,
    iters: int = 3,
    lr: float = 2.0,
) -> DataFrame:
    """Train-then-score in one call — the registry/oracle surface. A
    production pipeline splits this exactly like PQ (train once, persist
    weights, score many — :func:`model_build` / :func:`model_score`);
    fused here so the driver's hash check covers the ENTIRE training
    trajectory, not just the final scores."""
    # ONE persisted feature relation serves training's (iters + 1) jobs
    # AND the scoring pass — the scan → concat projection used to run
    # once more for the score. No owner unpersists it (the returned plan
    # reads it lazily); the session's cache policy releases it, same as
    # the LSH signature persists.
    x = _with_features(embeddings, target_label).persist()
    w = logreg_train(embeddings, target_label, iters, lr, features=x)
    return logreg_score(embeddings, w, target_label, features=x)


def model_build(
    embeddings: DataFrame,
    root: str,
    target_label: int = 0,
    iters: int = 3,
    lr: float = 2.0,
) -> str:
    """Train-once half of the production split (the pq_index_build
    pattern): train and persist the weights as a transaction-log table
    ``(j, val)`` — versioned model registry for free: re-training after
    a corpus append commits a new snapshot, and scoring pinned with
    ``versionAsOf`` keeps reproducing its original outputs. Returns the
    model table path."""
    from ..sources.txlog import TableLog

    w = logreg_train(embeddings, target_label, iters, lr)
    spark = embeddings.sparkSession
    model = spark.createDataFrame(
        [(j, float(v)) for j, v in enumerate(w)], "j int, val double"
    )
    TableLog(spark, root).write(model, mode="overwrite")
    return root


def model_score(
    embeddings: DataFrame, root: str, target_label: int = 0
) -> DataFrame:
    """Score-many half: read the persisted weights back (parquet
    round-trips doubles exactly, so scores are bit-equal to the fused
    form — asserted in tests) and score scan-locally."""
    from ..sources.txlog import TableLog

    rows = TableLog(embeddings.sparkSession, root).read().collect()
    w = [r.val for r in sorted(rows, key=lambda r: r.j)]
    return logreg_score(embeddings, w, target_label)
