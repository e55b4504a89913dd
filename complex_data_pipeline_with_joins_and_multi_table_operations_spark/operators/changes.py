"""Change management for star schemas: SCD Type 2 history, MERGE upsert,
and incremental summary maintenance.

The reference's pipeline rebuilds its dimension and summary tables from
scratch every run (DimensionJob.scala:58,90 full overwrites;
AggregationJob.scala:53-90 re-aggregates the whole fact) — fine for a
monthly batch, wrong at 100 TB where a daily reload of an unchanged
dimension or a full fact re-scan per summary refresh dominates the
pipeline's cost. These operators are the standard warehouse answers,
expressed as pure DataFrame plans:

- :func:`scd2_history` — slowly-changing-dimension type 2: collapse a
  change stream into effective-dated attribute versions
  (valid_from/valid_to/is_current).
- :func:`merge_upsert` — MERGE INTO semantics (update matched, insert
  unmatched, optional delete) as a batch operator; pairs with
  ``sources.txlog.TableLog`` for a transactional MERGE on stored tables.
- :func:`merge_branches` — the full multi-branch MERGE grammar (ordered
  conditional WHEN MATCHED clauses, conditional INSERT, WHEN NOT MATCHED
  BY SOURCE UPDATE/DELETE) — Delta's CDC-apply statement shape.
- :func:`merge_partial_aggregates` — incremental summary maintenance:
  fold a new slice's partial aggregates into an existing summary without
  re-scanning history. Works for any decomposable measure (count/sum, and
  anything derivable from them: avg, rates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .aggregates import exact_sum


def scd2_history(
    changes: DataFrame,
    key: str,
    attr: str,
    order_by: list[str],
) -> DataFrame:
    """Slowly-changing-dimension Type 2 from a change stream.

    For each ``key``, consecutive events with the same ``attr`` collapse
    into one effective-dated version row: the attribute value, when it
    became effective (``valid_from``, the first ``order_by`` column's
    value), when it stopped (``valid_to``, the next version's
    ``valid_from``; null while current), a per-key ``version_no``, and
    ``is_current``.

    Physical shape: two Window passes over the SAME (partition, order) —
    Catalyst plans one Exchange on ``key``; the change-row filter between
    them preserves the distribution, so the second Window adds no
    shuffle. Null-safe change detection (``eqNullSafe``) means a null
    attribute value is a real version, not a perpetual change.

    ``order_by`` must be a deterministic total order within each key
    (e.g. ``["ts_us", "event_id"]``) or version boundaries are
    tie-dependent.
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    prev = F.lag(attr).over(w)
    is_change = F.row_number().over(w) == 1
    is_change = is_change | ~F.col(attr).eqNullSafe(prev)

    changes_only = (
        changes.select(key, attr, *order_by)
        .withColumn("__is_change", is_change)
        .filter("__is_change")
        .drop("__is_change")
    )
    valid_from = order_by[0]
    wv = Window.partitionBy(key).orderBy(*order_by)
    return (
        changes_only.withColumn("valid_from", F.col(valid_from))
        .withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn("version_no", F.row_number().over(wv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(*order_by)
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_condition: Column | None = None,
    insert_unmatched_deletes: bool = True,
    update_set: dict[str, str] | None = None,
    not_matched_by_source_delete: bool = False,
    not_matched_by_source_condition: Column | None = None,
    check_cardinality: bool = True,
) -> DataFrame:
    """MERGE INTO as a batch operator: WHEN MATCHED THEN UPDATE (source row
    wins), WHEN NOT MATCHED THEN INSERT, and optionally WHEN MATCHED AND
    ``delete_condition`` THEN DELETE (those source rows drop their target
    matches and are not inserted).

    SQL MERGE scopes the delete to the MATCHED branch only: a source row
    that satisfies ``delete_condition`` but matches nothing in the target
    still falls through to WHEN NOT MATCHED THEN INSERT. Delete-flagged
    rows therefore need a membership probe against the target keys —
    without it they would silently vanish instead of inserting.

    Plan shape: one left-anti join of target against source keys + a
    union — no full outer join, no row comparison; with a delete branch,
    one extra anti join of the (small) delete-flagged slice against the
    target keys. The anti joins broadcast when the source is small (the
    common dimension-trickle case); at comparable sizes they shuffle on
    the merge keys only once. Schemas must align by name
    (``unionByName``).

    ``insert_unmatched_deletes=False`` switches the unmatched-delete rule
    from SQL MERGE's (falls through to INSERT) to CDC apply's (a delete
    record for a key the table never had is a NO-OP) — and drops the
    membership probe with it.

    ``update_set`` (round 9 — the explicit-assignment MERGE form,
    ``WHEN MATCHED THEN UPDATE SET col = expr``): maps target columns to
    SQL expressions over the aliases ``t`` (the matched target row) and
    ``s`` (the source row); unlisted columns KEEP their target values —
    unlike the default source-wins ``SET *``. The matched branch then
    needs the target row's values, so it runs as one inner join of the
    target against the source on the merge keys (the anti-join shape of
    the default form cannot express it); the INSERT branch still takes
    source values wholesale. SQL MERGE's multiple-matches rule is
    enforced: duplicate source keys raise (with ``SET *`` they
    historically pass through; the explicit form would silently
    duplicate target rows, so it refuses like Delta does).
    """
    if update_set is not None:
        bad = [c for c in update_set if c not in target.columns]
        if bad:
            raise ValueError(
                f"UPDATE SET columns {bad} not in the target "
                f"(has {target.columns})"
            )
        if any(c in keys for c in update_set):
            raise ValueError(
                "UPDATE SET cannot assign a merge key (Delta/SQL MERGE "
                "restriction — reassigning keys makes matching ambiguous)"
            )
        if check_cardinality:
            check_merge_cardinality(target, source, keys)
    # anti-join on ALL source keys (delete rows included — their target
    # matches must disappear)
    all_keys = source.select(*keys).distinct()
    survivors = target.join(all_keys, keys, "left_anti")
    if not_matched_by_source_delete:
        # Delta's three-way merge (full-sync shape): target rows whose
        # keys are absent from the source DELETE — optionally only those
        # satisfying a condition over the TARGET row (SQL tri-state: a
        # NULL condition keeps the row, same as WHEN MATCHED AND)
        if not_matched_by_source_condition is not None:
            survivors = survivors.filter(
                ~F.coalesce(not_matched_by_source_condition, F.lit(False))
            )
        else:
            survivors = survivors.filter(F.lit(False))
    if delete_condition is not None:
        # SQL MERGE's WHEN MATCHED AND <cond> treats an unknown (NULL)
        # condition as false: those rows take the UPDATE/INSERT path, so
        # normalize once and branch on the same boolean both ways.
        cond = F.coalesce(delete_condition, F.lit(False))
        if insert_unmatched_deletes:
            # matched delete rows drop out entirely; UNMATCHED delete rows
            # are ordinary inserts (MERGE's delete gates only WHEN MATCHED).
            # The membership probe is a bare anti join — anti joins ignore
            # right-side duplicates, so no distinct pass over the target keys.
            del_rows = source.filter(cond)
            unmatched_del = del_rows.join(
                target.select(*keys), keys, "left_anti"
            )
            source = source.filter(~cond).unionByName(unmatched_del)
        else:
            source = source.filter(~cond)
    if update_set is None:
        return survivors.unionByName(source.select(*target.columns))
    # explicit-assignment matched branch: target ⋈ source on the keys,
    # assignments evaluated over the t/s aliases, unlisted columns keep
    # the target value; inserts are the source rows matching no target
    matched = (
        target.alias("t")
        .join(source.alias("s"), keys, "inner")
        .select(
            *[
                F.expr(update_set[c]).cast(
                    target.schema[c].dataType
                ).alias(c)
                if c in update_set
                else F.col(f"t.`{c}`").alias(c)
                for c in target.columns
            ]
        )
    )
    inserts = source.join(target.select(*keys), keys, "left_anti")
    return survivors.unionByName(matched).unionByName(
        inserts.select(*target.columns)
    )


def check_merge_cardinality(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> None:
    """SQL MERGE's cardinality rule, scoped the way Delta/SQL scope it
    (round 11): the statement errors only when multiple source rows
    MATCH THE SAME TARGET ROW — duplicate source keys that match no
    target row simply take the NOT MATCHED path (each inserts, exactly
    like Delta). Two-phase so the common case costs one tiny aggregate
    over the (trickle-sized) source and never touches the target: only
    if duplicated keys exist does a broadcast semi-probe of the target
    decide whether any of them actually matches."""
    dups = (
        source.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .select(*keys)
    )
    if not dups.take(1):
        return
    if target.join(F.broadcast(dups), keys, "left_semi").take(1):
        raise ValueError(
            "MERGE with matched clauses requires unique source keys "
            "among rows that match the target: multiple source rows "
            "matched the same target row (SQL MERGE cardinality "
            "violation)"
        )


def _clause_condition(cond: str | None) -> Column:
    """SQL MERGE tri-state rule: a missing condition is always-true, an
    UNKNOWN (NULL) condition is false."""
    if cond is None:
        return F.lit(True)
    return F.coalesce(F.expr(cond).cast("boolean"), F.lit(False))


def _first_match_branch(clauses: list[dict]) -> Column:
    """Index of the FIRST clause whose condition holds (SQL MERGE /
    Delta: clauses are evaluated in statement order, first match wins);
    NULL when none does."""
    out = None
    for i, cl in enumerate(clauses):
        c = _clause_condition(cl.get("condition"))
        out = F.when(c, F.lit(i)) if out is None else out.when(c, F.lit(i))
    if out is None:
        return F.lit(None).cast("int")
    return out.otherwise(F.lit(None).cast("int"))


def _clause_projection(
    clauses: list[dict],
    columns: list[str],
    schema,
    branch_col: str,
    qualified: bool,
    keep_cols: frozenset = frozenset(),
) -> list[Column]:
    """Per-column CASE over the branch index: each update clause's value
    for the winning branch, the pre-image otherwise. ``qualified=True``
    resolves against the ``t``/``s`` join aliases (matched clauses);
    ``False`` against bare target columns (NOT MATCHED BY SOURCE).
    ``keep_cols`` (round 11 — generated columns): columns that keep the
    target's pre-image even under ``SET *`` — identity values persist
    through source-wins updates, and computed columns are recomputed by
    the caller's post-pass, so the source need not carry either."""
    proj = []
    for c in columns:
        dt = schema[c].dataType
        w = None
        for i, cl in enumerate(clauses):
            if cl["action"] != "update":
                continue
            sets = cl.get("set")
            if qualified:
                if sets is None:  # SET * — source wins
                    if c in keep_cols:
                        continue
                    v = F.col(f"s.`{c}`").cast(dt)
                elif c in sets:
                    v = F.expr(sets[c]).cast(dt)
                else:
                    continue
            else:
                if c not in (sets or {}):
                    continue
                v = F.expr(sets[c]).cast(dt)
            cond_i = F.col(branch_col) == i
            w = F.when(cond_i, v) if w is None else w.when(cond_i, v)
        pre = F.col(f"t.`{c}`") if qualified else F.col(f"`{c}`")
        proj.append((w.otherwise(pre) if w is not None else pre).alias(c))
    return proj


def _validate_clauses(
    clauses: list[dict], target_cols: list[str], keys: list[str], kind: str
) -> None:
    for cl in clauses:
        action = cl.get("action")
        if action not in ("update", "delete"):
            raise ValueError(
                f"{kind} clause action must be 'update' or 'delete', "
                f"got {action!r}"
            )
        sets = cl.get("set")
        if action == "delete" and sets is not None:
            raise ValueError(f"{kind} DELETE clause cannot carry SET")
        if action == "update" and sets is not None:
            bad = [c for c in sets if c not in target_cols]
            if bad:
                raise ValueError(
                    f"{kind} UPDATE SET columns {bad} not in the target "
                    f"(has {target_cols})"
                )
            if any(c in keys for c in sets):
                raise ValueError(
                    "UPDATE SET cannot assign a merge key (Delta/SQL "
                    "MERGE restriction — reassigning keys makes matching "
                    "ambiguous)"
                )
        if action == "update" and sets is None and kind == "NOT MATCHED BY SOURCE":
            raise ValueError(
                "WHEN NOT MATCHED BY SOURCE THEN UPDATE requires explicit "
                "SET assignments (there is no source row to take * from)"
            )


def _insert_clauses(
    insert: bool,
    insert_condition: str | None,
    not_matched: list[dict] | None,
    target_cols: list[str],
) -> list[dict]:
    """Normalize the insert surface to an ordered clause list
    ``{"condition": sql|None, "set": {col: sql}|None}`` (``set=None`` =
    ``INSERT *``); the legacy ``insert``/``insert_condition`` pair maps
    to one clause. Column-list inserts NULL-fill unlisted columns
    (Delta semantics); unknown columns refuse."""
    if not_matched is not None:
        for cl in not_matched:
            sets = cl.get("set")
            if sets is not None:
                bad = [c for c in sets if c not in target_cols]
                if bad:
                    raise ValueError(
                        f"INSERT columns {bad} not in the target "
                        f"(has {target_cols})"
                    )
        return not_matched
    return [{"condition": insert_condition, "set": None}] if insert else []


def _insert_value(
    c: str,
    dt,
    sets: dict | None,
    defaults: dict[str, str] | None,
    generated_cols: frozenset = frozenset(),
) -> Column:
    """Value of one target column for one insert clause: ``sets=None``
    is ``INSERT *`` (source column wholesale); a listed column takes its
    VALUES expression — unless that expression is the bare ``DEFAULT``
    keyword (round 11, ANSI/Delta: the column's declared default); an
    UNLISTED column takes its declared default too (Delta fills
    defaults, not NULL) and only defaults-less columns NULL-fill.
    A GENERATED column (round 11) always inserts NULL here — the
    caller's post-pass recomputes computed columns and allocates
    identity values, so the source never needs to carry them."""
    if c in generated_cols:
        return F.lit(None).cast(dt)
    if sets is None:
        return F.col(f"s.`{c}`").cast(dt)  # INSERT *
    expr = sets.get(c)
    if expr is not None and expr.strip().upper() != "DEFAULT":
        return F.expr(expr).cast(dt)
    d = (defaults or {}).get(c)
    return (F.expr(d) if d is not None else F.lit(None)).cast(dt)


def merge_branches(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    matched: list[dict] | None = None,
    insert: bool = True,
    insert_condition: str | None = None,
    not_matched_by_source: list[dict] | None = None,
    not_matched: list[dict] | None = None,
    check_cardinality: bool = True,
    defaults: dict[str, str] | None = None,
    generated_cols: frozenset = frozenset(),
    with_changes: bool = False,
) -> DataFrame:
    """The FULL multi-branch MERGE (Delta's CDC-apply shape) as one batch
    operator::

        MERGE INTO t USING s ON <keys>
        {WHEN MATCHED [AND cond] THEN UPDATE SET (*|col=expr,…) | DELETE}*
        {WHEN NOT MATCHED [AND cond] THEN INSERT (*|(cols) VALUES (exprs))}*
        {WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET …|DELETE}*

    ``not_matched`` is the ordered insert-clause list
    ``{"condition": sql|None, "set": {col: sql}|None}`` (``set=None`` =
    ``INSERT *``; first-match-wins, a source row satisfying no clause is
    dropped); the legacy ``insert``/``insert_condition`` pair maps to
    one clause and is superseded when ``not_matched`` is given. A
    column-list insert fills each UNLISTED column with its declared
    default from ``defaults`` ({col: sql expr} — Delta's fill rule,
    round 11) and NULLs only the default-less ones; a VALUES expression
    that is the bare ``DEFAULT`` keyword resolves the same way (ANSI:
    no declared default means NULL).

    ``matched`` / ``not_matched_by_source`` are ordered lists of clause
    dicts ``{"action": "update"|"delete", "condition": sql|None,
    "set": {col: sql}|None}`` — ``set=None`` on an update means ``SET *``
    (source wins). Clause conditions and set expressions are SQL over the
    canonical aliases ``t`` (target row) and ``s`` (source row); NOT
    MATCHED BY SOURCE clauses see only the target row (bare column
    names). Per SQL/Delta semantics: clauses are evaluated IN ORDER and
    the first whose condition holds wins; a matched pair satisfying no
    clause keeps the target row unchanged; a NULL condition is false.

    Plan shape — scale notes for the 100 TB CDC apply: ONE inner equi-
    join of target×source on the merge keys evaluates every matched
    clause in a single projection (a CASE over the branch index per
    column — no per-clause join, no per-clause shuffle); unmatched target
    rows come from one anti join (none needed when a NOT MATCHED BY
    SOURCE clause exists: those are the same rows, filtered in the same
    pass); inserts are one anti join of the source. All three shuffle on
    the SAME keys, so AQE plans one exchange per side. The trickle-sized
    source broadcasts.

    Duplicate source keys raise (SQL MERGE cardinality violation) —
    scoped like Delta/SQL scope it (round 11): only duplicates whose
    key actually MATCHES a target row error; duplicated keys matching
    nothing each take the NOT MATCHED path and insert. With
    conditional or partial updates, two source rows hitting one target
    row would apply both or duplicate it — Delta refuses too.
    ``check_cardinality=False`` skips the probe when the caller already
    ran it (the txlog dv→CoW fallback re-enters here; re-checking would
    double the job).

    ``with_changes=True`` (round 11 — the CDF sidecar feed) returns
    ``(merged, changes)``: ``changes`` carries the exact change rows —
    table columns plus ``_change_type`` in {'insert', 'delete',
    'update_preimage', 'update_postimage'} — built from the SAME branch
    split in the same lineage, so evaluating it re-runs the join but
    can never disagree with ``merged`` for deterministic expressions.

    Reference analog: the upsert semantics implied by SDSIcebergWriter
    (IngestionJob.scala:80-84), generalized to the standard Delta/SQL
    multi-branch grammar.
    """
    matched = matched or []
    nmbs = not_matched_by_source or []
    _validate_clauses(matched, target.columns, keys, "MATCHED")
    _validate_clauses(nmbs, target.columns, keys, "NOT MATCHED BY SOURCE")
    if matched and check_cardinality:
        check_merge_cardinality(target, source, keys)

    out_parts: list[DataFrame] = []
    change_parts: list[DataFrame] = []

    def _tag(df: DataFrame, label: str) -> DataFrame:
        return df.withColumn("_change_type", F.lit(label))

    t_cols_pre = [F.col(f"t.`{c}`").alias(c) for c in target.columns]

    # ---- matched pairs: one join, branch index, one projection --------
    if matched:
        pairs = target.alias("t").join(source.alias("s"), keys, "inner")
        branch = _first_match_branch(matched)
        keep_idx = [
            i for i, cl in enumerate(matched) if cl["action"] == "update"
        ]
        # no-clause-matched pairs keep the target row (NULL branch ⇒
        # keep); delete-branch rows drop
        keep_cond = F.col("__m_branch").isNull()
        if keep_idx:
            keep_cond = keep_cond | F.col("__m_branch").isin(keep_idx)
        branched = pairs.withColumn("__m_branch", branch)
        kept = branched.filter(keep_cond)
        out_parts.append(
            kept.select(
                *_clause_projection(
                    matched, target.columns, target.schema,
                    "__m_branch", qualified=True,
                    keep_cols=generated_cols,
                )
            )
        )
        if with_changes:
            del_idx = [
                i
                for i, cl in enumerate(matched)
                if cl["action"] == "delete"
            ]
            if keep_idx:
                upd = branched.filter(F.col("__m_branch").isin(keep_idx))
                change_parts.append(
                    _tag(upd.select(*t_cols_pre), "update_preimage")
                )
                change_parts.append(
                    _tag(
                        upd.select(
                            *_clause_projection(
                                matched, target.columns, target.schema,
                                "__m_branch", qualified=True,
                                keep_cols=generated_cols,
                            )
                        ),
                        "update_postimage",
                    )
                )
            if del_idx:
                change_parts.append(
                    _tag(
                        branched.filter(
                            F.col("__m_branch").isin(del_idx)
                        ).select(*t_cols_pre),
                        "delete",
                    )
                )
        unmatched_target = target.join(
            source.select(*keys).distinct(), keys, "left_anti"
        )
    else:
        # no matched clause: every target row passes through untouched
        # (matched or not) — skip the join entirely unless NMBS needs
        # the matched/unmatched split
        unmatched_target = (
            target.join(source.select(*keys).distinct(), keys, "left_anti")
            if nmbs
            else None
        )
        if nmbs:
            out_parts.append(
                target.join(
                    source.select(*keys).distinct(), keys, "left_semi"
                )
            )
        else:
            out_parts.append(target)

    # ---- target rows unmatched by source -------------------------------
    if unmatched_target is not None:
        if nmbs:
            nbranch = _first_match_branch(nmbs)
            keep_idx = [
                i for i, cl in enumerate(nmbs) if cl["action"] == "update"
            ]
            keep_cond = F.col("__n_branch").isNull()
            if keep_idx:
                keep_cond = keep_cond | F.col("__n_branch").isin(keep_idx)
            nbranched = unmatched_target.withColumn("__n_branch", nbranch)
            rows = nbranched.filter(keep_cond)
            out_parts.append(
                rows.select(
                    *_clause_projection(
                        nmbs, target.columns, target.schema,
                        "__n_branch", qualified=False,
                    )
                )
            )
            if with_changes:
                n_del = [
                    i
                    for i, cl in enumerate(nmbs)
                    if cl["action"] == "delete"
                ]
                if keep_idx:
                    nupd = nbranched.filter(
                        F.col("__n_branch").isin(keep_idx)
                    )
                    change_parts.append(
                        _tag(
                            nupd.select(*target.columns),
                            "update_preimage",
                        )
                    )
                    change_parts.append(
                        _tag(
                            nupd.select(
                                *_clause_projection(
                                    nmbs, target.columns, target.schema,
                                    "__n_branch", qualified=False,
                                )
                            ),
                            "update_postimage",
                        )
                    )
                if n_del:
                    change_parts.append(
                        _tag(
                            nbranched.filter(
                                F.col("__n_branch").isin(n_del)
                            ).select(*target.columns),
                            "delete",
                        )
                    )
        else:
            out_parts.append(unmatched_target)

    # ---- inserts --------------------------------------------------------
    # ordered conditional insert clauses (round 10: column-list VALUES
    # too), first-match-wins; an unmatched source row satisfying no
    # clause is dropped. Aliased so conditions/values say s.<col>.
    nm = _insert_clauses(insert, insert_condition, not_matched, target.columns)
    if nm:
        inserts = source.alias("s").join(
            target.select(*keys), keys, "left_anti"
        )
        ibranch = _first_match_branch(nm)
        inserts = inserts.withColumn("__i_branch", ibranch).filter(
            F.col("__i_branch").isNotNull()
        )
        proj = []
        for c in target.columns:
            dt = target.schema[c].dataType
            w = None
            for i, cl in enumerate(nm):
                v = _insert_value(
                    c, dt, cl.get("set"), defaults, generated_cols
                )
                cond_i = F.col("__i_branch") == i
                w = F.when(cond_i, v) if w is None else w.when(cond_i, v)
            proj.append(w.alias(c))
        ins_rows = inserts.select(*proj)
        out_parts.append(ins_rows)
        if with_changes:
            change_parts.append(_tag(ins_rows, "insert"))

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    if not with_changes:
        return out
    if change_parts:
        changes = change_parts[0]
        for p in change_parts[1:]:
            changes = changes.unionByName(p)
    else:
        changes = out.limit(0).withColumn("_change_type", F.lit(None).cast("string"))
    return out, changes


def merge_partial_aggregates(
    summary: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str = "cnt",
    sum_cols: dict[str, int] | None = None,
) -> DataFrame:
    """Fold a new data slice into an existing additive summary without
    re-scanning history — the incremental-view-maintenance upgrade of the
    reference's recompute-everything AggregationJob.

    ``summary`` holds per-``keys`` partial states: ``count_col`` plus one
    exact-decimal sum per entry of ``sum_cols`` ({column: decimal scale},
    the engine's deterministic money-math grid). ``delta`` is RAW new
    rows; it is aggregated to the same partial states (one shuffle over
    the delta only) and combined: counts add, sums add. Non-decomposable
    derivations (avg = sum/count) belong downstream of the merged state.

    The merged result is bit-identical to aggregating history+delta from
    scratch — asserted by the ``incremental_agg`` oracle query, which
    recomputes from scratch in DuckDB.
    """
    sum_cols = sum_cols or {}
    delta_summary = delta.groupBy(*keys).agg(
        F.count("*").alias(count_col),
        *[exact_sum(c, s).alias(c) for c, s in sum_cols.items()],
    )
    return (
        summary.unionByName(delta_summary)
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            # partial sums are already on the value grid: re-summing them
            # through the same decimal cast stays exact
            *[exact_sum(c, s).alias(c) for c, s in sum_cols.items()],
        )
    )


def apply_changes_to_summary(
    summary: DataFrame,
    changes: DataFrame,
    keys: list[str],
    count_col: str = "cnt",
    sum_cols: dict[str, int] | None = None,
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Incremental view maintenance driven by a change data feed
    (``sources/txlog.py::table_changes``): inserts fold in as positive
    partial aggregates, deletes as NEGATIVE ones, so an additive summary
    tracks a table through overwrites and replaces without ever
    re-scanning it — :func:`merge_partial_aggregates` extended from
    append-only deltas to full CDC.

    Same contracts: decomposable measures only (count/sum and anything
    derived downstream), exact-decimal sums so the fold is
    order-independent and bit-equal to a from-scratch recompute (asserted
    in tests against exactly that). Groups whose count reaches zero are
    dropped — matching what the recompute never produces.
    """
    sum_cols = sum_cols or {}
    # update images (round 11) fold as their additive equivalents:
    # pre-image = the replaced version leaving (−1), post-image = the
    # new version arriving (+1) — identical to the delete+insert pair
    # the pre-round-11 file-granularity feed emitted for the same update
    sign = F.when(
        F.col(change_type_col).isin("delete", "update_preimage"),
        F.lit(-1),
    ).otherwise(F.lit(1))
    delta = changes.withColumn("__sign", sign)
    delta_summary = delta.groupBy(*keys).agg(
        F.sum("__sign").alias(count_col),
        *[
            F.sum(
                (F.col(c) * F.col("__sign")).cast(f"decimal(28,{s})")
            ).cast("double").alias(c)
            for c, s in sum_cols.items()
        ],
    )
    merged = (
        summary.unionByName(delta_summary)
        .groupBy(*keys)
        .agg(
            F.sum(count_col).alias(count_col),
            *[exact_sum(c, s).alias(c) for c, s in sum_cols.items()],
        )
    )
    return merged.filter(F.col(count_col) != 0)


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    from_col: str,
    attr_cols: list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Point-in-time (temporal) join: enrich each fact row with the SCD2
    dimension version that was effective at the fact's timestamp.

    The naive formulation — equi-join on ``key`` plus a
    ``valid_from <= ts < valid_to`` range filter — materializes
    facts × versions-per-key intermediate rows before filtering; with a
    hot key carrying hundreds of versions that blows up the shuffle at
    100 TB. This operator instead uses the union-sort shape: dimension
    version rows are interleaved with fact rows on ``(key, ts)`` and each
    fact picks up the most recent version via ``last(..., ignorenulls)``
    over a running frame — ONE shuffle on ``key``, output exactly
    |facts| rows, no multiplicative intermediate. SCD2 versions are
    contiguous (``valid_to`` = next ``valid_from``), so most-recent-start
    is exactly the effective version; a version starting at the fact's
    own timestamp applies (dim rows sort before fact rows on ties).

    Facts with no version yet (before the key's first ``valid_from``, or
    an unknown key) get null attributes — left-join semantics. Attributes
    ride in ONE struct so a legitimately-null attribute value inside a
    version survives (per-column ``last(ignorenulls)`` would skip it and
    resurrect the previous version's value).

    ``seq_col`` (e.g. SCD2's ``version_no``) orders dim versions that
    share a ``valid_from`` timestamp: the later version wins, matching
    the range formulation where the earlier one is zero-width and
    matches nothing. Without it, same-timestamp versions would leave the
    winner tie-dependent.
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols]).alias("__pit")
    dim_tagged = dim.select(
        F.col(key),
        F.col(from_col).alias(ts_col),
        attrs,
        F.lit(1).alias("__is_dim"),
        *(
            [F.col(seq_col).cast("long").alias("__seq")]
            if seq_col
            else [F.lit(0).cast("long").alias("__seq")]
        ),
    )
    facts_tagged = (
        facts.withColumn(
            "__pit", F.lit(None).cast(dim_tagged.schema["__pit"].dataType)
        )
        .withColumn("__is_dim", F.lit(0))
        .withColumn("__seq", F.lit(None).cast("long"))
    )

    merged = facts_tagged.unionByName(dim_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(ts_col), F.col("__is_dim").desc(), F.asc_nulls_first("__seq")
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = merged.withColumn("__eff", F.last("__pit", ignorenulls=True).over(w))
    return (
        enriched.filter(F.col("__is_dim") == 0)
        .select(
            *facts.columns,
            *[F.col(f"__eff.{c}").alias(f"dim_{c}") for c in attr_cols],
        )
    )
