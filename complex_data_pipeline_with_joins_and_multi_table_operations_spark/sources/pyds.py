"""Spark-native access to the transaction-log table format: a Python
DataSource (Spark 4 ``pyspark.sql.datasource`` API) named ``txlog``.

`sources/txlog.py` implements the commit-log format itself (Delta-paper
architecture: immutable parquet + JSON commit log). This module makes that
format a *first-class Spark source*, closing the surface gap with the
reference's Iceberg tables (reference IngestionJob.scala:15-19,
README.md:143-154 — `VERSION AS OF` verification):

- **batch read**   ``spark.read.format("txlog").option("versionAsOf", 3)
  .load(path)`` — for SQL, ``load(...).createOrReplaceTempView(...)``
  (Spark's ``SELECT … FROM format.`/path``` direct-query sugar is
  JVM-sources-only as of 4.1).
- **filter pushdown** — Spark pushes its data filters into the source
  (``spark.sql.python.filterPushdown.enabled``); we translate them into
  log-metadata file pruning (partition values exact, footer min/max
  conservative) so skipped files are never listed, never opened, and never
  reach a Python worker. All filters are reported back as unhandled, so
  Spark still re-applies them — skipping is an I/O win, never a
  correctness dependency (same contract as Iceberg manifest pruning).
- **batch write**  ``df.write.format("txlog").mode("append"|"overwrite")
  .save(path)`` — each task streams its Arrow batches straight into an
  immutable data file and harvests that file's footer stats *on the
  executor* (distributed stats, no driver re-read); the driver turns task
  commit messages into ONE atomic log commit. A failed/speculated task's
  file is simply never committed (and is deleted on abort) — the
  classic write-audit-publish pattern, exactly-once per Spark's commit
  protocol.
- **streaming read** ``spark.readStream.format("txlog").load(path)`` —
  tails the commit log: offsets are table versions, each microbatch is
  the add-actions of the commits in ``(start, end]``. The Delta-style CDC
  ingestion surface: downstream pipelines consume appends incrementally
  with exactly-once semantics from the sink's checkpoint. OPTIMIZE
  commits carry ``dataChange=false`` (Delta protocol semantics) and are
  skipped silently — a routine compaction never kills or double-feeds a
  stream; other non-append commits (overwrite/replace/row ops) fail the
  stream unless ``ignoreChanges=true``, mirroring Delta's guardrail.
  Options (Delta parity): ``startingVersion`` / ``startingTimestamp``
  (stream commits strictly after the resolved point), and
  ``maxFilesPerTrigger`` (each microbatch ends at the largest version
  whose cumulative adds fit the cap, always >= 1 commit forward — note
  that Trigger.AvailableNow captures ONE capped offset per run with this
  python API, so a capped availableNow run drains up to the cap and
  stops checkpoint-consistent; use a processing-time trigger for
  continuous capped draining).

Scale notes: partitions are one-per-data-file, so read parallelism tracks
the file count; pruning happens on log metadata only (O(active files),
checkpoint-bounded). The Python DS read path moves data through Arrow in
Python workers — for JVM-only plans `TableLog.read()` (a parquet scan over
the pruned file list) stays the fast path; this source is the
interoperability surface (SQL access, streaming tail, third-party tools).
On a real cluster, ship the package via ``--py-files`` so executors can
unpickle the source class (local mode inherits PYTHONPATH from
`get_spark`).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from typing import TYPE_CHECKING, Any, Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

FORMAT_NAME = "txlog"


def register_txlog(spark) -> None:
    """Register the ``txlog`` format on this session (idempotent)."""
    spark.dataSource.register(TxLogDataSource)


# ---------------------------------------------------------------------------
# filter translation (driver-side, pure — unit-tested directly)

_OPS = {
    EqualTo: "==",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}

# NOT over a single-term filter negates the op (round 9) — the same
# negation table the SQL WHERE parser uses; NULL semantics are preserved
# because both sides of each pair are null-unsafe (NULL input selects
# nothing either way).
_NEG = {
    "==": "!=", "!=": "==", "<": ">=", "<=": ">", ">": "<=", ">=": "<",
    "in": "notin", "notin": "in", "isnull": "notnull", "notnull": "isnull",
}


def _translate_one(f: Filter) -> tuple | None:
    """One Spark filter -> one txlog pruning term, or None (keep file)."""
    from pyspark.sql.datasource import IsNotNull, IsNull, Not

    if isinstance(f, Not):
        inner = _translate_one(f.child)
        if inner is None or inner[1] not in _NEG:
            return None
        return (inner[0], _NEG[inner[1]], inner[2])
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None  # nested column — no scalar stats
    col = attr[0]
    op = _OPS.get(type(f))
    if op is not None:
        return (col, op, f.value) if f.value is not None else None
    if isinstance(f, In):
        # None members never match rows (x IN (…, NULL) is never TRUE),
        # so dropping them keeps membership pruning exact
        vals = tuple(v for v in f.value if v is not None)
        return (col, "in", vals) if vals else None
    if isinstance(f, IsNull):
        return (col, "isnull", None)
    if isinstance(f, IsNotNull):
        return (col, "notnull", None)
    return None


def translate_filters(filters: Sequence[Filter]) -> list[tuple]:
    """Spark pushed filters -> txlog ``(col, op, value)`` pruning tuples.

    Top-level-column comparisons, ``In`` (true membership pruning),
    ``IsNull``/``IsNotNull`` (null-count pruning), and ``Not`` over any
    of them translate; anything else is skipped (file kept —
    conservative)."""
    out: list[tuple] = []
    for f in filters:
        t = _translate_one(f)
        if t is not None:
            out.append(t)
    return out


# ---------------------------------------------------------------------------
# shared executor-side file reader

def _read_file_as_batches(
    data_dir: str,
    meta: dict,
    schema_json: str,
    mapping: dict | None = None,
    dv_positions: list[int] | None = None,
    take_positions: list[int] | None = None,
) -> Iterator["pa.RecordBatch"]:
    """Read one immutable data file and yield Arrow batches matching the
    snapshot schema exactly: partition columns (absent from the file, held
    as strings in the commit log) are re-materialized as typed constants,
    and physical types (int32 vs int64 etc.) are cast to the logical ones.
    Runs inside a Python worker — stdlib + pyarrow + pyspark only.

    ``dv_positions`` DROPS the given file-global row positions (deletion
    vector masking); ``take_positions`` keeps ONLY them (the change-feed
    reader emitting a dv commit's masked rows as delete/pre-images) —
    mutually exclusive.
    """
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType as _StructType

    if dv_positions and take_positions:
        raise ValueError("pass dv_positions or take_positions, not both")
    target = to_arrow_schema(_StructType.fromJson(_json.loads(schema_json)))
    mapping = mapping or {}  # column mapping: files/dirs spell PHYSICAL names
    pvals = meta.get("partition_values", {})
    pf = pq.ParquetFile(os.path.join(data_dir, meta["path"]))
    dv = sorted(dv_positions) if dv_positions else None
    take = sorted(take_positions) if take_positions else None
    offset = 0
    for batch in pf.iter_batches():
        n = batch.num_rows
        if dv is not None or take is not None:
            # positional slice against file-global row_index
            # ∈ [offset, offset+n)
            import bisect as _bisect

            pos = dv if dv is not None else take
            lo = _bisect.bisect_left(pos, offset)
            hi = _bisect.bisect_left(pos, offset + n)
            local = [p - offset for p in pos[lo:hi]]
            offset += n
            if take is not None:
                if not local:
                    continue
                batch = batch.take(pa.array(local, pa.int64()))
                n = batch.num_rows
            elif local:
                mask = [True] * n
                for p in local:
                    mask[p] = False
                batch = batch.filter(pa.array(mask))
                n = batch.num_rows
                if n == 0:
                    continue
        arrays, names = [], []
        present = set(batch.schema.names)
        for fld in target:
            pname = mapping.get(fld.name, fld.name)
            if pname in present:
                arr = batch.column(batch.schema.get_field_index(pname))
            elif pname in pvals:
                v = pvals[pname]
                arr = (
                    pa.nulls(n, fld.type)
                    if v is None
                    else pa.array([v] * n, pa.string()).cast(fld.type)
                )
            else:  # column added after this file was written — nulls
                arr = pa.nulls(n, fld.type)
            arrays.append(arr)
            names.append(fld.name)
        tbl = pa.Table.from_arrays(arrays, names=names).cast(target)
        yield from tbl.to_batches()


# ---------------------------------------------------------------------------
# batch read

class _FilePartition(InputPartition):
    def __init__(self, meta: dict):
        self.meta = meta


class TxLogBatchReader(DataSourceReader):
    def __init__(
        self,
        root: str,
        schema_json: str,
        metas: list[dict],
        mapping: dict | None = None,
        dvs: dict | None = None,
    ):
        self.data_dir = os.path.join(root, "data")
        self.schema_json = schema_json
        self.metas = metas
        self.mapping = mapping or {}
        self.dvs = dvs or {}

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        prune = translate_filters(filters)
        if prune:
            from .txlog import _may_match, _physical_filters

            prune = _physical_filters(prune, self.mapping)
            self.metas = [
                m
                for m in self.metas
                if all(_may_match(m, f, self.data_dir) for f in prune)
            ]
        # report every filter unhandled: Spark re-applies them post-scan,
        # so pruning can never change results — only skip dead I/O
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(m) for m in self.metas]

    def read(self, partition: _FilePartition) -> Iterator["pa.RecordBatch"]:
        yield from _read_file_as_batches(
            self.data_dir,
            partition.meta,
            self.schema_json,
            self.mapping,
            self.dvs.get(partition.meta["path"]),
        )


# ---------------------------------------------------------------------------
# batch write (write-audit-publish: files land invisibly, one log commit
# publishes them; abort deletes the orphans)

@dataclass
class TxLogWriteMessage(WriterCommitMessage):
    path: str
    rows: int
    bytes: int
    stats: dict
    bloom: dict | None = None


class TxLogBatchWriter(DataSourceArrowWriter):
    def __init__(
        self,
        root: str,
        schema_json: str,
        overwrite: bool,
        mapping: dict | None = None,
        dropped: list | None = None,
        constraints: dict | None = None,
        bloom_cols: list | None = None,
    ):
        self.root = root
        self.schema_json = schema_json
        self.overwrite = overwrite
        # column mapping captured at writer construction: appends must
        # spell columns by their FROZEN physical names (an overwrite
        # redefines the schema wholesale, so its writer gets {}/[])
        self.mapping = mapping or {}
        self.dropped = dropped or []
        # CHECK constraints captured at writer construction: the commit
        # carries them forward (overwrite included), so the DataSource
        # path must enforce them like TableLog.write. No SparkSession
        # exists in the DataSource python worker, so enforcement runs
        # EXECUTOR-SIDE per Arrow batch (duckdb evaluates the CHECK
        # expression — same NULL-passes tri-state); commit() treats a
        # constraint set that changed since capture as a concurrency
        # race, mirroring the rename/drop guards
        self.constraints = constraints or {}
        # Bloom property captured at writer construction (PHYSICAL names —
        # files and probes both spell physical): each task folds its own
        # file's bitmap while streaming batches, so DataSource-written
        # files stay equality-skippable like TableLog-staged ones
        m = mapping or {}
        self.bloom_cols = [m.get(c, c) for c in (bloom_cols or [])]

    def write(self, iterator: Iterator["pa.RecordBatch"]) -> TxLogWriteMessage:
        """Executor-side: stream this task's batches into one immutable
        parquet file under data/, then harvest ITS footer stats right here
        — the stats work distributes with the write instead of a driver
        re-read of every footer. Bloom bitmaps (when the table opted in)
        fold per batch in the same pass."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .txlog import (
            _BLOOM_INLINE_MAX,
            _BLOOM_K,
            _bloom_m_for,
            _bloom_render,
            _bloom_sidecar_rel,
            _file_stats,
            _murmur3_bytes,
            _murmur3_int,
        )

        rel = f"part-{uuid.uuid4().hex}.parquet"
        dest = os.path.join(self.root, "data", rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        check_sql = None
        if self.constraints:
            # one streaming pass per batch, all constraints in one query;
            # NULL passes, FALSE violates (SQL CHECK tri-state). Raising
            # here fails the task -> Spark aborts the write -> abort()
            # unlinks every staged file: nothing is committed.
            names = list(self.constraints)
            check_sql = "SELECT " + ", ".join(
                f"count(*) FILTER (WHERE NOT coalesce(({self.constraints[n]}),"
                f" TRUE)) AS c{i}"
                for i, n in enumerate(names)
            ) + " FROM batch"
        writer = None
        rows = 0
        con = None
        # adaptive per-file bloom: a file's m must be sized to its value
        # count, which is only known at close — so the streaming pass
        # accumulates the DISTINCT 32-bit hash words (bounded by
        # 4 x distinct values) and the bitmap is folded mod m at the end
        bloom_hashes: dict[str, set] = {c: set() for c in self.bloom_cols}
        try:
            for batch in iterator:
                if check_sql is not None:
                    import duckdb

                    from .txlog import ConstraintViolationError

                    if con is None:  # ONE connection per write task
                        con = duckdb.connect()
                    con.register("batch", pa.Table.from_batches([batch]))
                    counts = con.execute(check_sql).fetchone()
                    bad = {
                        n: counts[i]
                        for i, n in enumerate(self.constraints)
                        if counts[i]
                    }
                    if bad:
                        detail = ", ".join(
                            f"{n} ({self.constraints[n]!r}): {c} rows"
                            for n, c in bad.items()
                        )
                        raise ConstraintViolationError(
                            f"format('txlog') write into {self.root} "
                            f"violates CHECK constraints — {detail}; "
                            "nothing was committed"
                        )
                if self.mapping:
                    # logical -> frozen physical names (zero-copy)
                    batch = pa.RecordBatch.from_arrays(
                        list(batch.columns),
                        names=[
                            self.mapping.get(n, n)
                            for n in batch.schema.names
                        ],
                    )
                if bloom_hashes:
                    # same Spark-Murmur3-over-rendering hash as the
                    # round-10 Spark-side harvest (_harvest_blooms, h=m3)
                    # — the bitmaps must agree with the driver probe's
                    # _bloom_positions_m3 exactly
                    names = batch.schema.names
                    for c, acc in bloom_hashes.items():
                        if c not in names:
                            continue  # absent column reads all-NULL
                        for v in batch.column(names.index(c)).to_pylist():
                            s = _bloom_render(v)
                            if s is None:
                                continue
                            base = _murmur3_bytes(s.encode("utf-8"), 42)
                            for i in range(_BLOOM_K):
                                acc.add(_murmur3_int(i, base))
                if writer is None:
                    writer = pq.ParquetWriter(dest, batch.schema)
                writer.write_table(pa.Table.from_batches([batch]))
                rows += batch.num_rows
        finally:
            if con is not None:
                con.close()
            if writer is not None:
                writer.close()
        if writer is None:  # empty task — nothing to publish
            return TxLogWriteMessage(path="", rows=0, bytes=0, stats={})
        stats, _ = _file_stats(dest)
        import base64 as _b64

        bloom: dict = {}
        for c, acc in bloom_hashes.items():
            m = _bloom_m_for(max(1, len(acc) // _BLOOM_K))
            arr = bytearray(m // 8)
            for h32 in acc:
                # python % on the SIGNED murmur3 word == Spark's pmod,
                # matching _bloom_positions_m3
                p = h32 % m
                arr[p >> 3] |= 1 << (p & 7)
            entry: dict = {"m": m, "k": _BLOOM_K, "h": "m3"}
            if m <= _BLOOM_INLINE_MAX:
                entry["b64"] = _b64.b64encode(bytes(arr)).decode()
            else:
                side = _bloom_sidecar_rel(rel, c)
                with open(os.path.join(self.root, "data", side), "wb") as fh:
                    fh.write(bytes(arr))
                entry["sidecar"] = side
            bloom[c] = entry
        return TxLogWriteMessage(
            path=rel,
            rows=rows,
            bytes=os.path.getsize(dest),
            stats=stats,
            bloom=bloom or None,
        )

    def commit(self, messages: list[TxLogWriteMessage]) -> None:
        """Driver-side: one atomic log commit over all task files."""
        from .txlog import (
            ConcurrentCommitError,
            TableLog,
            _merge_schemas,
            _snapshot_id,
        )

        adds = [
            {
                "path": m.path,
                "rows": m.rows,
                "bytes": m.bytes,
                "partition_values": {},
                "stats": m.stats,
                **({"bloom": m.bloom} if getattr(m, "bloom", None) else {}),
            }
            for m in messages
            if m is not None and m.path
        ]
        import json as _json

        log = TableLog(None, self.root)
        for _attempt in range(3):
            cur = log.snapshot() if log.exists() else None
            if (cur.constraints if cur else {}) != self.constraints:
                # an add/drop-constraint landed after this writer captured
                # (and executor-enforced) the constraint set; the new
                # constraint's validation scan never saw our staged rows
                # and no SparkSession exists here to re-validate them —
                # surface the race like the rename/drop guards
                raise ConcurrentCommitError(
                    f"write to {self.root} raced a concurrent constraint "
                    "change; re-run the write so the current CHECK "
                    "constraints are enforced on its rows"
                )
            if not self.overwrite and cur is not None:
                if (
                    cur.column_mapping != self.mapping
                    or cur.dropped_physical != self.dropped
                ):
                    # a rename/drop landed after this writer captured the
                    # mapping: its files spell stale physical names —
                    # surface the race (same semantics as TableLog.write)
                    raise ConcurrentCommitError(
                        f"write to {self.root} raced a concurrent column "
                        "rename/drop; re-run the write against the "
                        "table's current column names"
                    )
                taken = set(self.mapping.values()) | set(self.dropped)
                cur_names = {f["name"] for f in _json.loads(cur.schema_json)["fields"]}
                bad = [
                    f["name"]
                    for f in _json.loads(self.schema_json)["fields"]
                    if f["name"] not in cur_names and f["name"] in taken
                ]
                if bad:
                    raise ValueError(
                        f"new column(s) {bad} collide with a frozen "
                        f"physical or dropped column name of {self.root}; "
                        "run add_column() first"
                    )
            if cur and cur.generated:
                # generated/identity columns are computed by the Spark-
                # side write path (_apply_generated); this DataSource
                # writer stages executor-side with no SparkSession to
                # compute them — refuse rather than silently commit
                # un-generated rows
                raise ValueError(
                    f"table {self.root} has generated column(s) "
                    f"{sorted(cur.generated)}; format('txlog') writes "
                    "cannot compute them — use TableLog.write()/merge()"
                )
            if cur and cur.bucket_by and not self.overwrite:
                # same layout guard as TableLog.write: this writer's files
                # are not bucket-tagged, so appending them would silently
                # break the co-location contract (overwrite is fine — the
                # payload below resets the layout with the active set)
                raise ValueError(
                    f"table {self.root} is bucketed "
                    f"({cur.bucket_by['cols']} into {cur.bucket_by['n']} "
                    "buckets); format('txlog') appends would break the "
                    "bucket layout — rewrite via TableLog.write("
                    "mode='overwrite', bucket_by=...)"
                )
            if cur and cur.partition_by and not self.overwrite:
                # same layout guard as TableLog.write: an append must match
                # the table's partitioning, and this DataSource writer only
                # produces unpartitioned files — committing them with
                # partition_by=[] would silently flatten the table's
                # declared layout and break subsequent partition reloads
                raise ValueError(
                    f"table partitioning is {cur.partition_by}; "
                    "format('txlog') appends only support unpartitioned "
                    "tables — use TableLog.write(partition_by=...) instead"
                )
            version = (cur.version if cur else 0) + 1
            removes = list(cur.files) if (self.overwrite and cur) else []
            payload = {
                "version": version,
                "snapshot_id": _snapshot_id(version, adds, removes, cur),
                "parent_id": cur.snapshot_id if cur else None,
                "operation": "overwrite" if self.overwrite else "append",
                # appends evolve the schema under the same rules as
                # TableLog.write (new nullable columns; no type changes)
                "schema": (
                    _merge_schemas(cur.schema_json, self.schema_json)
                    if cur is not None and not self.overwrite
                    else self.schema_json
                ),
                "partition_by": [],
                # append: republish the captured mapping/tombstones
                # (verified unchanged above); overwrite: reset both —
                # the new schema's columns freeze physical = logical
                "column_mapping": {} if self.overwrite else self.mapping,
                "dropped_physical": [] if self.overwrite else self.dropped,
                "adds": adds,
                "removes": removes,
            }
            if self.overwrite:
                # a full overwrite resets any bucket layout: these files
                # are plain parquet, and carrying bucket_by forward would
                # point read_bucketed() at untagged files
                payload["bucket_by"] = {}
            try:
                log._commit(version, payload)
                return
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(f"lost 3 commit races on {self.root}")

    def abort(self, messages: list[TxLogWriteMessage]) -> None:
        for m in messages or []:
            if m is not None and m.path:
                try:
                    os.unlink(os.path.join(self.root, "data", m.path))
                except FileNotFoundError:
                    pass


# ---------------------------------------------------------------------------
# streaming read (tail the commit log; offset == table version)

class TxLogStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema_json: str, options):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.schema_json = schema_json
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        # rate limiting (Delta's maxFilesPerTrigger): a microbatch ends
        # at the largest version whose cumulative add-count stays within
        # the cap — always advancing at least one commit so the stream
        # can never stall behind one oversized commit. Restart caveat
        # (Python DS API: latestOffset() can't see the checkpoint): the
        # FIRST batch after a query restart is uncapped — see
        # latestOffset() for why that's the only exactly-once-safe answer
        mft = options.get("maxfilespertrigger")
        self.max_files = int(mft) if mft is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        from .txlog import TableLog

        log = TableLog(None, root)
        # startingTimestamp (Delta parity): INCLUSIVE — the stream emits
        # every commit whose wall-clock is at or after the timestamp, so
        # the exclusive start is (first version with ts_ms >= ts) - 1;
        # a commit stamped exactly at the timestamp IS emitted (Delta's
        # documented boundary). A timestamp past the latest commit
        # starts at the tail and emits only what comes next.
        st_ts = options.get("startingtimestamp")
        if st_ts is not None:
            if "startingversion" in options:
                raise ValueError(
                    "pass startingVersion or startingTimestamp, not both"
                )
            hist = log.history() if log.exists() else []
            at_or_after = [
                h["version"]
                for h in hist
                if (h["ts_ms"] or 0) >= int(st_ts)
            ]
            if at_or_after:
                self.starting_version = min(at_or_after) - 1
            else:
                self.starting_version = (
                    hist[-1]["version"] if hist else 0
                )
        else:
            self.starting_version = int(options.get("startingversion", "0"))
        # column mapping at stream start; the tail only carries appends,
        # and a rename mid-stream is a non-append metadata commit the
        # checkpoint restart picks up with the fresh mapping
        self.mapping = (
            log.snapshot().column_mapping if log.exists() else {}
        )

    def _advance_floor(self, version: int) -> int:
        """Monotone progress floor, learned from EVERY offset that passes
        between the reader and the engine (returned latestOffsets, batch
        starts/ends in partitions(), committed ends). latestOffset() must
        never return below it: pyspark compares offsets by equality only,
        so a regressed offset gets recorded in the offset log and the
        next batch re-emits rows that were already delivered."""
        self._floor = max(getattr(self, "_floor", self.starting_version), version)
        return self._floor

    def initialOffset(self) -> dict:
        self._advance_floor(self.starting_version)
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        # NOTE: pyspark's DataSourceStreamReader calls latestOffset with
        # no arguments (the two-arg latestOffset(start, limit) form is
        # the JVM API), so rate limiting tracks the engine's progress
        # through _last_end, advanced by every offset the engine shows
        # us (initialOffset / partitions / commit). Without a cap: the
        # latest version.
        from .txlog import TableLog

        versions = TableLog(None, self.root).versions()
        latest = versions[-1] if versions else self.starting_version
        if self.max_files is None:
            return {"version": max(latest, self.starting_version)}
        # The cap needs a progress floor, and this API only shows the
        # reader one through engine calls — and the engine's FIRST call
        # on a new reader is latestOffset() itself (observed order, both
        # fresh and restarted queries: latestOffset → initialOffset →
        # partitions). A restarted query whose batches all committed
        # never reveals the checkpointed offset at all, so capping the
        # floorless call from starting_version can return an offset at
        # or BEHIND the committed one: equal ⇒ the stream stalls forever
        # (every later availableNow run re-derives the same stale
        # offset); behind ⇒ the regressed offset is recorded and the
        # next batch re-emits delivered rows. The only safe floorless
        # answer is the uncapped latest — so the FIRST microbatch of a
        # run is unbounded (backlog catch-up), and maxFilesPerTrigger
        # shapes every batch after it. That is the honest limit of the
        # no-argument latestOffset() contract; Delta's JVM source gets
        # latestOffset(start, limit) and can do better.
        if not hasattr(self, "_floor"):
            return {"version": self._advance_floor(max(latest, self.starting_version))}
        return {"version": self._advance_floor(self._capped_end(self._floor, latest))}

    def _capped_end(self, start: int, latest: int) -> int:
        """Largest version ≤ latest whose cumulative data-changing adds
        over (start, v] fit maxFilesPerTrigger — always at least one
        commit forward when any exists."""
        import json as _json

        from .txlog import TableLog

        log = TableLog(None, self.root)
        total = 0
        end = start
        for v in log.versions():
            if not (start < v <= latest):
                continue
            with open(log._commit_path(v)) as f:
                c = _json.load(f)
            n = (
                0
                if (c.get("dataChange") is False or c["operation"] == "optimize")
                else len(c.get("adds", []))
            )
            if total + n > self.max_files and end > start:
                break
            total += n
            end = v
            if total >= self.max_files:
                break
        return max(end, start)

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        """Add-actions of commits in (start, end] — one partition per file.
        A non-append commit means earlier emitted rows may no longer be in
        the table; surfacing its adds as 'new rows' would be silent
        double-processing, so fail loudly unless the user opts in."""
        import json as _json

        from .txlog import TableLog

        # engine-shown offsets advance the rate-limit floor (a replayed
        # batch after restart arrives here before any latestOffset), and
        # a batch START also raises the emission floor: everything at or
        # below it was delivered by earlier, committed batches —
        # defense-in-depth so even a regressed batch range (start > end)
        # can never re-emit rows
        self._advance_floor(max(start["version"], end["version"]))
        self._emit_floor = max(
            getattr(self, "_emit_floor", self.starting_version),
            start["version"],
        )
        lo = max(start["version"], self._emit_floor)
        log = TableLog(None, self.root)
        parts: list[_FilePartition] = []
        for v in log.versions():
            if not (lo < v <= end["version"]):
                continue
            with open(log._commit_path(v)) as f:
                c = _json.load(f)
            if c.get("dataChange") is False or c["operation"] == "optimize":
                # compaction (OPTIMIZE/Z-ORDER) rewrites files without
                # changing rows — Delta marks such file actions
                # dataChange=false and streams skip them silently; every
                # row in the commit's adds was already emitted from the
                # original appends, so emitting OR failing here would be
                # wrong (operation-name fallback covers pre-round-9 logs)
                continue
            if c["operation"] != "append" and (
                c.get("removes") or c["operation"].endswith("_dv")
            ):
                if not self.ignore_changes:
                    raise RuntimeError(
                        f"streaming source hit a {c['operation']!r} commit at "
                        f"version {v}; restart from a fresh checkpoint or set "
                        "ignoreChanges=true to stream its added files anyway"
                    )
            parts.extend(_FilePartition(a) for a in c.get("adds", []))
        return parts

    def read(self, partition: _FilePartition) -> Iterator["pa.RecordBatch"]:
        yield from _read_file_as_batches(
            self.data_dir, partition.meta, self.schema_json, self.mapping
        )

    def commit(self, end: dict) -> None:
        # the sink's checkpoint owns progress; the log retains history —
        # but a committed end raises both floors: latestOffset() must
        # never fall behind it, and its rows must never re-emit
        self._advance_floor(end["version"])
        self._emit_floor = max(
            getattr(self, "_emit_floor", self.starting_version),
            end["version"],
        )


# ---------------------------------------------------------------------------
# streaming change-data feed (round 12)

_CDC_COLS = ("_change_type", "_commit_version", "_commit_ts_ms")


class _ChangePartition(InputPartition):
    """One unit of change-feed read work: a whole data file emitted
    under a constant label (``file``), specific row positions of a file
    (``take`` — a dv commit's masked rows), or a CDC sidecar whose rows
    carry their own ``_change_type`` (``sidecar``)."""

    def __init__(
        self,
        kind: str,
        meta: dict,
        label: str | None,
        version: int,
        ts_ms: int | None,
        positions: list[int] | None = None,
        drop_positions: list[int] | None = None,
        sidecar_schema: str | None = None,
    ):
        self.kind = kind
        self.meta = meta
        self.label = label
        self.version = version
        self.ts_ms = ts_ms
        self.positions = positions
        self.drop_positions = drop_positions
        self.sidecar_schema = sidecar_schema


def _with_cdc_cols(
    batch: "pa.RecordBatch", label: str, version: int, ts_ms: int | None
) -> "pa.RecordBatch":
    import pyarrow as pa

    n = batch.num_rows
    return pa.RecordBatch.from_arrays(
        list(batch.columns)
        + [
            pa.array([label] * n, pa.string()),
            pa.array([version] * n, pa.int64()),
            pa.nulls(n, pa.int64())
            if ts_ms is None
            else pa.array([ts_ms] * n, pa.int64()),
        ],
        names=list(batch.schema.names) + list(_CDC_COLS),
    )


class TxLogChangeStreamReader(TxLogStreamReader):
    """``spark.readStream.format("txlog").option("readChangeFeed",
    "true")`` — the STREAMING twin of ``TableLog.table_changes`` (round
    12, closing round 11's batch/stream CDC asymmetry): each microbatch
    is the change rows of the commits in ``(start, end]``, tagged
    ``_change_type`` / ``_commit_version`` / ``_commit_ts_ms``, so a
    downstream summary folds a MUTABLE upstream (updates and deletes,
    not just appends) with exactly-once semantics from its checkpoint.

    Delta parity: the read REQUIRES ``delta.enableChangeDataFeed =
    'true'`` on the table (Delta's own rule for CDF reads). With the
    property on, every copy-on-write mutation writes a ``_cdc/`` sidecar
    of its exact change rows (MERGE/DELETE since round 11, UPDATE round
    12) which this reader emits verbatim; merge-on-read (dv) commits
    need NO sidecar — their images derive from the commit's recorded
    positions, read back with a pyarrow positional take (the streaming
    worker has no SparkSession, which is also why sidecar-less CoW
    UPDATE derive records cannot feed a stream: evaluating a SET
    expression needs an engine). Overwrites emit file-granularity
    delete+insert like the batch feed; compactions (``dataChange=
    false``) are skipped. A CoW row-op commit that predates enabling
    the property fails the stream loudly — start past it with
    ``startingVersion`` or re-run the mutation under the property.

    Offsets, rate limiting (``maxFilesPerTrigger``), ``startingVersion``
    / ``startingTimestamp`` and the monotone progress floors are
    inherited unchanged from the append tail reader."""

    def __init__(self, root: str, schema_json: str, options):
        super().__init__(root, schema_json, options)
        import json as _json

        from .txlog import TableLog

        log = TableLog(None, root)
        if not log.exists():
            raise FileNotFoundError(
                f"no txlog table at {root}; the change-feed stream "
                "needs an existing table"
            )
        snap = log.snapshot()
        if (
            str(
                snap.properties.get("delta.enableChangeDataFeed", "false")
            ).lower()
            != "true"
        ):
            raise ValueError(
                "readChangeFeed requires delta.enableChangeDataFeed="
                "'true' on the table (Delta's CDF rule): ALTER TABLE … "
                "SET TBLPROPERTIES ('delta.enableChangeDataFeed' = "
                "'true') — copy-on-write commits then write the exact-"
                "change sidecars the stream reads"
            )
        # data files are read under the TABLE schema — strip the three
        # feed columns from the stream schema Spark hands us
        from pyspark.sql.types import StructType as _StructType

        full = _StructType.fromJson(_json.loads(schema_json))
        self.data_schema_json = _StructType(
            [f for f in full.fields if f.name not in _CDC_COLS]
        ).json()

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        import json as _json

        from .txlog import TableLog, _parse_partition_values

        self._advance_floor(max(start["version"], end["version"]))
        self._emit_floor = max(
            getattr(self, "_emit_floor", self.starting_version),
            start["version"],
        )
        lo = max(start["version"], self._emit_floor)
        log = TableLog(None, self.root)

        def _meta_for(path: str) -> dict:
            return {
                "path": path,
                "partition_values": _parse_partition_values(
                    os.path.dirname(path) or "."
                ),
            }

        parts: list[_ChangePartition] = []
        for v in log.versions():
            if not (lo < v <= end["version"]):
                continue
            with open(log._commit_path(v)) as f:
                c = _json.load(f)
            op = c["operation"]
            ts = c.get("ts_ms")
            if c.get("dataChange") is False or op == "optimize":
                continue
            adds = c.get("adds") or []
            removes = c.get("removes") or []
            if op in (
                "delete_dv",
                "update_dv",
                "merge_dv",
                "merge_latest_dv",
            ):
                # images derive from the commit's recorded positions —
                # same split as the batch feed (update_dv masks are
                # pre-images by definition; merge_dv tags its update
                # branch in dv_update, the rest are deletes)
                pdvs = log.snapshot(v - 1).dvs if v > 1 else {}
                delta: dict[str, list[int]] = {}
                for p, vv in (c.get("dvs") or {}).items():
                    fresh = sorted(set(vv) - set(pdvs.get(p, [])))
                    if fresh:
                        delta[p] = fresh
                if op == "update_dv":
                    upd_pos, del_pos = delta, {}
                else:
                    du = c.get("dv_update") or {}
                    upd_pos = {p: x for p, x in du.items() if x}
                    del_pos = {}
                    for p, x in delta.items():
                        rest = sorted(set(x) - set(upd_pos.get(p, [])))
                        if rest:
                            del_pos[p] = rest
                for label, posmap in (
                    ("update_preimage", upd_pos),
                    ("delete", del_pos),
                ):
                    for p, pos in posmap.items():
                        parts.append(
                            _ChangePartition(
                                "take", _meta_for(p), label, v, ts,
                                positions=list(pos),
                            )
                        )
                for a in adds:
                    label = (
                        "update_postimage"
                        if op == "update_dv"
                        or a.get("cdc") == "update_post"
                        else "insert"
                    )
                    parts.append(_ChangePartition("file", a, label, v, ts))
                continue
            if c.get("cdc_files"):
                # sidecar commit: the exact change rows, _change_type
                # included, written at commit time — read them verbatim
                for rel in c["cdc_files"]:
                    parts.append(
                        _ChangePartition(
                            "sidecar", {"path": rel}, None, v, ts,
                            sidecar_schema=c["cdc_schema"],
                        )
                    )
                continue
            if not removes:
                # append/create/metadata commits: adds are pure inserts
                for a in adds:
                    parts.append(
                        _ChangePartition("file", a, "insert", v, ts)
                    )
                continue
            if op in ("overwrite", "replace_where", "restore"):
                # file granularity like the batch feed: removed files'
                # ALIVE rows (parent dvs masked) as deletes, new files
                # as inserts
                pdvs = log.snapshot(v - 1).dvs if v > 1 else {}
                for p in removes:
                    parts.append(
                        _ChangePartition(
                            "file", _meta_for(p), "delete", v, ts,
                            drop_positions=pdvs.get(p),
                        )
                    )
                for a in adds:
                    parts.append(
                        _ChangePartition("file", a, "insert", v, ts)
                    )
                continue
            raise RuntimeError(
                f"change-feed stream hit a {op!r} commit at version {v} "
                "with no CDC record (it predates "
                "delta.enableChangeDataFeed); enable the property "
                "BEFORE mutating, or start the stream past it with "
                "startingVersion"
            )
        return parts

    def read(self, partition: _ChangePartition) -> Iterator["pa.RecordBatch"]:
        if partition.kind == "sidecar":
            yield from self._read_sidecar(partition)
            return
        for batch in _read_file_as_batches(
            self.data_dir,
            partition.meta,
            self.data_schema_json,
            self.mapping,
            dv_positions=partition.drop_positions,
            take_positions=partition.positions,
        ):
            yield _with_cdc_cols(
                batch, partition.label, partition.version, partition.ts_ms
            )

    def _read_sidecar(
        self, partition: _ChangePartition
    ) -> Iterator["pa.RecordBatch"]:
        """Sidecar rows (LOGICAL names + _change_type) aligned to the
        stream schema: shared columns cast, columns the sidecar lacks
        (schema drift since the commit) read null, commit coordinates
        appended as constants."""
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _StructType

        target = to_arrow_schema(
            _StructType.fromJson(_json.loads(self.data_schema_json))
        )
        pf = pq.ParquetFile(
            os.path.join(self.root, partition.meta["path"])
        )
        for batch in pf.iter_batches():
            n = batch.num_rows
            present = set(batch.schema.names)
            arrays, names = [], []
            for fld in target:
                if fld.name in present:
                    arr = batch.column(
                        batch.schema.get_field_index(fld.name)
                    ).cast(fld.type)
                else:
                    arr = pa.nulls(n, fld.type)
                arrays.append(arr)
                names.append(fld.name)
            arrays.append(
                batch.column(
                    batch.schema.get_field_index("_change_type")
                ).cast(pa.string())
            )
            names.append("_change_type")
            arrays.append(pa.array([partition.version] * n, pa.int64()))
            names.append("_commit_version")
            arrays.append(
                pa.nulls(n, pa.int64())
                if partition.ts_ms is None
                else pa.array([partition.ts_ms] * n, pa.int64())
            )
            names.append("_commit_ts_ms")
            yield pa.RecordBatch.from_arrays(arrays, names=names)


# ---------------------------------------------------------------------------

class TxLogDataSource(DataSource):
    """``txlog`` — the transaction-log table format as a Spark source."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _root(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("txlog requires a path: .load('/table/root')")
        return path

    def _version(self, log) -> int | None:
        """versionAsOf / timestampAsOf options -> pinned version (None =
        latest). timestampAsOf takes epoch milliseconds, Delta-style."""
        v = self.options.get("versionasof")
        if v is not None:
            return int(v)
        ts = self.options.get("timestampasof")
        if ts is not None:
            return log.version_at(int(ts))
        return None

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        )

    def schema(self) -> StructType:
        from .txlog import TableLog

        log = TableLog(None, self._root())
        if log.exists():
            base = log.snapshot(self._version(log)).schema
            if self._cdf():
                # change-feed surface: table columns + the three feed
                # columns, matching TableLog.table_changes exactly
                # (no fromDDL — this runs in a session-less worker)
                from pyspark.sql.types import (
                    LongType,
                    StringType,
                    StructField,
                )

                return StructType(
                    base.fields
                    + [
                        StructField("_change_type", StringType()),
                        StructField("_commit_version", LongType()),
                        StructField("_commit_ts_ms", LongType()),
                    ]
                )
            return base
        raise FileNotFoundError(f"no txlog table at {self._root()}")

    def reader(self, schema: StructType) -> TxLogBatchReader:
        from .txlog import TableLog

        if self._cdf():
            raise ValueError(
                "readChangeFeed is the STREAMING surface "
                "(spark.readStream); the batch change feed is "
                "TableLog.table_changes / SQL table_changes('t', from)"
            )
        root = self._root()
        log = TableLog(None, root)
        snap = log.snapshot(self._version(log))
        return TxLogBatchReader(
            root,
            snap.schema_json,
            list(snap.files.values()),
            snap.column_mapping,
            snap.dvs,
        )

    def writer(self, schema: StructType, overwrite: bool) -> TxLogBatchWriter:
        from .txlog import TableLog

        root = self._root()
        log = TableLog(None, root)
        cur = log.snapshot() if log.exists() else None
        snap = cur if not overwrite else None
        return TxLogBatchWriter(
            root,
            schema.json(),
            overwrite,
            mapping=snap.column_mapping if snap else {},
            dropped=snap.dropped_physical if snap else [],
            # constraints survive an overwrite (carry-forward commit key),
            # so they are captured from the CURRENT snapshot either way;
            # the bloom property follows the same rule
            constraints=cur.constraints if cur else {},
            bloom_cols=cur.bloom_cols if cur else [],
        )

    def streamReader(self, schema: StructType) -> TxLogStreamReader:
        if self._cdf():
            return TxLogChangeStreamReader(
                self._root(), schema.json(), self.options
            )
        return TxLogStreamReader(self._root(), schema.json(), self.options)
