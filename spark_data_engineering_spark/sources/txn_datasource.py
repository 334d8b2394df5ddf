"""Spark 4 Python Data Source exposing TxnTable as ``format("txn")``.

The txn table format (sources/txn.py) gets a first-class connector:

    register_txn(spark)                                # see below
    spark.read.format("txn").load(table_dir)           # snapshot read
    spark.readStream.format("txn").load(table_dir)     # commit-log tail

ALWAYS register through ``register_txn(spark)``, not a bare
``spark.dataSource.register(TxnDataSource)``: Spark 4.1 REFUSES to plan
any batch read whose reader implements ``pushFilters`` while the
runtime conf ``spark.sql.python.filterPushdown.enabled`` is false
(DATA_SOURCE_PUSHDOWN_DISABLED, raised in the planning worker before
the reader is ever consulted), and the conf defaults to false.
``register_txn`` enables the conf — it is runtime-settable — at the
moment of registration, so the connector works on ANY session, not just
ones built by this library's session factory. For sessions where the
conf cannot be enabled, ``.option("pushdown", "false")`` degrades
gracefully: the reader loses file pruning but reads never crash.

Batch: one input partition per live data file (the log — not a
directory listing — defines the file set, so half-staged writer garbage
is invisible); each partition is read executor-side with pyarrow.

Streaming: offsets are commit VERSIONS. Each micro-batch covers the
commits in ``(start, end]`` and its partitions are exactly the files
those commits added — the append-only tail of the table, the same
contract as Delta's streaming source. Non-append commits (overwrite /
delete / merge rewrites) abort the stream by default because silently
treating rewritten files as new rows would duplicate data; pass
``.option("ignoreChanges", "true")`` to accept re-emission of rewritten
rows (again Delta's escape hatch, with Delta's caveat).

Scale: offset resolution reads only commit JSON (metadata); partition
planning never lists the data directory; file reads are parallel across
executors. The connector makes the txn format consumable by ANY Spark
job — including ones that know nothing about this library.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        dv_paths: tuple[str, ...] = (),
        colmap: tuple[tuple[str, tuple[str, ...]], ...] = (),
        cdf_type: str | None = None,
        cdf_version: int | None = None,
        cdf_select: bool = False,
        cdf_from_file: bool = False,
        row_groups: tuple[int, ...] | None = None,
        row_offset: int = 0,
        stats_version: int | None = None,
    ) -> None:
        self.path = path
        # per-file constant columns (hive-origin partition values,
        # projected from the commit log at planning time — see
        # _attach_read_extras); merged into _read_file's consts
        self.consts: tuple = ()
        # row-group CHUNK of a large file (None = the whole file): scan
        # parallelism must not be bounded by file count — a 1 GB file is
        # ~8 default-sized row groups, and reading it as one task wastes
        # 7 cores. row_offset is the file-global row index of the
        # chunk's first row, the datum deletion-vector positions (file-
        # global by contract) are rebased against executor-side.
        self.row_groups = row_groups
        self.row_offset = row_offset
        # deletion-vector sidecar dirs whose positions must be dropped
        # from this file (merge-on-read; resolved driver-side from the
        # snapshot's dv state, applied executor-side)
        self.dv_paths = dv_paths
        # logical-name -> candidate physical names (name first, then
        # prev_names), resolved driver-side from the table's logical
        # schema so renamed columns read their old bytes and dropped
        # columns are never surfaced — the _conform contract, applied
        # executor-side per file
        self.colmap = colmap
        # change-data-feed markers: rows from this partition carry
        # (_change_type=cdf_type, _commit_version=cdf_version); with
        # cdf_select the single dv_paths sidecar SELECTS the rows (the
        # delete set) instead of dropping them; with cdf_from_file the
        # partition reads a PERSISTED change file (merge(cdf=True)) whose
        # _change_type rides as a real column — only _commit_version is
        # appended as a constant
        self.cdf_type = cdf_type
        self.cdf_version = cdf_version
        self.cdf_select = cdf_select
        self.cdf_from_file = cdf_from_file
        # the commit version whose log recorded THIS file as live —
        # streaming planners stamp it on every data partition (not just
        # CDF ones) so _attach_read_extras can resolve partitionValues
        # for a file added and then removed (compact + ignoreChanges)
        # within one planned batch range, where the range-end file_stats
        # no longer lists it
        self.stats_version = stats_version


def _arrow_to_ddl(path: str) -> str:
    """Spark DDL schema from a parquet file's arrow schema (driver-side,
    footer only)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mapping = {
        pa.int64(): "bigint",
        pa.int32(): "int",
        pa.int16(): "smallint",
        pa.int8(): "tinyint",
        pa.float64(): "double",
        pa.float32(): "float",
        pa.string(): "string",
        pa.large_string(): "string",
        pa.bool_(): "boolean",
        pa.binary(): "binary",
        pa.date32(): "date",
    }
    parts = []
    for field in pq.read_schema(path):
        t = field.type
        if t in mapping:
            ddl = mapping[t]
        elif pa.types.is_timestamp(t):
            ddl = "timestamp"
        elif pa.types.is_decimal(t):
            ddl = f"decimal({t.precision},{t.scale})"
        else:
            raise ValueError(f"txn datasource: unmapped arrow type {t} for {field.name}")
        parts.append(f"`{field.name}` {ddl}")
    return ", ".join(parts)


def _read_file(
    path: str,
    schema: StructType,
    dv_paths: tuple[str, ...] = (),
    colmap: tuple[tuple[str, tuple[str, ...]], ...] = (),
    select_positions: bool = False,
    consts: tuple = (),
    row_groups: tuple[int, ...] | None = None,
    row_offset: int = 0,
):
    """Executor-side: yield ARROW RECORD BATCHES in the query schema's
    column order (the Python Data Source fast path — handing Arrow
    batches to the engine skips the per-row tuple conversion entirely;
    measured ~6× on a one-file pruned-partition scan at 100×), with any
    deletion-vector positions for THIS file dropped (the sidecars are
    read with a file== filter — small by contract) — or, with
    ``select_positions``, KEPT and everything else dropped (the change
    feed's delete-row fetch). ``colmap`` resolves each logical column
    to the first of its candidate physical names present in THIS file
    (a pre-rename file holds the old name; a post-rename file the new —
    never both, the rename guard forbids it); absent columns become
    all-NULL columns, matching TxnTable._conform. ``consts`` appends
    (name, value) pairs as partition-level constant columns (the change
    feed's _change_type/_commit_version), typed from ``schema``.

    Every column is cast to the engine's expected Arrow type
    (``to_arrow_schema`` — the same mapping the data-source worker
    validates against), so parquet-level representation differences
    (int32 vs int64, timestamp units) never surface."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    candidates = dict(colmap)
    pf = pq.ParquetFile(path)
    file_names = set(pf.schema_arrow.names)
    const_names = {n for n, _ in consts}
    data_fields = [f for f in schema.fields if f.name not in const_names]
    # physical column to read per logical field (None -> all-NULL column)
    resolve = {
        f.name: next(
            (c for c in candidates.get(f.name, (f.name,)) if c in file_names),
            None,
        )
        for f in data_fields
    }
    phys_cols = sorted({c for c in resolve.values() if c is not None})
    if not phys_cols and file_names:
        # every projected column is absent from this file (written before
        # any surviving column existed): read one physical column as the
        # row-count carrier so DV filtering still applies; output is
        # all-NULL tuples
        phys_cols = [sorted(file_names)[0]]
    table = (
        pf.read_row_groups(list(row_groups), columns=phys_cols)
        if row_groups is not None
        else pf.read(columns=phys_cols)
    )
    if dv_paths:
        import numpy as np
        import pyarrow.dataset as ds

        fname = os.path.basename(path)
        pos = []
        for dvp in dv_paths:
            t = ds.dataset(dvp, format="parquet").to_table(
                columns=["row_index"], filter=ds.field("file") == fname
            )
            if t.num_rows:
                pos.append(t.column(0).to_numpy(zero_copy_only=False))
        if pos:
            dead = np.unique(np.concatenate(pos).astype(np.int64))
            # positions are FILE-GLOBAL; rebase to this chunk's rows
            dead = dead - int(row_offset)
            dead = dead[(dead >= 0) & (dead < table.num_rows)]
            if select_positions:
                table = table.take(dead)
            else:
                keep = np.setdiff1d(
                    np.arange(table.num_rows, dtype=np.int64), dead
                )
                table = table.take(keep)
        elif select_positions:
            table = table.slice(0, 0)  # nothing marked in this file
    target = to_arrow_schema(schema)
    n = table.num_rows
    arrays = []
    const_vals = dict(consts)
    for f in schema.fields:
        t = target.field(f.name).type
        if f.name in const_vals:
            arrays.append(
                pa.array([const_vals[f.name]] * n).cast(t)
                if n
                else pa.nulls(0, type=t)
            )
            continue
        src = resolve[f.name]
        if src is None:
            # absent column -> NULL (matches _conform; ADD COLUMN
            # DEFAULTs are materialized at write time, so a file that
            # lacks the column either predates the add or was written
            # without it — both read NULL, Delta's rule)
            arrays.append(pa.nulls(n, type=t))
            continue
        col = table.column(src)
        arrays.append(col.cast(t) if col.type != t else col)
    out = pa.table(arrays, schema=target)
    yield from out.to_batches()


def _logical_colmap(
    table, at_version: int | None = None
) -> tuple[tuple[str, tuple[str, ...]], ...]:
    """(logical name, candidate physical names) for every non-dropped
    column of the table's logical schema at a version — empty for legacy
    tables with no recorded schema (physical names are then read
    as-is)."""
    return tuple(
        (s["name"], (s["name"], *s.get("prev_names", ())))
        for s in table.table_schema(at_version)
        if not s.get("dropped")
    )


def _attach_read_extras(parts, table, at_version, schema, data_dir) -> None:
    """Attach each planned file's logged partitionValues as per-file
    constant columns (round 10): hive-adopted files do not physically
    contain the partition columns, so without this every connector read
    of a hive-origin table would emit NULLs there (the same gap the
    batch reader's _project_partition_values closes JVM-side). Only
    fires on hive-origin partitioned tables; files without a recorded
    entry (and non-data paths: CDF files, sentinels) are left to the
    physical-column path. Value-pure staging makes the constant equal
    to the real column wherever both exist, so serving the constant
    also skips reading that column."""
    import os

    sch_names = {f.name for f in schema.fields}
    if not table.hive_origin(at_version):
        return
    # serve each file's OWN recorded columns (not the current scheme):
    # under partition evolution an old-scheme hive file still carries
    # its original partitionValues and nothing else (round 11)
    want = sch_names
    stats = None
    for part in parts:
        if not part.path or getattr(part, "cdf_from_file", False):
            continue
        if os.path.dirname(part.path) != data_dir:
            continue
        if stats is None:
            stats = table.file_stats(at_version)
        fname = os.path.basename(part.path)
        pv = (stats.get(fname) or {}).get("partitionValues")
        fallback_v = getattr(part, "cdf_version", None) or getattr(
            part, "stats_version", None
        )
        if pv is None and fallback_v:
            # the partition may reference a file already removed by
            # ``at_version`` — a CDF retraction rewritten after its DV
            # delete, or a non-CDF file added then compacted away
            # (ignoreChanges) within the same planned range — its
            # partitionValues are still in the log at the version the
            # planner recorded for this partition
            pv = (
                table.file_stats(fallback_v).get(fname) or {}
            ).get("partitionValues")
        if pv:
            part.consts = tuple(part.consts) + tuple(
                (c, pv[c]) for c in pv if c in want
            )


def _parse_ts_option(raw: str) -> float:
    """``timestampAsOf`` accepts epoch seconds or an ISO timestamp
    ('2026-08-15' / '2026-08-15 12:00:00[.ffffff]'), like Delta's
    string form. Naive ISO strings are LOCAL time (what a user typing
    a wall-clock timestamp means on a single-timezone cluster)."""
    try:
        return float(raw)
    except ValueError:
        pass
    from datetime import datetime

    return datetime.fromisoformat(raw).timestamp()


class TxnBatchReader(DataSourceReader):
    def __init__(
        self,
        table_dir: str,
        schema: StructType,
        at_version: int | None = None,
        split_bytes: int = 128 * 1024 * 1024,
    ) -> None:
        from spark_data_engineering_spark.sources.txn import TxnTable
        import os

        # files larger than this split into row-group chunks at
        # planning time (option maxPartitionBytes — Spark's own default)
        self._split_bytes = split_bytes

        t = TxnTable(os.path.dirname(table_dir), os.path.basename(table_dir))
        self._t = t
        # pin ONE version for file set, dv snapshot, and pruning stats —
        # the head, or option("versionAsOf", N) time travel
        head = t.version()
        if at_version is not None and not 1 <= at_version <= head:
            raise ValueError(
                f"versionAsOf {at_version} out of range (table head {head})"
            )
        self._v0 = head if at_version is None else at_version
        self._names = t.live_files(self._v0)
        # snapshot the dv sidecar set with the file set (merge-on-read
        # deletes must not resurrect through this connector either)
        sidecars, deleted = t.dv_state(self._v0)
        self._dv_paths = (
            tuple(os.path.join(t.dv_dir, s) for s in sidecars) if deleted else ()
        )
        # logical projection (renames coalesce to old physical names,
        # dropped columns never surface) — TxnTable.read's _conform
        # contract, mirrored by this connector, at the pinned version
        self._colmap = _logical_colmap(t, self._v0)
        self._schema = schema
        # filter-pushdown state (pushFilters): used ONLY to prune the
        # planned file set from commit-log metadata
        self._eq: dict[str, object] = {}
        self._ranges: dict[str, list] = {}
        self._in: dict[str, tuple] = {}

    def pushFilters(self, filters):
        """DATA SKIPPING through the connector (Spark 4.1 filter
        pushdown): equality / range / IN predicates on top-level columns
        shrink the planned scan to the files whose commit-log metadata —
        hive partitionValues, footer [min,max] boxes, stage-time blooms —
        can match, exactly the ``TxnTable.prune_files`` lever, now
        reachable from ANY Spark job that knows only
        ``spark.read.format("txn")``. Every filter is RETURNED (Spark
        re-applies the exact predicates), so pruning can only shrink the
        scan, never change an answer — the same contract as
        ``read(prune=...)``."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr is not None and len(attr) == 1 else None
            val = getattr(f, "value", None)
            if col is not None and val is not None:
                if isinstance(f, EqualTo):
                    self._eq[col] = val
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo, hi = self._ranges.get(col, (None, None))
                    # conservative under repeats: prune-by-[lo,hi] keeps
                    # boundary files, so strict vs non-strict both safe
                    self._ranges[col] = [
                        val if lo is None else max(lo, val),
                        hi,
                    ]
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    lo, hi = self._ranges.get(col, (None, None))
                    self._ranges[col] = [
                        lo,
                        val if hi is None else min(hi, val),
                    ]
                elif isinstance(f, In) and all(v is not None for v in val):
                    self._in[col] = tuple(val)
            yield f

    def _pruned_names(self) -> list:
        if not (self._eq or self._ranges or self._in):
            return self._names
        ranges = {c: (lo, hi) for c, (lo, hi) in self._ranges.items()}
        kept = set(
            self._t.prune_files(
                ranges or None, at_version=self._v0, equals=self._eq or None
            )
        )
        for col, vals in self._in.items():
            # a file survives an IN if ANY member could be in it
            s: set = set()
            for v in vals:
                s |= set(
                    self._t.prune_files(
                        None, at_version=self._v0, equals={col: v}
                    )
                )
            kept &= s
        return [n for n in self._names if n in kept]

    def partitions(self):
        """One input partition per file — except files larger than
        ``maxPartitionBytes``, which split into ROW-GROUP chunks so scan
        parallelism is bounded by bytes, not file count (a 1 GB
        compacted file is ~8 default row groups; reading it as one task
        idles 7 cores). Planning stays metadata-only for the common
        case: only oversized files' footers are opened, and only after
        pruning."""
        import os

        import pyarrow.parquet as pq

        parts = []
        for n in self._pruned_names():
            path = os.path.join(self._t.data_dir, n)
            try:
                big = os.path.getsize(path) > self._split_bytes
            except OSError:
                big = False
            if not big:
                parts.append(
                    _FilePartition(path, self._dv_paths, self._colmap)
                )
                continue
            md = pq.ParquetFile(path).metadata
            chunks: list[tuple[list[int], int]] = []  # (rg idxs, row_offset)
            cur: list[int] = []
            cur_bytes = 0
            cur_offset = 0
            offset = 0
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                if cur and cur_bytes + rg.total_byte_size > self._split_bytes:
                    chunks.append((cur, cur_offset))
                    cur, cur_bytes, cur_offset = [], 0, offset
                cur.append(i)
                cur_bytes += rg.total_byte_size
                offset += rg.num_rows
            if cur:
                chunks.append((cur, cur_offset))
            if len(chunks) == 1:
                parts.append(
                    _FilePartition(path, self._dv_paths, self._colmap)
                )
                continue
            for rgs, row_off in chunks:
                parts.append(
                    _FilePartition(
                        path,
                        self._dv_paths,
                        self._colmap,
                        row_groups=tuple(rgs),
                        row_offset=row_off,
                    )
                )
        _attach_read_extras(
            parts, self._t, self._v0, self._schema, self._t.data_dir
        )
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        yield from _read_file(
            partition.path,
            self._schema,
            getattr(partition, "dv_paths", ()),
            getattr(partition, "colmap", ()),
            row_groups=getattr(partition, "row_groups", None),
            row_offset=getattr(partition, "row_offset", 0),
            consts=getattr(partition, "consts", ()),
        )


class _TxnBatchReaderNoPushdown(TxnBatchReader):
    """``TxnBatchReader`` with filter pushdown surgically removed.

    Spark's planning worker decides "does this reader implement
    pushdown?" by IDENTITY: ``reader.pushFilters.__func__ is not
    DataSourceReader.pushFilters`` (pyspark sql/worker/
    plan_data_source_read.py). Re-binding the base class's function
    makes that check see "not implemented", so this reader plans
    cleanly even when ``spark.sql.python.filterPushdown.enabled`` is
    false — at the cost of commit-log file pruning (Spark applies every
    filter post-scan, so answers are identical, just slower). Selected
    via ``.option("pushdown", "false")`` for sessions whose conf cannot
    be enabled; ``register_txn`` makes that escape hatch rarely needed.
    """

    pushFilters = DataSourceReader.pushFilters


def register_txn(spark) -> None:
    """Register ``format("txn")`` on *spark*, usable from ANY session.

    Single registration entry point (use this, not a bare
    ``spark.dataSource.register``): it first enables
    ``spark.sql.python.filterPushdown.enabled`` — required by Spark 4.1
    for any Python data source whose reader implements ``pushFilters``,
    default false, runtime-settable — so batch reads work on sessions
    this library did not build (the library's own session factory also
    sets it at build time; this covers everyone else). If the session
    refuses runtime conf changes, registration still proceeds: batch
    reads then need ``.option("pushdown", "false")``.
    """
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # locked-down session: .option("pushdown","false") path
    spark.dataSource.register(TxnDataSource)


class TxnStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table_dir: str,
        schema: StructType,
        ignore_changes: bool,
        max_files: int | None = None,
        cdf: bool = False,
        starting_version: int | None = None,
    ) -> None:
        from spark_data_engineering_spark.sources.txn import TxnTable
        import os

        self._table = TxnTable(os.path.dirname(table_dir), os.path.basename(table_dir))
        self._schema = schema
        self._ignore_changes = ignore_changes
        self._max_files = max_files
        # readChangeFeed: emit (_change_type, _commit_version)-stamped
        # rows — appends as inserts, DV commits as DELETE rows (the
        # retraction a downstream incremental fold needs), compact
        # skipped (net-zero); rewrite-family commits abort-or-optin
        # since their row-level diff is not plannable from metadata
        self._cdf = cdf
        # startingVersion (Delta semantics): tail the log from AFTER
        # this version instead of emitting the initial snapshot
        self._start_version = starting_version
        # resolved once at stream start; schema commits at or below this
        # version are already reflected in the colmap (safe to skip —
        # they move no data), while a LATER rename/drop invalidates the
        # resolved mapping and aborts the stream for a restart (Delta's
        # contract for mid-stream schema evolution)
        self._colmap_version = self._table.version()
        self._colmap = _logical_colmap(self._table)
        # SNAPSHOT version: the table version the initial snapshot is
        # pinned at. For a fresh stream this is the construction-time
        # head; for a RESTARTED stream the checkpointed offsets carry
        # the original run's version as "snapVersion" and partitions()
        # re-pins to it (_pin_snapshot) — the uuid-sorted live-file list
        # and DV snapshot are only meaningful relative to the version
        # they were built from, so indexing a checkpointed snap offset
        # into a head-rebuilt list would silently duplicate/drop files
        # when commits landed while the stream was down (round-7 review
        # finding). Tailing likewise begins AFTER this version, so
        # commits interleaved with a paced snapshot are tailed, never
        # skipped.
        self._snap_version = self._colmap_version
        # DV snapshot at stream start: deletion-vector positions already
        # committed when the stream begins apply to the files the stream
        # replays as its initial snapshot (batch-read parity — otherwise
        # a fresh stream over a table/branch with merge-on-read deletes
        # would resurrect the deleted rows). LATER dv commits still abort
        # (rows were already emitted) unless ignoreChanges.
        sidecars, _ = self._table.dv_state(self._snap_version)
        self._dv_paths = tuple(
            os.path.join(self._table.dv_dir, s) for s in sidecars
        )
        # sorted => the snapshot's file order is deterministic across
        # reader instances, so paced offsets ({"version": 0,
        # "snapVersion": N, "snap": i}) mean the same prefix after a
        # restart
        self._snap_files = sorted(self._table.live_files(self._snap_version))
        # pacing floor: the snapshot prefix KNOWN consumed. Advances only
        # from offsets Spark hands back (partitions' start, commit's end)
        # — never from a merely-planned end, so a failed batch replays in
        # full; and a restart whose first latestOffset under-guesses the
        # checkpoint position self-corrects from the next start without
        # re-emitting (the inverted range plans empty, the floor keeps
        # later batches from re-covering the committed prefix).
        self._snap_floor = 0
        # pacing pointer: the last snapshot end latestOffset HANDED OUT.
        # Advanced by latestOffset itself (the RateSource pattern — the
        # engine does not echo batch completion back to the reader
        # between triggers), so the stream makes progress one capped
        # chunk per trigger; replay safety never depends on it.
        self._paced_next = 0

    def _snap_of(self, off: dict) -> int:
        # position within the initial snapshot this offset implies: any
        # offset past the snapshot version covers the whole snapshot; a
        # version-0 offset without a snap key is the unpaced stream
        # start (nothing consumed yet)
        if off["version"] > 0:
            return len(self._snap_files)
        return min(off.get("snap", 0), len(self._snap_files))

    def _pin_snapshot(self, sv: int) -> None:
        """Re-pin the initial-snapshot state (file list, DV sidecars) to
        table version ``sv`` — the version a checkpointed offset's snap
        indices were minted against. A reader constructed after a
        restart resolves the CURRENT head; if commits landed while the
        stream was down, that head's sorted file list has shifted under
        the checkpointed index. Rebuilding from ``sv`` restores the
        original list, and tailing then starts at ``sv`` so the
        interleaved commits are replayed by the tail loop instead of
        being silently skipped.

        Pins DOWNWARD only (sticky): the true snapshot version is the
        one the original run's initialOffset minted, and every offset it
        wrote carries it; the only way a LARGER snapVersion reaches a
        start offset is a restart-time latestOffset minted before this
        reader saw the checkpoint (it stamps the re-constructed head).
        Refusing the upward pin keeps the whole run on one list —
        indices stay contiguous because emission always interprets them
        against the pinned list."""
        if sv >= self._snap_version:
            return
        import os

        self._snap_version = sv
        sidecars, _ = self._table.dv_state(sv)
        self._dv_paths = tuple(
            os.path.join(self._table.dv_dir, s) for s in sidecars
        )
        self._snap_files = sorted(self._table.live_files(sv))
        self._paced_next = min(self._paced_next, len(self._snap_files))

    def initialOffset(self) -> dict:
        if self._start_version is not None:
            # startingVersion: no initial snapshot — tail from after it
            return {"version": self._start_version}
        if self._max_files and self._snap_files:
            return {"version": 0, "snapVersion": self._snap_version, "snap": 0}
        return {"version": 0, "snapVersion": self._snap_version}

    def latestOffset(self) -> dict:
        if (
            self._max_files
            and self._start_version is None  # startingVersion: no snapshot
            and self._paced_next < len(self._snap_files)
        ):
            # still draining the initial snapshot: hand out one capped
            # chunk past the furthest point already given out or known
            # consumed (Delta's maxFilesPerTrigger on the snapshot — at
            # large scale the snapshot must not be one unbounded epoch).
            # Tailing resumes once the pointer reaches the end; a
            # premature hand-off to the version offset is still safe
            # (partitions() emits any unconsumed snapshot remainder
            # before tailing).
            self._paced_next = min(
                len(self._snap_files),
                max(self._paced_next, self._snap_floor) + self._max_files,
            )
            return {
                "version": 0,
                "snapVersion": self._snap_version,
                "snap": self._paced_next,
            }
        return {"version": self._table.version()}

    def commit(self, end: dict) -> None:
        # the log is immutable — nothing to clean up; but a completed
        # batch durably advances the pacing floor
        self._snap_floor = max(self._snap_floor, self._snap_of(end))

    def partitions(self, start: dict, end: dict):
        import os

        parts = []
        lo = start["version"]
        if lo == 0:
            # checkpointed snapshot offsets carry the version their snap
            # indices were minted against — re-pin before indexing (a
            # legacy offset without the key keeps the constructed head)
            self._pin_snapshot(start.get("snapVersion", self._snap_version))
        self._snap_floor = max(self._snap_floor, self._snap_of(start))
        if lo == 0 and self._snap_version > 0 and self._start_version is None:
            # INITIAL SNAPSHOT (Delta semantics): a fresh stream emits
            # the table's LIVE state at stream start as batch input —
            # not a replay of the commit log — so historical rewrites
            # (overwrite/delete/compact/restore/branch seeds) neither
            # abort the stream nor double-emit; the stream-start dv
            # snapshot applies. Tailing begins AFTER the snapshot
            # version; the per-commit rules below then govern only
            # commits made while the stream is live (or while a resumed
            # stream was down). With maxFilesPerTrigger the snapshot
            # drains as bounded [lo_idx, hi_idx) chunks of the sorted
            # file list instead of one unbounded epoch.
            lo_idx = max(self._snap_of(start), self._snap_floor)
            hi_idx = (
                self._snap_of(end)
                if end["version"] == 0
                else len(self._snap_files)
            )
            parts.extend(
                _FilePartition(
                    os.path.join(self._table.data_dir, f),
                    self._dv_paths,
                    self._colmap,
                    # the change feed reports the starting state as
                    # inserts at the snapshot version (Delta CDF)
                    cdf_type="insert" if self._cdf else None,
                    cdf_version=self._snap_version if self._cdf else None,
                    stats_version=self._snap_version,
                )
                for f in self._snap_files[lo_idx:hi_idx]
            )
            if end["version"] == 0:
                # snapshot-phase batch only: no commits to tail yet
                return parts or [_FilePartition("")]
            lo = self._snap_version
        for v in range(lo + 1, end["version"] + 1):
            c = self._table._read_commit(v)
            if c["action"] in (
                "rename_column",
                "drop_column",
                "add_column",
                "widen_column",
            ):
                # metadata-only: moves no data. Already reflected in the
                # stream's resolved column map -> nothing to do; newer ->
                # the mapping is stale and silently reading would emit
                # NULLs for post-rename files: restart required.
                if v > self._colmap_version:
                    raise RuntimeError(
                        f"txn stream: commit {v} is a '{c['action']}' schema "
                        "change made after this stream started; restart the "
                        "stream to pick up the evolved schema."
                    )
                continue
            if c["action"] in ("delete_dv", "branch-dv", "clone-dv"):
                if self._cdf:
                    # the change feed's whole point: the sidecar IS the
                    # delete set — emit those positions' rows as
                    # retractions instead of aborting. One partition per
                    # marked file; the sidecar selects (never drops).
                    # The retraction rows are fetched from the ORIGINAL
                    # data file: if it was later compacted away and
                    # vacuumed (a startingVersion stream, or a live
                    # stream lagging past retention), refuse with a
                    # retention message instead of a mid-task
                    # missing-file crash (mirrors restore's
                    # vacuumed-target refusal).
                    sidecar = (
                        os.path.join(self._table.dv_dir, c["dv_add"]),
                    )
                    marked = sorted(c.get("dv_counts", {}))
                    gone = [
                        f
                        for f in marked
                        if not os.path.exists(
                            os.path.join(self._table.data_dir, f)
                        )
                    ]
                    if gone:
                        raise RuntimeError(
                            f"txn stream: commit {v} ('{c['action']}') "
                            "deletes rows from data files that have "
                            "since been rewritten and vacuumed "
                            f"({', '.join(gone[:3])}"
                            f"{', ...' if len(gone) > 3 else ''}); this "
                            "version is no longer readable as a change "
                            "feed. Restart the change-feed stream from "
                            "a newer startingVersion (inside the vacuum "
                            "retention window)."
                        )
                    parts.extend(
                        _FilePartition(
                            os.path.join(self._table.data_dir, f),
                            sidecar,
                            self._colmap,
                            cdf_type="delete",
                            cdf_version=v,
                            cdf_select=True,
                        )
                        for f in marked
                    )
                    continue
                # position-delete metadata, no files added. A dv commit
                # at or below the SNAPSHOT version is folded into the
                # snapshot and never reaches this loop (tailing starts
                # after it) — so ANY dv commit replayed here deletes
                # rows a previous batch already emitted, including ones
                # that landed while a restarted stream was down
                # (comparing against the restart-time colmap_version
                # used to skip those silently: un-retracted downstream
                # rows with no abort — round-7 review finding).
                if not self._ignore_changes:
                    raise RuntimeError(
                        f"txn stream: commit {v} is a '{c['action']}' "
                        "row-deletion on rows this stream already "
                        "emitted; they cannot be retracted. Restart the "
                        "stream (a fresh checkpoint folds the deletes "
                        "into the initial snapshot), use readChangeFeed "
                        "for retraction rows, or pass "
                        "option('ignoreChanges', 'true') to keep going "
                        "without retraction."
                    )
                continue
            if c["action"] == "dv-prune":
                # DV maintenance: drops all-dead sidecars from the probe
                # list — no visible row changes in either mode
                continue
            if c["action"] in (
                "constraint-add",
                "constraint-drop",
                "properties-set",
                "properties-unset",
                "analyze",
                "repair-stats",
                "partition-evolve",
                "tag-create",
                "tag-delete",
            ):
                # CHECK-constraint / TBLPROPERTIES / stats-backfill DDL:
                # pure metadata, no row changes in either mode
                continue
            if self._cdf and c["action"] == "compact":
                continue  # net-zero row change by construction
            if self._cdf and c.get("cdf_add"):
                # merge(cdf=True): row-level pre/post-images were
                # persisted at commit time — stream them as a pure scan
                # (one partition per change file; _change_type is a real
                # column in the file, so only the version is appended).
                # This is how a MERGE-heavy table streams its CDF at all:
                # the change rows are bounded by matched+inserted rows,
                # and no metadata-only diff of a rewrite commit exists.
                parts.extend(
                    _FilePartition(
                        os.path.join(self._table.cdf_dir, f),
                        (),
                        self._colmap,
                        cdf_version=v,
                        cdf_from_file=True,
                    )
                    for f in c["cdf_add"]
                )
                continue
            if (
                c["action"]
                not in (
                    "append",
                    "streaming-append",
                    "branch",
                    "convert",
                    "clone",
                    "copy",
                )
                and not self._ignore_changes
            ):
                # "branch" is allowed: a branch's seed commit IS the
                # line's initial snapshot — none of its rows were emitted
                # by this stream before, so replaying them re-emits
                # nothing (inherited dv positions apply via the snapshot).
                msg = (
                    f"txn stream: commit {v} is '{c['action']}', not an "
                    "append; its row-level change set is not plannable "
                    "from metadata. Use batch read_changes for it, or "
                    "pass option('ignoreChanges', 'true') to skip it."
                    if self._cdf
                    else f"txn stream: commit {v} is '{c['action']}', not "
                    "an append; rewritten files would re-emit their rows. "
                    "Pass option('ignoreChanges', 'true') to accept that."
                )
                raise RuntimeError(msg)
            if self._cdf and c["action"] not in (
                "append",
                "streaming-append",
                "branch",
                "convert",
                "clone",
                "copy",
            ):
                continue  # ignoreChanges under CDF: skip, never re-emit
            # dv snapshot applies only to files that existed at stream
            # start; post-start appends can't be covered by it (and
            # skipping the sidecar probe saves a scan per new file)
            dv = self._dv_paths if v <= self._snap_version else ()
            parts.extend(
                _FilePartition(
                    os.path.join(self._table.data_dir, f),
                    () if self._cdf else dv,
                    self._colmap,
                    cdf_type="insert" if self._cdf else None,
                    cdf_version=v if self._cdf else None,
                    stats_version=v,
                )
                for f in c.get("add", ())
            )
        # a batch may legitimately cover only rowless commits (compact)
        _attach_read_extras(
            parts,
            self._table,
            end["version"] or self._snap_version,
            self._schema,
            self._table.data_dir,
        )
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        ct = getattr(partition, "cdf_type", None)
        if getattr(partition, "cdf_from_file", False):
            # persisted change file (merge(cdf=True)): _change_type is a
            # REAL column of the file — read it through the projection
            # (the colmap has no entry for it, so it resolves to itself)
            # and append only the version constant
            return _read_file(
                partition.path,
                self._schema,
                (),
                partition.colmap,
                consts=(("_commit_version", partition.cdf_version),),
            )
        if ct is not None:
            # change-feed rows: table columns from the file, then the
            # two metadata columns as partition-level constants
            return _read_file(
                partition.path,
                self._schema,
                partition.dv_paths,
                partition.colmap,
                select_positions=partition.cdf_select,
                consts=(
                    ("_change_type", ct),
                    ("_commit_version", partition.cdf_version),
                )
                + tuple(getattr(partition, "consts", ())),
            )
        return _read_file(
            partition.path,
            self._schema,
            getattr(partition, "dv_paths", ()),
            getattr(partition, "colmap", ()),
            consts=getattr(partition, "consts", ()),
        )

    def stop(self) -> None:
        pass


class TxnDataSource(DataSource):
    """``format("txn")`` — path is the table directory (<root>/<name>)."""

    @classmethod
    def name(cls) -> str:
        return "txn"

    def _table_dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("txn datasource requires .load(<table_dir>)")
        return path

    def _cdf_on(self) -> bool:
        return (
            str(
                self.options.get("readchangefeed")
                or self.options.get("readChangeFeed")
                or "false"
            ).lower()
            == "true"
        )

    def schema(self) -> str:
        from spark_data_engineering_spark.sources.txn import TxnTable
        import os

        d = self._table_dir()
        t = TxnTable(os.path.dirname(d), os.path.basename(d))
        cdf_cols = (
            ", `_change_type` string, `_commit_version` bigint"
            if self._cdf_on()
            else ""
        )
        # time travel: the schema is the LOGICAL schema AT the pinned
        # version (a later rename/drop must not leak into the past read)
        logical = t.table_schema(self._version_as_of())
        if logical:
            # the LOGICAL schema (rename/drop applied), not the first
            # file's physical footer — the connector must agree with
            # TxnTable.read on evolved tables
            from pyspark.sql.types import _parse_datatype_json_value

            return (
                ", ".join(
                    f"`{s['name']}` {_parse_datatype_json_value(s['type']).simpleString()}"
                    for s in logical
                    if not s.get("dropped")
                )
                + cdf_cols
            )
        live = t.live_files()
        if not live:
            raise ValueError(f"txn table {d} is empty; cannot infer schema")
        return _arrow_to_ddl(os.path.join(t.data_dir, live[0])) + cdf_cols

    def _version_as_of(self) -> int | None:
        v = self.options.get("versionasof")
        if v is None:
            v = self.options.get("versionAsOf")
        ts = self.options.get("timestampasof")
        if ts is None:
            ts = self.options.get("timestampAsOf")
        if ts is not None:
            if v is not None:
                raise ValueError(
                    "pass versionAsOf OR timestampAsOf, not both"
                )
            import os

            d = self._table_dir()
            from spark_data_engineering_spark.sources.txn import TxnTable

            t = TxnTable(os.path.dirname(d), os.path.basename(d))
            return t.version_at_timestamp(_parse_ts_option(ts))
        return None if v is None else int(v)

    def reader(self, schema: StructType) -> TxnBatchReader:
        if self._cdf_on():
            raise ValueError(
                "readChangeFeed is a STREAMING option on format('txn'); "
                "for a batch change feed use TxnTable.read_changes "
                "(silently reading would emit NULL _change_type rows)"
            )
        mpb = self.options.get("maxpartitionbytes") or self.options.get(
            "maxPartitionBytes"
        )
        pd_opt = str(
            self.options.get("pushdown")
            or self.options.get("filterpushdown")
            or self.options.get("filterPushdown")
            or "true"
        ).lower()
        # pushdown=false: a reader WITHOUT pushFilters, for sessions
        # where spark.sql.python.filterPushdown.enabled can't be turned
        # on (Spark hard-refuses pushFilters readers under conf=false —
        # see register_txn). Same rows, no commit-log file pruning.
        cls = TxnBatchReader if pd_opt != "false" else _TxnBatchReaderNoPushdown
        return cls(
            self._table_dir(),
            schema,
            at_version=self._version_as_of(),
            split_bytes=int(mpb) if mpb else 128 * 1024 * 1024,
        )

    def streamReader(self, schema: StructType) -> TxnStreamReader:
        mft = self.options.get("maxfilespertrigger") or self.options.get(
            "maxFilesPerTrigger"
        )
        sv = self.options.get("startingversion")
        if sv is None:
            sv = self.options.get("startingVersion")
        return TxnStreamReader(
            self._table_dir(),
            schema,
            str(self.options.get("ignoreChanges", "false")).lower() == "true",
            max_files=int(mft) if mft else None,
            cdf=self._cdf_on(),
            starting_version=int(sv) if sv is not None else None,
        )

    def _refuse_if_constrained(self, path_hint: str) -> None:
        # CHECK constraints cannot be enforced on this path: the
        # writer's commit hook runs in a Python worker with no live
        # SparkSession to scan the staged bytes with, and skipping
        # enforcement would let the connector silently bypass the
        # table's contract. Refuse at PLAN time with the enforced
        # alternative — the same honest-refusal discipline as
        # merge_branch's schema-evolution guard.
        import os

        from spark_data_engineering_spark.sources.txn import TxnTable

        d = self._table_dir()
        t = TxnTable(os.path.dirname(d), os.path.basename(d))
        cons = t.constraints()
        if cons:
            raise ValueError(
                f"table has CHECK constraints {sorted(cons)} which "
                f"{path_hint} cannot enforce (no SparkSession at commit "
                "time on this path); write through TxnTable.append / "
                "overwrite / append_idempotent (enforced), or drop the "
                "constraint first"
            )
        gcols = t.generated_cols()
        if gcols:
            # same honest refusal: the Arrow writer's commit hook cannot
            # evaluate SQL generation expressions (no SparkSession), so
            # it can neither compute missing generated columns nor
            # validate supplied ones
            raise ValueError(
                f"table has generated columns {sorted(gcols)} which "
                f"{path_hint} cannot compute or validate (no SparkSession "
                "at commit time on this path); write through "
                "TxnTable.append / overwrite / append_idempotent"
            )
        idcols = t.identity_cols()
        if idcols:
            # same honest refusal: identity allocation needs the
            # watermark read + conflict-checked around the commit, which
            # the Arrow writer's executor tasks cannot coordinate
            raise ValueError(
                f"table has identity columns {sorted(idcols)} which "
                f"{path_hint} cannot allocate (no watermark coordination "
                "on this path); write through TxnTable.append / "
                "overwrite / append_idempotent"
            )

    def writer(self, schema: StructType, overwrite: bool) -> "TxnArrowWriter":
        self._refuse_if_constrained("df.write.format('txn')")
        return TxnArrowWriter(self._table_dir(), schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "TxnStreamArrowWriter":
        self._refuse_if_constrained("writeStream.format('txn')")
        if overwrite:
            raise ValueError(
                "txn streaming sink supports append output mode only "
                "(an epoch-wise overwrite would discard prior epochs)"
            )
        app_id = self.options.get("txnappid") or self.options.get("txnAppId")
        if not app_id:
            raise ValueError(
                "txn streaming sink requires option('txnAppId', <id>): it "
                "namespaces the exactly-once epoch watermark; a default "
                "would make two queries writing one table dedupe each "
                "other's batches"
            )
        return TxnStreamArrowWriter(self._table_dir(), schema, app_id)


# ---- write path (round 7) ----------------------------------------------
#
# The connector gains the standard writer API, closing the loop: any
# Spark job can now `df.write.format("txn").mode(...).save(table_dir)`
# without knowing this library. The protocol maps 1:1 onto the table
# format's own commit discipline:
#
#   executor `write(RecordBatch iterator)` — each task streams its
#     batches into uniquely-named parquet files in the table's data
#     dir (ONE file normally; on a PARTITIONED table one VALUE-PURE
#     file per partition combo the task saw, split with vectorized
#     Arrow kernels, so connector writes keep partition pruning alive)
#     and harvests the footer stats locally; the files are INVISIBLE
#     (the log is the source of truth), so task retries/crashes leak
#     bytes, never rows. The commit message carries (file names, stats).
#   driver `commit(messages)` — one atomic log commit appends every
#     task's file (mode=append) or swaps the previous live set out
#     (mode=overwrite), with the logical schema folded in under the
#     same enforcement rule as TxnTable.append (same name + different
#     type is refused).
#   driver `abort(messages)` — unlink the orphaned task files.
#
# Arrow end-to-end (DataSourceArrowWriter): batches go Spark -> Arrow ->
# parquet without a row-at-a-time Python loop.


class _TxnWriteMessage(WriterCommitMessage):
    """One task's staged files: names + per-file footer stats. A list,
    not a single name — on a PARTITIONED table each task stages one
    value-pure file per partition combo it saw (mirroring the library
    path's partitionBy staging), so pruning metadata survives writes
    that never touch this library."""

    def __init__(self, names: list[str], stats: dict[str, dict]) -> None:
        self.names = names
        self.stats = stats


class TxnArrowWriter(DataSourceArrowWriter):
    def __init__(self, table_dir: str, schema: StructType, overwrite: bool) -> None:
        import json as _json
        import os

        from spark_data_engineering_spark.sources.txn import TxnTable

        self._table_dir = table_dir
        self._overwrite = overwrite
        t = TxnTable(os.path.dirname(table_dir), os.path.basename(table_dir))
        self._data_dir = t.data_dir
        # schema enforcement up front, on the driver, before any task
        # runs (TxnTable._merged_schema's rule without a DataFrame)
        incoming = [
            {"name": f.name, "type": _json.loads(f.dataType.json())}
            for f in schema.fields
        ]
        current = t.table_schema()
        by_name = {f["name"]: f for f in current}
        by_prev = {p: f for f in current for p in f.get("prev_names", ())}
        dropped = {f["name"] for f in current if f.get("dropped")}
        for f in incoming:
            if f["name"] in dropped:
                raise ValueError(
                    f"column {f['name']!r} was dropped; rewrite first or "
                    "pick a new name"
                )
            prev = by_name.get(f["name"]) or by_prev.get(f["name"])
            if prev is not None and prev["type"] != f["type"]:
                raise ValueError(
                    f"schema enforcement: column {f['name']!r} is "
                    f"{prev['type']} in the table but {f['type']} in the "
                    "incoming write; cast explicitly to change types"
                )
        self._incoming_schema = incoming
        # partitioned tables: each task splits its batches by partition
        # value (write() below) so connector-staged files stay
        # VALUE-PURE with recorded partitionValues — the same pruning
        # metadata the library's partitionBy staging produces. The
        # recorded string must equal Spark's cast-to-string (what the
        # library path records via hive dir names), so only types whose
        # Python formatting provably matches are accepted; the rest are
        # refused with the enforced alternative, not silently staged as
        # unprunable mixed files.
        self._pcols = t.partition_cols()
        if self._pcols:
            by_incoming = {f.name: f for f in schema.fields}
            missing = [c for c in self._pcols if c not in by_incoming]
            if missing:
                raise ValueError(
                    f"partitioned write is missing partition column(s) "
                    f"{missing}; the table is partitioned by {self._pcols}"
                )
            allowed = ("string", "long", "integer", "short", "byte", "boolean")
            bad = {
                c: by_incoming[c].dataType.typeName()
                for c in self._pcols
                if by_incoming[c].dataType.typeName() not in allowed
            }
            if bad:
                raise ValueError(
                    f"partition column(s) {bad} have types this write "
                    "path cannot format identically to the library's "
                    "partitionValues encoding (Spark cast-to-string); "
                    "write through TxnTable.append / overwrite, or "
                    "partition by a string/integer/boolean column"
                )

    @staticmethod
    def _fmt_pv(v) -> "str | None":
        """The partitionValues string for one typed value — must equal
        Spark's cast-to-string for every type __init__ admits (bool is
        the one Python formats differently)."""
        if v is None:
            return None
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def write(self, iterator):  # executor-side
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        from spark_data_engineering_spark.sources.txn import TxnTable

        cid = uuid.uuid4().hex
        if not self._pcols:
            name = f"{cid}-w0.parquet"
            path = os.path.join(self._data_dir, name)
            writer = None
            rows = 0
            try:
                for batch in iterator:
                    if writer is None:
                        writer = pq.ParquetWriter(path, batch.schema)
                    writer.write_table(pa.Table.from_batches([batch]))
                    rows += batch.num_rows
            finally:
                if writer is not None:
                    writer.close()
            if rows == 0:
                if writer is not None:
                    os.unlink(path)
                return _TxnWriteMessage([], {})
            return _TxnWriteMessage([name], {name: TxnTable._footer_minmax(path)})
        # PARTITIONED: split each batch by partition-value combo with
        # vectorized Arrow kernels (cast -> element-wise key join ->
        # unique -> filter; no Python row loop) and stream each combo's
        # rows into its own value-pure parquet. partitionValues are read
        # from the first row of each combo — typed, then formatted by
        # the same rule the library's hive staging records.
        import pyarrow.compute as pc

        writers: dict = {}  # key string -> [name, ParquetWriter, pv dict]
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                tbl = pa.Table.from_batches([batch])
                cols = [tbl.column(c) for c in self._pcols]
                strs = [pc.cast(c, pa.string()) for c in cols]
                if len(strs) == 1:
                    key = pc.fill_null(strs[0], "\x00N")
                else:
                    key = pc.binary_join_element_wise(
                        *strs,
                        "\x1f",
                        null_handling="replace",
                        null_replacement="\x00N",
                    )
                for u in pc.unique(key).to_pylist():
                    mask = pc.equal(key, u)
                    sub = tbl.filter(mask)
                    ent = writers.get(u)
                    if ent is None:
                        name = f"{cid}-w{len(writers)}.parquet"
                        w = pq.ParquetWriter(
                            os.path.join(self._data_dir, name), tbl.schema
                        )
                        first = pc.index(mask, pa.scalar(True)).as_py()
                        pv = {
                            c: self._fmt_pv(col[first].as_py())
                            for c, col in zip(self._pcols, cols)
                        }
                        ent = writers[u] = [name, w, pv]
                    ent[1].write_table(sub)
        finally:
            for _name, w, _pv in writers.values():
                w.close()
        names, stats = [], {}
        for name, _w, pv in writers.values():
            path = os.path.join(self._data_dir, name)
            st = TxnTable._footer_minmax(path)
            st["partitionValues"] = pv
            names.append(name)
            stats[name] = st
        return _TxnWriteMessage(sorted(names), stats)

    def commit(self, messages):  # driver-side, once, atomic
        import os

        from spark_data_engineering_spark.sources.txn import TxnTable

        t = TxnTable(
            os.path.dirname(self._table_dir), os.path.basename(self._table_dir)
        )
        add = [n for m in messages if m is not None for n in m.names]
        stats = {
            n: st
            for m in messages
            if m is not None
            for n, st in m.stats.items()
        }
        # pin the snapshot version FIRST and compute the removed set AT
        # it (the repo-wide rewrite rule): reading live_files() at one
        # head and base_version at a later one leaves a gap where a
        # concurrent deletion vector lands outside the conflict window
        # and its delete silently vanishes with the overwritten files
        v0 = t.version()
        remove = t.live_files(v0) if self._overwrite else []
        t._commit(
            "overwrite" if self._overwrite else "append",
            add,
            remove,
            stats=stats,
            schema=self._incoming_schema,
            base_version=v0 if remove else None,
        )

    def abort(self, messages):  # driver-side on task failure
        import os

        for m in messages:
            for name in m.names if m is not None else ():
                try:
                    os.unlink(os.path.join(self._data_dir, name))
                except FileNotFoundError:
                    pass


class TxnStreamArrowWriter(TxnArrowWriter, DataSourceStreamArrowWriter):
    """Native STREAMING sink: ``df.writeStream.format("txn")`` — each
    micro-batch reuses the batch writer's executor protocol (one
    uniquely-named parquet per task, invisible until commit) and the
    driver lands ONE commit per epoch carrying an ``(app, batchId)``
    watermark, so a crash-redelivered epoch commits NOTHING (the
    ``append_idempotent`` exactly-once contract, spoken through the
    standard writeStream API instead of foreachBatch —
    streaming/events.py:227's ``stream_to_txn_table`` without the
    library import). ``txnAppId`` is a REQUIRED option: it namespaces
    the watermark, and defaulting it would make two distinct queries
    writing one table dedupe each other's epochs."""

    def __init__(self, table_dir: str, schema: StructType, app_id: str) -> None:
        TxnArrowWriter.__init__(self, table_dir, schema, overwrite=False)
        self._app_id = app_id

    def commit(self, messages, batchId):  # driver-side, once per epoch
        import os

        from spark_data_engineering_spark.sources.txn import TxnTable

        t = TxnTable(
            os.path.dirname(self._table_dir), os.path.basename(self._table_dir)
        )
        staged = [n for m in messages if m is not None for n in m.names]
        if batchId <= t.last_epoch(self._app_id):
            # crash-redelivered epoch: this batch already committed in a
            # previous run — publish nothing, and the re-staged task
            # files are orphans (unlink now; vacuum would also collect)
            for name in staged:
                try:
                    os.unlink(os.path.join(self._data_dir, name))
                except FileNotFoundError:
                    pass
            return
        stats = {
            n: st
            for m in messages
            if m is not None
            for n, st in m.stats.items()
        }
        # empty epochs still commit: the watermark must advance or a
        # redelivery of a later non-empty epoch could double-commit
        t._commit(
            "streaming-append",
            staged,
            [],
            stats=stats,
            txn=(self._app_id, batchId),
            schema=self._incoming_schema,
        )

    def abort(self, messages, batchId):  # driver-side on epoch failure
        TxnArrowWriter.abort(self, messages)
