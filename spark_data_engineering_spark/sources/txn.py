"""Transaction-logged parquet tables: ACID commits on a plain filesystem.

The reference stores every table as Delta (spark/conf/spark-defaults.conf:14,
etl/utils/base_table.py:211-217); this environment has no Delta jar, so
this module re-implements the part of the protocol the pipelines rely on
— atomic commits, snapshot isolation, time travel, OPTIMIZE/VACUUM — the
way the Delta paper describes it (Armbrust et al., "Delta Lake:
High-Performance ACID Table Storage over Cloud Object Stores", VLDB 2020):
an ordered log of JSON commit files, each adding/removing immutable data
files, with the *log entry creation* as the single atomic operation.

Layout:
    <root>/<name>/_txn_log/00000000000000000001.json   one file per commit
    <root>/<name>/_txn_log/<version>.checkpoint.json   log compaction
    <root>/<name>/data/<commit-uuid>-<i>.parquet       immutable data files

Commit protocol (optimistic concurrency):
    1. stage data files under data/ with a commit-unique prefix
    2. resolve the current version V from the log listing
    3. write the commit JSON to a temp name, then ``os.link`` it to
       ``V+1`` — hard-linking is atomic and FAILS if V+1 exists, so two
       racing writers cannot both win (POSIX/HDFS; object stores use a
       conditional put here)
    4. on collision: appends re-attempt against the new head; rewrites
       (overwrite/compact/delete) first re-validate that no file they
       remove was already removed by the winner, else raise

Readers never list data/ — the live file set comes from replaying the
log, so half-staged files from a crashed writer are invisible (and
cleaned by vacuum). A checkpoint every ``checkpoint_every`` commits
bounds replay to O(commits since checkpoint): at 100 TB with minutely
appends the log is the metadata bottleneck, exactly why Delta
checkpoints.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_txn_log"
_DATA_DIR = "data"
_VERSION_DIGITS = 20


class ConcurrentWriteError(RuntimeError):
    """A rewrite lost the race: a file it removes was already removed."""


class TxnTable:
    def __init__(self, root: str, name: str, checkpoint_every: int = 10) -> None:
        self.table_dir = os.path.join(root, name)
        self.log_dir = os.path.join(self.table_dir, _LOG_DIR)
        self.data_dir = os.path.join(self.table_dir, _DATA_DIR)
        self.checkpoint_every = checkpoint_every
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ---- log plumbing ---------------------------------------------------

    def _commit_files(self) -> list[int]:
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.endswith(".checkpoint.json") and not f.startswith(".")
        )

    def version(self) -> int:
        """Latest committed version (0 = empty table)."""
        versions = self._commit_files()
        return versions[-1] if versions else 0

    def _read_commit(self, v: int) -> dict:
        with open(os.path.join(self.log_dir, f"{v:0{_VERSION_DIGITS}d}.json")) as f:
            return json.load(f)

    def _checkpoint_path(self, v: int) -> str:
        return os.path.join(self.log_dir, f"{v:0{_VERSION_DIGITS}d}.checkpoint.json")

    def _latest_checkpoint(self, at_version: int) -> tuple[int, list[str]]:
        cps = sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".checkpoint.json") and not f.startswith(".")
        )
        cps = [v for v in cps if v <= at_version]
        if not cps:
            return 0, []
        with open(self._checkpoint_path(cps[-1])) as f:
            return cps[-1], json.load(f)["live"]

    def live_files(self, at_version: int | None = None) -> list[str]:
        """Replay the log (from the nearest checkpoint) to the live file
        set at a version — the snapshot readers see."""
        head = self.version() if at_version is None else at_version
        start, live_list = self._latest_checkpoint(head)
        live = set(live_list)
        for v in self._commit_files():
            if start < v <= head:
                c = self._read_commit(v)
                live.difference_update(c.get("remove", ()))
                live.update(c.get("add", ()))
        return sorted(live)

    def _try_commit(self, record: dict) -> bool:
        """Atomically claim version ``record['version']``. True on win."""
        tmp = os.path.join(self.log_dir, f".tmp.{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(record, f)
        final = os.path.join(self.log_dir, f"{record['version']:0{_VERSION_DIGITS}d}.json")
        try:
            os.link(tmp, final)  # atomic; fails if a racer claimed it
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _commit(self, action: str, add: list[str], remove: list[str]) -> int:
        """Commit with optimistic retry. Appends retry blindly (their
        files conflict with nothing); rewrites re-validate that every
        file they remove is still live under the new head."""
        while True:
            head = self.version()
            if remove:
                still_live = set(self.live_files(head))
                gone = [f for f in remove if f not in still_live]
                if gone:
                    raise ConcurrentWriteError(
                        f"{action} conflicts: files already removed by a "
                        f"concurrent commit: {gone[:3]}..."
                    )
            record = {"version": head + 1, "action": action, "add": add, "remove": remove}
            if self._try_commit(record):
                v = head + 1
                if v % self.checkpoint_every == 0:
                    # resolve the live set BEFORE creating the file — a
                    # half-written checkpoint must never be readable
                    state = {"version": v, "live": self.live_files(v)}
                    tmp = os.path.join(self.log_dir, f".cp.{uuid.uuid4().hex}.json")
                    with open(tmp, "w") as f:
                        json.dump(state, f)
                    os.replace(tmp, self._checkpoint_path(v))
                return v

    # ---- data staging ---------------------------------------------------

    def _stage(self, df: DataFrame) -> list[str]:
        """Write df's files into data/ under a commit-unique prefix.
        Staged-but-uncommitted files are invisible to readers (the log is
        the source of truth), so a crash here leaks bytes, not rows."""
        cid = uuid.uuid4().hex
        staging = os.path.join(self.table_dir, f".staging-{cid}")
        df.write.mode("overwrite").parquet(staging)
        names = []
        i = 0
        for f in sorted(os.listdir(staging)):
            if f.endswith(".parquet"):
                name = f"{cid}-{i}.parquet"
                os.rename(os.path.join(staging, f), os.path.join(self.data_dir, name))
                names.append(name)
                i += 1
        shutil.rmtree(staging)
        return names

    # ---- public operations ----------------------------------------------

    def append(self, df: DataFrame) -> int:
        return self._commit("append", self._stage(df), [])

    def overwrite(self, df: DataFrame) -> int:
        # resolve the files to replace BEFORE staging; _commit re-validates
        removed = self.live_files()
        return self._commit("overwrite", self._stage(df), removed)

    def read(self, spark: SparkSession, at_version: int | None = None) -> DataFrame:
        files = self.live_files(at_version)
        if not files:
            raise FileNotFoundError(f"table {self.table_dir} is empty at this version")
        paths = [os.path.join(self.data_dir, f) for f in files]
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def delete_where(self, spark: SparkSession, predicate) -> int:
        """DELETE: rewrite only the files that contain matching rows
        (discovered via the ``_metadata.file_path`` column — one filtered
        scan, no full-table rewrite). Files with no matches are untouched,
        the property that makes point-deletes feasible on huge tables."""
        df = self.read(spark).withColumn("_file", F.col("_metadata.file_path"))
        hit_paths = [
            r["_file"]
            for r in df.filter(predicate).select("_file").distinct().collect()
        ]
        if not hit_paths:
            return self.version()
        hit_names = sorted(os.path.basename(p) for p in hit_paths)
        # DELETE WHERE p removes rows where p is TRUE; NULL-p rows survive
        # (~NULL would silently drop them)
        survivors = (
            spark.read.option("mergeSchema", "true")
            .parquet(*[os.path.join(self.data_dir, n) for n in hit_names])
            .filter(~F.coalesce(predicate, F.lit(False)))
        )
        add = self._stage(survivors) if survivors.limit(1).count() else []
        return self._commit("delete", add, hit_names)

    def compact(self, spark: SparkSession, target_file_bytes: int = 128 * 1024 * 1024) -> int:
        """OPTIMIZE: bin-pack the live files into ~target-sized files and
        swap them in one atomic commit. Readers at any version are never
        affected — the old files stay until vacuum."""
        files = self.live_files()
        if not files:
            return self.version()
        paths = [os.path.join(self.data_dir, f) for f in files]
        total = sum(os.path.getsize(p) for p in paths)
        n_out = max(1, -(-total // target_file_bytes))
        packed = spark.read.option("mergeSchema", "true").parquet(*paths).coalesce(n_out)
        return self._commit("compact", self._stage(packed), files)

    def vacuum(self, keep_versions: int = 1, min_age_s: float = 0.0) -> list[str]:
        """Delete data files referenced by NO retained version (the last
        ``keep_versions`` snapshots stay time-travelable). ``min_age_s``
        is the Delta-style retention guard: a writer that has staged files
        but not yet committed would otherwise lose them to a concurrent
        vacuum — production keeps this above the longest plausible commit
        duration."""
        import time

        head = self.version()
        keep = set()
        for v in range(max(1, head - keep_versions + 1), head + 1):
            keep.update(self.live_files(v))
        now = time.time()
        removed = []
        for f in os.listdir(self.data_dir):
            path = os.path.join(self.data_dir, f)
            if (
                f.endswith(".parquet")
                and f not in keep
                and now - os.path.getmtime(path) >= min_age_s
            ):
                os.unlink(path)
                removed.append(f)
        return sorted(removed)

    def history(self) -> list[dict]:
        return [self._read_commit(v) for v in self._commit_files()]


class TxnStore:
    """SnapshotStore-compatible facade over ``TxnTable`` — the duck-typed
    ``write / read_latest / path`` surface ``plans.dag.Runner`` expects,
    so the medallion pipeline can materialize every layer through atomic
    commits instead of partition-directory snapshots.

    Each pipeline batch is ONE ``overwrite`` commit (full-snapshot
    semantics, matching the reference's full-reload ETL); the previous
    batch stays time-travelable via ``read_version`` until vacuum. The
    batch timestamp is stamped as the same ``etl_inserted`` column the
    snapshot store uses, so downstream schemas are identical under either
    backend."""

    def __init__(self, root: str, checkpoint_every: int = 10) -> None:
        self.root = root
        self.checkpoint_every = checkpoint_every
        self._tables: dict[str, TxnTable] = {}

    def _table(self, name: str) -> TxnTable:
        if name not in self._tables:
            self._tables[name] = TxnTable(
                self.root, name, checkpoint_every=self.checkpoint_every
            )
        return self._tables[name]

    def path(self, name: str) -> str:
        return self._table(name).table_dir

    def write(self, name, df: DataFrame, batch_ts, partition_keys=()) -> None:
        from spark_data_engineering_spark.sources.snapshot import PARTITION_COL, _fmt_ts

        stamped = df.withColumn(PARTITION_COL, F.lit(_fmt_ts(batch_ts)))
        self._table(name).overwrite(stamped)

    def read_latest(self, spark: SparkSession, name: str, columns=None) -> DataFrame:
        df = self._table(name).read(spark)
        return df.select(*columns) if columns else df

    def read_version(self, spark: SparkSession, name: str, version: int) -> DataFrame:
        return self._table(name).read(spark, at_version=version)

    def history(self, name: str) -> list[dict]:
        return self._table(name).history()
