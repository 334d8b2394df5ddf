"""Digest helpers for /tmp-cached derived state (staged format copies,
persisted ANN indexes, streaming-replay TxnTables).

Data-only caches key on the source file's (path, mtime, size). Caches of
DERIVED state must also key on the code that derived it — otherwise a
code change silently reuses state computed by the old code and the
correctness gate records green evidence for a path that never ran
(round-4 review finding). ``code_digest`` folds the source bytes of the
implementing modules into the key, so any edit invalidates the cache.
"""

from __future__ import annotations

import hashlib


def code_digest(*modules) -> str:
    """Hex digest of the given modules' source bytes."""
    h = hashlib.md5()
    for m in modules:
        with open(m.__file__, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:12]


def claim(root: str) -> bool:
    """Cache-hit check that KEEPS the entry alive: True iff the
    published root exists, with its mtime refreshed so a concurrent
    process's ``sweep_stale`` (1h cutoff) is very unlikely to reap it
    between this check and the read. Without the utime, two
    overlapping runs race wide open: run A finds a >1h-old root and
    skips the build, run B's sweep deletes it, run A's read crashes
    (round-9 full-suite flake). The sweep side cooperates (ADVICE r9):
    it renames a stale entry to a tombstone FIRST, then re-checks the
    tombstone's mtime — a utime that landed before the rename restores
    the entry; one that lands after fails with ENOENT and this
    function returns False, so the caller rebuilds (always safe). The
    residual window is the instant between a successful utime here and
    the sweeper's post-rename re-check — microseconds against a 1h
    cutoff, and losing it costs a rebuild-crash only if the reader
    opens files during the rename blip."""
    import os

    if not os.path.isdir(root):
        return False
    try:
        os.utime(root)
    except OSError:
        return False  # reaped/tombstoned in the window: rebuild
    return True


def sweep_stale(parent: str, max_age_s: float = 3600.0) -> None:
    """Best-effort cleanup of fresh-build scratch dirs (the queries that
    mkdtemp a new table per call — txn_snapshot_join, dv_delete_report,
    export_training_shards): entries older than ``max_age_s`` are
    removed so repeated gate/bench runs can't slowly fill /tmp. Never
    raises — a racing run's dir mid-build is simply skipped (it is
    younger than the cutoff by construction).

    Deletion is tombstone-first (ADVICE r9): rename the stale entry
    away, re-check its mtime, and only then rmtree — a concurrent
    ``claim()`` whose utime landed before the rename gets the entry
    restored; one after the rename fails fast (ENOENT) and rebuilds.
    Orphaned tombstones (a sweeper killed mid-rmtree) are reaped only
    once older than the cutoff — a fresh tombstone is a live sweeper's
    pending restore-or-delete decision and must be left to it."""
    import os
    import shutil
    import time

    if not os.path.isdir(parent):
        return
    cutoff = time.time() - max_age_s
    for d in os.listdir(parent):
        path = os.path.join(parent, d)
        if ".sweeping-" in d:
            # orphaned tombstone (a sweeper killed mid-rmtree). Reap
            # only ones older than the cutoff: a FRESH tombstone (its
            # mtime refreshed by a claim() that landed before the
            # rename) belongs to a live sweeper whose restore re-check
            # is still pending — reaping it on sight would delete an
            # entry whose claim already returned True and crash the
            # reader (round-10 advice: that race was wider than the
            # microseconds the old docstring assumed). A stale
            # tombstone is one its owner would rmtree anyway.
            try:
                if os.path.getmtime(path) < cutoff:
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                pass
            continue
        tomb = f"{path}.sweeping-{os.getpid()}"
        try:
            if os.path.getmtime(path) >= cutoff:
                continue
            os.rename(path, tomb)
            if os.path.getmtime(tomb) >= cutoff:
                os.rename(tomb, path)  # claimed in the window: restore
            else:
                shutil.rmtree(tomb, ignore_errors=True)
        except OSError:
            pass
