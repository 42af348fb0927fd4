"""Snapshot log + time-travel reads over the bucketed index layout —
the Iceberg metadata pattern EXECUTED on plain parquet (this sandbox
has no Iceberg jars; each piece maps 1:1 to its Iceberg analog and the
call sites would swap to real Iceberg commits unchanged):

- ``snapshots.json``  <->  table ``metadata.json`` + snapshot list
- ``v<N>/`` immutable snapshot dir  <->  a snapshot's manifest/data set
- ``commit_snapshot``  <->  an append/rewrite commit (new snapshot id,
  parent pointer, operation tag)
- ``read_snapshot(root, snapshot_id=K)``  <->  time travel
  (``VERSION AS OF K``)
- atomic ``os.replace`` of the log  <->  the catalog's atomic metadata
  pointer swap: a writer never mutates an existing ``v<N>`` directory,
  so concurrent readers of any older snapshot are unaffected.

Lineage is the parent chain; per-snapshot ``note``/``operation`` record
WHY a snapshot exists (initial build, streaming compaction, delete,
re-crawl) — the audit trail a production index needs.
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

from ..config import DEFAULT_CONFIG, EngineConfig
from .builder import IndexTables, read_index, write_index


def _log_path(root: str) -> str:
    return os.path.join(root, "snapshots.json")


@contextmanager
def _log_lock(root: str, timeout_sec: float = 120.0):
    """Exclusive kernel flock on ``snapshots.json.lock``.  Blocks (with
    a loud timeout) until acquired; released on close — including by
    the kernel if the holder dies, so there is no stale-lock state and
    no recovery TOCTOU.  flock contends per open-file-description, so
    racing threads in one process serialize too."""
    import fcntl
    import time

    lock = _log_path(root) + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    try:
        deadline = time.monotonic() + timeout_sec
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except BlockingIOError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"could not acquire snapshot log lock {lock}")
                time.sleep(0.05)
        yield
    finally:
        os.close(fd)  # releases the flock


def snapshot_log(root: str) -> list[dict]:
    p = _log_path(root)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def current_snapshot_id(root: str) -> int | None:
    log = snapshot_log(root)
    return log[-1]["id"] if log else None


def commit_snapshot(
    tables: IndexTables,
    root: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    operation: str = "append",
    note: str = "",
    parent: int | None = None,
    extra: dict | None = None,
) -> int:
    """Write the tables as a NEW immutable snapshot and append it to the
    log (atomic pointer swap).  Returns the new snapshot id.

    Concurrency-safe like an Iceberg CAS commit, with two separate
    atomic steps so the slow data write runs WITHOUT any lock held:

    1. claim a snapshot id by ``os.mkdir(v<N>)`` — the mkdir is the
       atomic claim; a racing committer gets ``FileExistsError`` and
       retries with the next id (never two writers in one directory);
    2. append to the log under an exclusive kernel flock
       (``_log_lock``), RE-READING the log inside the lock — a
       committer that claimed a lower id but finished later appends
       later, so ``log[-1]`` is always the latest COMMITTED snapshot
       (commit order, like a catalog's pointer swap) and no entry can
       be silently dropped.
    """
    os.makedirs(root, exist_ok=True)
    # step 1: claim an id (mkdir is atomic on POSIX)
    sid = (max((e["id"] for e in snapshot_log(root)), default=0)) + 1
    while True:
        sdir = os.path.join(root, f"v{sid}")
        try:
            os.mkdir(sdir)
            break
        except FileExistsError:
            sid += 1  # another committer claimed it (or an old dir exists)
    write_index(tables, sdir, cfg)
    # step 2: read-modify-replace the log under a kernel-managed flock.
    # An O_EXCL lock FILE needs stale-owner recovery, and every
    # recovery scheme on a plain path has a TOCTOU (between checking
    # staleness and removing it, the stale owner can release and a NEW
    # owner acquire — the removal then kills the new owner's lock and
    # two committers race the log).  flock has no staleness at all: the
    # kernel drops the lock when the holder's fd closes, including on
    # process death.  (Single-host like this sandbox; on a shared
    # filesystem the production analog is the catalog's CAS commit.)
    with _log_lock(root):
        log = snapshot_log(root)  # re-read under the lock
        if parent is None:
            parent = log[-1]["id"] if log else None
        entry = {
            "id": sid,
            "parent": parent,
            "operation": operation,
            "note": note,
            "n_docs": tables.stats.get("n_docs"),
            "n_postings": tables.stats.get("n_postings"),
            "dir": f"v{sid}",
            # operation-specific metadata (e.g. merge_into_snapshot's
            # delta batch watermark) rides the log entry
            **(extra or {}),
        }
        tmp = _log_path(root) + f".tmp{sid}"
        with open(tmp, "w") as f:
            json.dump(log + [entry], f, indent=2)
        os.replace(tmp, _log_path(root))
    return sid


def read_snapshot(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> IndexTables:
    """Time-travel read: ``snapshot_id=None`` reads the current snapshot,
    any earlier id reads that version byte-for-byte (its directory is
    never rewritten by later commits)."""
    log = snapshot_log(root)
    if not log:
        raise FileNotFoundError(f"no snapshots at {root}")
    if snapshot_id is None:
        entry = log[-1]
    else:
        matches = [e for e in log if e["id"] == snapshot_id]
        if not matches:
            raise KeyError(f"snapshot {snapshot_id} not in log {[e['id'] for e in log]}")
        entry = matches[0]
    return read_index(spark, os.path.join(root, entry["dir"]))


def expire_snapshots(root: str, keep_last: int = 2) -> list[int]:
    """Retention GC — the ``expireSnapshots`` analog: keep the last
    ``keep_last`` COMMITTED snapshots (commit order, i.e. the log
    tail), delete every older snapshot's ``v<K>`` directory and drop
    its log entry.  A retained entry whose parent was expired gets its
    parent pointer truncated to the nearest RETAINED ancestor (or
    ``None``), with the original id preserved as ``expired_parent`` —
    so ``snapshot_lineage`` keeps working on a self-consistent log and
    the truncation stays auditable.  Runs entirely under the commit
    lock: a racing ``commit_snapshot`` either lands before the horizon
    is computed or appends after the rewritten log — never
    half-expired.

    Returns the expired snapshot ids (empty when nothing to do).
    Readers that already opened an expired snapshot keep working until
    their DataFrames are re-planned — same contract as Iceberg: expire
    only what no one should still be time-traveling to.
    """
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    with _log_lock(root):
        log = snapshot_log(root)
        if len(log) <= keep_last:
            return []
        by_id = {e["id"]: e for e in log}
        keep_ids = {e["id"] for e in log[-keep_last:]}
        expired = [e for e in log if e["id"] not in keep_ids]

        def nearest_retained(sid: int | None) -> int | None:
            while sid is not None and sid not in keep_ids:
                sid = by_id[sid]["parent"] if sid in by_id else None
            return sid

        kept_log = []
        for e in log[-keep_last:]:
            e = dict(e)
            if e["parent"] is not None and e["parent"] not in keep_ids:
                e["expired_parent"] = e["parent"]
                e["parent"] = nearest_retained(e["parent"])
            kept_log.append(e)
        # merge_into_snapshot's delta watermark is max(merge_watermark)
        # over log ENTRIES; if the only entries carrying it are being
        # expired (e.g. compaction commits landed after the last merge),
        # the rewritten log would reset it to -1 and the next merge
        # would re-consume every already-merged delta batch.  Carry the
        # expired maximum onto the oldest retained entry.
        expired_wm = max((e.get("merge_watermark", -1) for e in expired),
                         default=-1)
        kept_wm = max((e.get("merge_watermark", -1) for e in kept_log),
                      default=-1)
        if expired_wm > kept_wm:
            kept_log[0]["merge_watermark"] = expired_wm
        tmp = _log_path(root) + ".tmp.expire"
        with open(tmp, "w") as f:
            json.dump(kept_log, f, indent=2)
        os.replace(tmp, _log_path(root))  # atomic pointer swap first
        for e in expired:  # then drop the unreferenced data dirs
            shutil.rmtree(os.path.join(root, e["dir"]), ignore_errors=True)
        return [e["id"] for e in expired]


def snapshot_lineage(root: str, snapshot_id: int | None = None) -> list[dict]:
    """Walk the parent chain from ``snapshot_id`` (default: current)
    back to the initial snapshot — newest first.

    "Current" is the LAST COMMITTED entry (``log[-1]``), matching
    ``current_snapshot_id``/``read_snapshot`` — NOT ``max(id)``: under
    the CAS commit protocol a lower id can commit after a higher one,
    and the two notions would diverge."""
    entries = snapshot_log(root)
    log = {e["id"]: e for e in entries}
    if not log:
        return []
    sid = snapshot_id if snapshot_id is not None else entries[-1]["id"]
    chain = []
    while sid is not None:
        e = log[sid]
        chain.append(e)
        sid = e["parent"]
    return chain
