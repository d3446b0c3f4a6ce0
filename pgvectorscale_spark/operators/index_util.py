"""Shared index-maintenance plumbing: the single-writer lock.

The reference serializes index writers with a transaction-scoped advisory
lock (src/util/ports.rs:160, regression-tested by
tests/test_concurrent_inserts.py). The parquet-backed analog is an
atomically-created lock file per index directory (O_CREAT|O_EXCL — atomic
on local and network POSIX filesystems; swap in a conditional-put on
object stores). Used by every mutable index type.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

__all__ = [
    "ConcurrentWriterError",
    "delete_dir",
    "dir_exists",
    "file_exists",
    "list_subdirs",
    "prepare_rebuild",
    "snapshot_base_dirs",
    "sweep_trash",
    "swept_marker_path",
    "writer_lock",
]


def _pa_fs(path: str):
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def dir_exists(path: str) -> bool:
    """Directory-existence probe on the path's OWN filesystem — os.path
    calls silently return False for s3://... / hdfs://... URIs, which would
    make readers skip committed delta generations on remote stores."""
    from pyarrow import fs as pafs

    try:
        fsys, p = _pa_fs(path)
        return fsys.get_file_info(p).type == pafs.FileType.Directory
    except Exception:
        return False


def file_exists(path: str) -> bool:
    """File-existence probe on the path's own filesystem (remote-capable
    twin of os.path.isfile)."""
    from pyarrow import fs as pafs

    try:
        fsys, p = _pa_fs(path)
        return fsys.get_file_info(p).type == pafs.FileType.File
    except Exception:
        return False


def swept_marker_path(partition_dir: str) -> str:
    """Marker file recording that a partition subdir (``.../shard=K`` /
    ``.../centroid_id=K``) was SWEPT from a still-live parent dir. Lets a
    reader whose meta predates the fold distinguish 'this shard was never
    populated' (no dir, no marker -> legitimately empty) from 'this shard
    was folded away and its superseded copy reclaimed' (no dir, marker ->
    StaleIndexReadError instead of silently serving an empty shard).
    Markers are tiny, at most one per partition of the parent, and die
    with the parent dir."""
    parent, name = os.path.split(partition_dir.rstrip("/"))
    return os.path.join(parent, f"_swept_{name}")


def delete_dir(path: str) -> None:
    """Recursively delete a directory on its own filesystem; missing is
    fine. The remote-capable sibling of shutil.rmtree(ignore_errors=True)."""
    try:
        fsys, p = _pa_fs(path)
        fsys.delete_dir(p)
    except Exception:
        pass


def list_subdirs(path: str, prefix: str) -> list[str]:
    """Names of immediate subdirectories starting with ``prefix`` (e.g.
    partition dirs ``shard=``/``centroid_id=``), on any pyarrow-supported
    filesystem. Missing path -> []."""
    from pyarrow import fs as pafs

    try:
        fsys, p = _pa_fs(path)
        infos = fsys.get_file_info(pafs.FileSelector(p, recursive=False))
    except Exception:
        return []
    out = []
    for info in infos:
        name = info.path.rstrip("/").rsplit("/", 1)[-1]
        if info.type == pafs.FileType.Directory and name.startswith(prefix):
            out.append(name)
    return out


def sweep_trash(path: str, meta) -> None:
    """Delete data dirs superseded one maintenance cycle ago, plus orphan
    generation dirs from crashed jobs (subdirs of nodes_gens/ or
    nodes_delta/ that no committed meta ever referenced). Called at the
    START of a fold/rebuild while holding the writer lock, so anything
    superseded by the LAST fold has had a full cycle for in-flight readers
    to finish. Clears meta.trash_dirs in place (caller saves the meta)."""
    import glob
    import re
    import shutil

    for rel in meta.trash_dirs:
        p = os.path.join(path, rel)
        was_there = os.path.exists(p) or dir_exists(p) or file_exists(p)
        if os.path.isfile(p):
            try:
                os.remove(p)
            except OSError:
                pass
        shutil.rmtree(p, ignore_errors=True)
        delete_dir(p)  # remote-capable twin
        # partition subdir reclaimed from a still-live parent: leave a
        # swept marker so readers with a pre-fold meta fail stop instead
        # of mistaking the gap for a never-populated shard
        if was_there and re.search(r"(shard|centroid_id)=\d+/?$", rel):
            marker = swept_marker_path(p)
            if os.path.isdir(os.path.dirname(marker)):
                try:
                    with open(marker, "w"):
                        pass
                except OSError:
                    pass
    # orphan temp metas from crashed atomic saves (tiny, but unbounded
    # accumulation over crashes would be litter)
    for tmp in glob.glob(os.path.join(path, "_index_meta.*.tmp")):
        try:
            os.remove(tmp)
        except OSError:
            pass
    meta.trash_dirs = []
    live = {rel for rel in (meta.shard_base or {}).values() if rel}
    live.add(meta.base_rel)
    for name in list_subdirs(os.path.join(path, "nodes_gens"), ""):
        rel = f"nodes_gens/{name}"
        if rel not in live:
            p = os.path.join(path, rel)
            shutil.rmtree(p, ignore_errors=True)
            delete_dir(p)
    live_delta = set(meta.delta_gens)
    for name in list_subdirs(os.path.join(path, "nodes_delta"), ""):
        rel = f"nodes_delta/{name}"
        if rel not in live_delta:
            p = os.path.join(path, rel)
            shutil.rmtree(p, ignore_errors=True)
            delete_dir(p)


def snapshot_base_dirs(path: str, meta, part_col: str) -> list[tuple[str, list[int] | None]]:
    """The current base snapshot as ``[(absolute dir, partition restriction)]``
    — the protocol-level view both index types' Spark readers build their
    union from (``part_col`` is ``shard`` for DiskANN, ``centroid_id`` for
    IVF). Restriction ``None`` means read the whole dir; a list means read
    ONLY those partitions from it.

    FS-aware: the ``base_rel`` dir is consulted by LISTING its partition
    subdirs, and included only for partitions present on disk and not
    overridden by a fold (``meta.shard_base``). That makes the view correct
    when every populated partition has been folded away and swept — the
    base dir then holds no parquet at all and scanning it would fail schema
    inference — including the never-populated-cell case where
    ``range(num_shards)`` style reasoning over-counts. Superseded copies of
    folded partitions (awaiting their trash grace cycle) are excluded by
    the restriction lists."""
    mapping = getattr(meta, "shard_base", None) or {}
    base_abs = os.path.join(path, meta.base_rel)
    if not mapping:
        return [(base_abs, None)]
    mapped = {int(s) for s in mapping}
    present = {
        int(name.split("=", 1)[1])
        for name in list_subdirs(base_abs, f"{part_col}=")
    }
    out: list[tuple[str, list[int] | None]] = []
    unmapped_present = sorted(present - mapped)
    if unmapped_present:
        out.append((base_abs, unmapped_present))
    by_dir: dict[str, list[int]] = {}
    for s, rel in mapping.items():
        if rel:  # "" = emptied-by-fold sentinel: no rows anywhere
            by_dir.setdefault(rel, []).append(int(s))
    for rel, ss in sorted(by_dir.items()):
        out.append((os.path.join(path, rel), sorted(ss)))
    return out


def prepare_rebuild(path: str) -> tuple[str, list[str], int, int]:
    """Pick the base dir for a (re)build and collect the prior index's data
    dirs as grace-period trash. A fresh path gets the conventional
    ``nodes`` layout; a path with a readable prior index gets a FRESH
    generation dir (never an in-place overwrite of a dir readers may be
    scanning) and every prior data dir queued for the next sweep. Returns
    ``(dest_rel, trash_dirs, epoch, delta_counter)`` for the new meta —
    epoch stays monotonic and the delta counter carries over so new chain
    dirs can't collide with trashed ones during the grace cycle."""
    import uuid

    from pgvectorscale_spark.types import IndexMeta

    try:
        old = IndexMeta.load(path)
    except (OSError, ValueError, TypeError, KeyError):
        return "nodes", [], 0, 0
    # the prior index's trash has aged a full maintenance cycle — sweep it
    # (with crash orphans) now; its LIVE dirs become the new trash below
    sweep_trash(path, old)
    trash = {old.base_rel}
    trash.update(rel for rel in (old.shard_base or {}).values() if rel)
    trash.update(old.delta_gens)
    # prior sidecars: the old meta's centroids generation (IVF) and any
    # legacy fixed-name sidecar DIRS (pre-atomic-file layouts). The new
    # build writes its own generation/file, so these are pure leftovers.
    cr = getattr(old, "centroids_rel", None)
    if cr and dir_exists(os.path.join(path, cr)):
        trash.add(cr)
    for legacy in ("centroids", "routing", "label_routing"):
        if legacy != cr and dir_exists(os.path.join(path, legacy)):
            trash.add(legacy)
    dest = f"nodes_gens/{uuid.uuid4().hex[:12]}"
    return dest, sorted(trash), int(old.epoch) + 1, int(old.delta_counter)


class ConcurrentWriterError(RuntimeError):
    """Another writer holds the index's writer lock."""


@contextmanager
def writer_lock(index_path: str, wait: float = 0.0, poll: float = 0.1):
    """Exclusive per-index writer lock.

    ``wait=0`` (default) fails fast with ConcurrentWriterError — the right
    behavior for schedulers that own retry policy. ``wait=N`` blocks up to
    N seconds polling for the lock, matching the reference's advisory-lock
    semantics (ports.rs:160 — a racing INSERT queues on the lock and then
    proceeds, it doesn't error), then raises if still held.
    """
    lock_path = os.path.join(index_path, "_writer.lock")
    os.makedirs(index_path, exist_ok=True)  # build() locks before first write
    deadline = time.monotonic() + max(0.0, float(wait))
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if time.monotonic() < deadline:
                time.sleep(poll)
                continue
            try:
                with open(lock_path) as f:
                    holder = f.read().strip()
            except OSError:
                holder = "unknown"
            raise ConcurrentWriterError(
                f"index at {index_path} is locked by another writer ({holder}); "
                f"retry after it finishes, or remove {lock_path} if it crashed"
            ) from None
    try:
        os.write(fd, f"pid={os.getpid()}".encode())
        os.close(fd)
        yield
    finally:
        try:
            os.remove(lock_path)
        except OSError:
            pass
