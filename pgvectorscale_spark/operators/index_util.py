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
    "list_subdirs",
    "prepare_rebuild",
    "sweep_trash",
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
    import shutil

    import glob

    for rel in meta.trash_dirs:
        p = os.path.join(path, rel)
        shutil.rmtree(p, ignore_errors=True)
        delete_dir(p)  # remote-capable twin
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
