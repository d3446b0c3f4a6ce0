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

__all__ = ["ConcurrentWriterError", "writer_lock"]


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
