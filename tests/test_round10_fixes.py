"""Round-10 regression tests for the ADVICE r9 fixes.

Covers the lease-sweep path-aliasing bug (index_util._live_lease_min_epoch:
when ``_pa_fs`` raised for an expired-by-filename lease, the delete used
the PREVIOUS loop iteration's fsys/p and could remove a different, live
lease file) plus the small malformed-input hardenings tested next to their
format suites (AIFF exponent bound, BMP data_off) and the MS ADPCM
truncation convention (test_g711_adpcm.py).
"""
from __future__ import annotations

import json
import os
import time

import pytest

from pgvectorscale_spark.operators import index_util as iu


@pytest.fixture()
def leases(tmp_path):
    d = tmp_path / "index" / iu.LEASES_DIR
    d.mkdir(parents=True)
    return d


def _write_lease(d, name: str, epoch: int, expires: float) -> str:
    p = d / name
    p.write_bytes(json.dumps({"epoch": epoch, "expires": expires}).encode())
    return str(p)


def test_unreadable_expired_lease_does_not_delete_previous_live_lease(
    leases, monkeypatch
):
    """If _pa_fs itself raises for an expired-by-filename lease, the reap
    must not delete the PREVIOUS iteration's (live) lease file."""
    now = time.time()
    live = _write_lease(leases, f"exp{int(now) + 600}-aaaa.lease", 3, now + 600)
    # expired by filename; make _pa_fs raise for exactly this path so the
    # pre-fix code would fall through with stale fsys/p bindings
    dead = _write_lease(leases, f"exp{int(now) - 10}-zzzz.lease", 1, now - 10)

    real_pa_fs = iu._pa_fs

    def flaky_pa_fs(path):
        if path == dead:
            raise OSError("transient FS error")
        return real_pa_fs(path)

    monkeypatch.setattr(iu, "_pa_fs", flaky_pa_fs)
    # 'exp...-aaaa' sorts before 'exp...-zzzz' in the directory listing,
    # so the live lease's fsys/p are the loop-carried bindings when the
    # dead lease's branch runs — exactly the aliasing ADVICE flagged.
    # Force the ordering regardless of list_files' internals:
    monkeypatch.setattr(
        iu,
        "list_files",
        lambda path, prefix, strict=False: [
            os.path.basename(live),
            os.path.basename(dead),
        ],
    )
    got = iu._live_lease_min_epoch(str(leases.parent))
    assert os.path.exists(live), "live lease must survive the reap"
    assert got == 3  # the live lease's epoch still pins


def test_expired_unreadable_lease_is_reaped_via_its_own_path(leases, monkeypatch):
    """The expired-by-filename reap deletes THE lease file itself once the
    body read fails but the filesystem works for the delete."""
    now = time.time()
    dead = _write_lease(leases, f"exp{int(now) - 10}-zzzz.lease", 1, now - 10)
    # corrupt the body: read raises inside json; _pa_fs itself works
    with open(dead, "wb") as f:
        f.write(b"\xff not json")
    got = iu._live_lease_min_epoch(str(leases.parent))
    assert got is None
    assert not os.path.exists(dead)


def test_bloom_num_bits_ceiling():
    """decontaminate_bloom refuses num_bits past the single-row/broadcast
    ceiling (validated before any plan is built, so no frames needed)."""
    from pgvectorscale_spark.operators.curation import decontaminate_bloom

    with pytest.raises(ValueError, match="ceiling"):
        decontaminate_bloom(None, None, num_bits=1 << 34)
    with pytest.raises(ValueError, match="multiple of 64"):
        decontaminate_bloom(None, None, num_bits=100)
