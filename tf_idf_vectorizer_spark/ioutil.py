"""Filesystem helpers for the table-swap protocol.

Table replacements write to ``<path>_new``, rename the live dir aside to
``<path>_old``, rename ``_new`` in, then delete ``_old`` — at no point is
the live path absent together with its predecessor, so a crash at any
step is recoverable here at open time.

Concurrency contract (single writer, many readers): recovery only ever
RESTORES state a crashed writer left behind — it restores ``_old`` when
the live dir is missing and reclaims a leftover ``_old`` next to a live
dir.  It never touches ``_new``: a reader cannot distinguish a stale
``_new`` from one a LIVE writer is mid-way through writing, and deleting
the latter would fail the writer's commit.  Stale ``_new`` dirs are
harmless — the next swap overwrites them (mode=overwrite).
"""

from __future__ import annotations

import json
import os
import shutil


def recover_dir(path: str) -> bool:
    """Finish an interrupted swap of ``path``: restore the renamed-aside
    predecessor if the live dir is missing.  Idempotent; safe to run
    concurrently with a writer (see module docstring).  Returns True when
    a restore happened (callers should then refresh any path-keyed Spark
    caches/listings)."""
    old = path + "_old"
    restored = False
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        restored = True
    if os.path.exists(path) and os.path.exists(old):
        # leftover from a crash after the rename-in; a live writer may be
        # deleting it at the same moment — both succeeding-or-missing is
        # fine, so tolerate the race instead of failing the open
        shutil.rmtree(old, ignore_errors=True)
    return restored


def table_path(index_dir: str, meta: dict, name: str) -> str:
    """Resolve a table's live directory through the meta ``tables`` map
    (the commit pointer of the versioned-table protocol); indexes written
    before the protocol — or fresh builds — use the unversioned name."""
    return f"{index_dir}/{meta.get('tables', {}).get(name, name)}"


def write_json_atomic(obj: dict, path: str) -> None:
    """Write JSON via temp file + ``os.replace`` — the commit point of a
    batch is the meta write, so it must be all-or-nothing (a torn
    meta.json would orphan every table of the new generation)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=2)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
