"""Filesystem helpers for the table-swap protocol.

Table replacements write to ``<path>_new``, rename the live dir aside to
``<path>_old``, rename ``_new`` in, then delete ``_old`` — at no point is
the live path absent together with its predecessor, so a crash at any
step is recoverable here at open time.
"""

from __future__ import annotations

import os
import shutil


def recover_dir(path: str) -> bool:
    """Finish an interrupted swap of ``path``: restore the renamed-aside
    predecessor if the live dir is missing, and drop stale temp dirs.
    Idempotent.  Returns True when a restore happened (callers should
    then refresh any path-keyed Spark caches/listings)."""
    old, tmp = path + "_old", path + "_new"
    restored = False
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
        restored = True
    for leftover in (old, tmp):
        if os.path.exists(path) and os.path.exists(leftover):
            shutil.rmtree(leftover)
    return restored
