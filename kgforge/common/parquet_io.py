"""Crash-safe Parquet directory hygiene.

A Ray Data ``write_parquet`` task killed mid-file and then retried
leaves a torn orphan (PAR1 header, truncated footer) beside the
complete retry file — write filenames carry the attempt's task index,
so the orphan is never overwritten, and a later ``read_parquet(dir)``
glob fails on it with "Parquet magic bytes not found in footer".
Every block an acknowledged ``write_parquet`` call produced was
durably written by a SUCCESSFUL attempt, so a file failing the footer
check is provably a dead attempt's residue and safe to delete.
"""

from __future__ import annotations

import os


def valid_parquet_footer(path: str) -> bool:
    """True iff the file carries both PAR1 magics — an 8-byte check,
    not a full scan."""
    try:
        if os.path.getsize(path) < 12:
            return False
        with open(path, "rb") as f:
            if f.read(4) != b"PAR1":
                return False
            f.seek(-4, os.SEEK_END)
            return f.read(4) == b"PAR1"
    except OSError:
        return False


def prune_torn_fragments(root: str) -> list[str]:
    """Walk ``root``, delete every ``.parquet`` file with an invalid
    footer, and return the kept files (paths relative to ``root``,
    sorted).  Call this between an acknowledged ``write_parquet`` and
    any directory-glob read of the same tree."""
    kept: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, f)
            if valid_parquet_footer(full):
                kept.append(os.path.relpath(full, root))
            else:
                os.remove(full)
    return sorted(kept)
