"""Distributed CoNLL corpus reader (SURVEY §2.1 S1).

The reference loads its char-per-line training files in one process
(``REF?:`` data loader).  ``ray.data.read_text`` is line-oriented and
would lose blank-line sentence grouping, so each file is one block via
``read_binary_files`` and a ``flat_map``-style ``map_batches`` splits
on blank lines — one output row per sentence ``{chars, tags}``.
"""

from __future__ import annotations

import pyarrow as pa


def _parse_files(batch: pa.Table) -> pa.Table:
    chars_col, tags_col = [], []
    for blob in batch["bytes"].to_pylist():
        text = blob.decode("utf-8")
        for block in text.split("\n\n"):
            block = block.strip("\n")
            if not block:
                continue
            chars, tags = [], []
            for line in block.splitlines():
                if not line.strip():
                    continue
                ch, tag = line.rsplit(" ", 1)
                chars.append(ch)
                tags.append(tag)
            chars_col.append(chars)
            tags_col.append(tags)
    return pa.table({
        "chars": pa.array(chars_col, type=pa.list_(pa.string())),
        "tags": pa.array(tags_col, type=pa.list_(pa.string())),
    })


def read_conll(paths: str | list[str]):
    """CoNLL file(s)/dir → Dataset of ``{chars:list, tags:list}`` rows."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)
    return ds.map_batches(_parse_files, batch_format="pyarrow")
