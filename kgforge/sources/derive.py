"""Deterministic T0 derivation from a driver ``documents`` table
(FIXTURES.md §C): each document row becomes one interleaved doc with a
text span followed by one media span whose kind cycles
image/audio/video by ``doc_id % 3``.

The mapping is pure arithmetic/string concatenation so the DuckDB
oracles in ``__ray_entry__.py`` reproduce it exactly (printf + CASE),
letting the driver verify the interleaved reader + explode +
media-passthrough lane end-to-end in ANSI SQL.
"""

from __future__ import annotations

import pyarrow as pa

from kgforge.sources.interleaved import T0_SCHEMA

_KINDS = ("image", "audio", "video")


def derive_t0_batch(batch: pa.Table) -> pa.Table:
    """documents rows → T0 rows (doc_id:string, spans:list<struct>)."""
    rows = []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        kind = _KINDS[doc_id % 3]
        rows.append({
            "doc_id": f"doc-{doc_id:08d}",
            "spans": [
                {"kind": "text", "text": text or "", "media_ref": "",
                 "offset": 0},
                {"kind": kind, "text": "",
                 "media_ref": f"media://{kind}/{doc_id % 1000000:06d}",
                 "offset": len(text or "")},
            ],
        })
    return pa.Table.from_pylist(rows, schema=T0_SCHEMA)


def derive_t0_ds(sf_dir: str):
    """Lazy Dataset of derived T0 docs from ``{sf_dir}/documents.parquet``
    (column-pruned read: only doc_id + text leave storage)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return docs.map_batches(derive_t0_batch, batch_format="pyarrow")


def explode_t0_batch(batch: pa.Table) -> pa.Table:
    """Generic span explode (M6 without the tagger lane's sentence
    split): one row per span, zero-copy ``list_flatten``."""
    import numpy as np
    import pyarrow.compute as pc

    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    doc_ids = pc.take(batch["doc_id"], pa.array(parents))
    # span_idx = position within each doc's list
    span_idx = np.zeros(len(parents), dtype=np.int32)
    if len(parents):
        starts = np.flatnonzero(np.diff(parents, prepend=parents[0] - 1))
        span_idx = np.arange(len(parents), dtype=np.int32) - \
            np.repeat(starts, np.diff(np.append(starts, len(parents)))).astype(np.int32)
    return pa.table({
        "doc_id": doc_ids,
        "span_idx": pa.array(span_idx, pa.int32()),
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    })


def explode_t0_ds(t0_ds):
    return t0_ds.map_batches(explode_t0_batch, batch_format="pyarrow")
