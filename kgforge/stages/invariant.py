"""M10 / invariant I1: per-row span-sequence equality ``(kind, text,
media_ref, order)`` end-to-end (BASELINE.json:15).

The pipeline never mutates ``spans`` (mention detection *annotates* via
sibling tables), so the check recomputes a per-doc order-sensitive hash
on the input T0 and on the output/passthrough T0 and compares — a
join-free anti-check: union both sides tagged, ``groupby(doc_id)``,
every group must hold exactly one distinct hash and both sides.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from kgforge.common.hashing import span_sequence_hash


def _hash_batch(batch: pa.Table, side: str) -> pa.Table:
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    hashes = []
    for row in spans.to_pylist():
        hashes.append(span_sequence_hash(
            [s["kind"] for s in row], [s["text"] for s in row],
            [s["media_ref"] for s in row]))
    return pa.table({
        "doc_id": batch["doc_id"],
        "span_hash": pa.array(hashes, pa.uint64()),
        "side": pa.array([side] * batch.num_rows, pa.string()),
    })


def span_hashes(t0_ds, side: str):
    """T0 ds → (doc_id, span_hash, side) ds."""
    return t0_ds.map_batches(lambda b, s=side: _hash_batch(b, s),
                             batch_format="pyarrow")


def _check_group(group: pa.Table) -> pa.Table:
    ok = (len(pc.unique(group["span_hash"])) == 1
          and len(pc.unique(group["side"])) == 2)
    return pa.table({
        "doc_id": group["doc_id"][:1],
        "ok": pa.array([ok], pa.bool_()),
    })


def verify_invariant(input_t0_ds, output_t0_ds) -> int:
    """Returns the number of VIOLATING docs (0 == invariant holds)."""
    both = span_hashes(input_t0_ds, "in").union(span_hashes(output_t0_ds, "out"))
    per_doc = both.groupby("doc_id").map_groups(_check_group,
                                               batch_format="pyarrow")
    bad = per_doc.map_batches(
        lambda t: t.filter(pc.equal(t["ok"], False)), batch_format="pyarrow")
    return bad.count()
