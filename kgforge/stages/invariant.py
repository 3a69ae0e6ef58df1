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


def verify_sentence_reconstruction(t0_ds, sentences_ds) -> int:
    """Output-side I1 evidence: rebuild every TEXT span's full text from
    the pipeline's own 'sentences' stage output (concatenate sentences
    of each (doc_id, span_idx) in sent_idx order — the splitter is
    lossless by construction) and compare to the source span text.
    Returns the number of violating (doc_id, span_idx) spans.

    This checks what actually flowed THROUGH the pipeline, not just a
    re-read of the input: a tagger/checkpoint stage that dropped,
    reordered or mutated a sentence shows up here.
    """
    from kgforge.sources.derive import explode_t0_batch

    def src_spans(batch: pa.Table) -> pa.Table:
        t = explode_t0_batch(batch)
        t = t.filter(pc.and_(pc.equal(t["kind"], "text"),
                             pc.greater(pc.utf8_length(t["text"]), 0)))
        return pa.table({"doc_id": t["doc_id"],
                         "span_idx": t["span_idx"],
                         "sent_idx": pa.array([-1] * t.num_rows, pa.int32()),
                         "text": t["text"]})

    def sent_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "span_idx": batch["span_idx"],
                         "sent_idx": batch["sent_idx"],
                         "text": batch["sent_text"]})

    src = t0_ds.map_batches(src_spans, batch_format="pyarrow")
    out = sentences_ds.map_batches(sent_rows, batch_format="pyarrow")

    def check(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["sent_idx"])
        srcs = [r for r in rows if r["sent_idx"] == -1]
        rebuilt = "".join(r["text"] for r in rows if r["sent_idx"] >= 0)
        ok = len(srcs) == 1 and rebuilt == srcs[0]["text"]
        return pa.table({"doc_id": group["doc_id"][:1],
                         "span_idx": group["span_idx"][:1],
                         "ok": pa.array([ok], pa.bool_())})

    per_span = src.union(out).groupby(["doc_id", "span_idx"]) \
        .map_groups(check, batch_format="pyarrow")
    bad = per_span.map_batches(
        lambda t: t.filter(pc.equal(t["ok"], False)), batch_format="pyarrow")
    return bad.count()
