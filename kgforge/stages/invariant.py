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


def _count_violations(both) -> int:
    per_doc = both.groupby("doc_id").map_groups(_check_group,
                                               batch_format="pyarrow")
    bad = per_doc.map_batches(
        lambda t: t.filter(pc.equal(t["ok"], False)), batch_format="pyarrow")
    return bad.count()


def verify_invariant(input_t0_ds, output_t0_ds) -> int:
    """Returns the number of VIOLATING docs (0 == invariant holds).
    Only meaningful when ``output_t0_ds`` is a genuine output-side
    passthrough — comparing the input to a re-read of itself proves
    nothing; for pipeline evidence use :func:`verify_invariant_output`."""
    both = span_hashes(input_t0_ds, "in").union(span_hashes(output_t0_ds, "out"))
    return _count_violations(both)


def passthrough_spans(batch: pa.Table) -> pa.Table:
    """The spans the tagger lane does NOT carry — media and empty-text
    spans, flattened exactly as the explode stage sees them — plus one
    ``span_idx = -1`` presence marker per doc (so a doc whose spans all
    vanished still reaches the compare instead of silently dropping
    out).  Feeds :func:`verify_invariant_output`."""
    import numpy as np

    from kgforge.stages.explode import _segment_local_arange

    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    media = flat.field("media_ref").to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    span_idx = _segment_local_arange(parents)
    keep = [i for i in range(len(parents))
            if not (kinds[i] == "text" and texts[i])]
    nd = len(doc_ids)
    return pa.table({
        "doc_id": pa.array([doc_ids[parents[i]] for i in keep] + doc_ids,
                           pa.string()),
        "span_idx": pa.array([int(span_idx[i]) for i in keep] + [-1] * nd,
                             pa.int32()),
        "sent_idx": pa.array([0] * (len(keep) + nd), pa.int32()),
        "kind": pa.array([kinds[i] for i in keep] + [""] * nd, pa.string()),
        "text": pa.array([texts[i] for i in keep] + [""] * nd, pa.string()),
        "media_ref": pa.array([media[i] for i in keep] + [""] * nd,
                              pa.string()),
    })


def output_side_hashes(t0_ds, sentences_ds):
    """Rebuild each doc's full span sequence FROM PIPELINE OUTPUT and
    hash it: text spans are concatenated back from the ``sentences``
    stage rows (what actually flowed through explode → tag →
    checkpoint), media/empty spans from the passthrough branch (which
    the engine never mutates by construction).  A sentence that was
    dropped, reordered or edited anywhere mid-pipeline changes the
    rebuilt sequence hash."""
    def sent_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch["doc_id"],
            "span_idx": batch["span_idx"],
            "sent_idx": batch["sent_idx"],
            "kind": pa.array(["text"] * n, pa.string()),
            "text": batch["sent_text"],
            "media_ref": pa.array([""] * n, pa.string()),
        })

    rows = t0_ds.map_batches(passthrough_spans, batch_format="pyarrow") \
        .union(sentences_ds.map_batches(sent_rows, batch_format="pyarrow"))

    def hash_doc(group: pa.Table) -> pa.Table:
        rs = [r for r in group.to_pylist() if r["span_idx"] >= 0]
        rs.sort(key=lambda r: (r["span_idx"], r["sent_idx"]))
        kinds, texts, refs = [], [], []
        cur = None
        for r in rs:
            if cur != r["span_idx"]:
                kinds.append(r["kind"])
                texts.append(r["text"])
                refs.append(r["media_ref"])
                cur = r["span_idx"]
            else:                       # later sentence of the same span
                texts[-1] += r["text"]
        h = span_sequence_hash(kinds, texts, refs)
        return pa.table({
            "doc_id": group["doc_id"][:1],
            "span_hash": pa.array([h], pa.uint64()),
            "side": pa.array(["out"], pa.string()),
        })

    return rows.groupby("doc_id").map_groups(hash_doc,
                                             batch_format="pyarrow")


def verify_invariant_output(t0_ds, sentences_ds) -> int:
    """I1 with a REAL output side: input span-sequence hashes vs the
    sequence rebuilt from the pipeline's own ``sentences`` output (+
    media passthrough).  Returns the number of violating docs.

    Caveat recorded for honesty: the media branch is recomputed from
    the input (the engine carries no media rows downstream), so its
    evidence is "untouched by construction"; the end-to-end-falsifiable
    part is every text span, which dominates the invariant."""
    both = span_hashes(t0_ds, "in").union(
        output_side_hashes(t0_ds, sentences_ds))
    return _count_violations(both)


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
