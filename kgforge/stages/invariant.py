"""M10 / invariant I1: per-row span-sequence equality ``(kind, text,
media_ref, order)`` end-to-end (BASELINE.json:15).

The pipeline never mutates ``spans`` (mention detection *annotates* via
sibling tables), so the check recomputes a per-doc order-sensitive hash
on the input T0 and on the output/passthrough T0 and compares — a
join-free anti-check: union both sides tagged, ONE hash partition by
doc_id (P Ray callbacks, never one per doc), every doc run must hold
exactly one distinct hash and both sides; the run checks are segment
reductions over the sorted partition, no per-doc Python beyond the
inherently-sequential blake2b fold itself (which runs in-process, not
as a Ray task per doc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgforge.common.hashing import span_sequence_hash

_INVARIANT_PARTITIONS = 64


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


def _doc_runs(t: pa.Table, key: str = "doc_id") -> np.ndarray:
    """Run starts of the (sorted) key column."""
    codes = t[key].combine_chunks().dictionary_encode().indices \
        .to_numpy(zero_copy_only=False)
    if len(codes) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(
        [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1]).astype(np.int64)


def _count_violations(both) -> int:
    from kgforge.functions.joins import _part_codes

    def add_p(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b["doc_id"],
                                        _INVARIANT_PARTITIONS)))

    def check_partition(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("doc_id", "ascending"),
                                            ("span_hash", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        starts = _doc_runs(t)
        ends = np.concatenate([starts[1:], [n]]) \
            if len(starts) else np.zeros(0, dtype=np.int64)
        h = t["span_hash"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        # one distinct hash per run ⇔ first == last in hash-sorted order
        hash_ok = h[starts] == h[ends - 1] if len(starts) else \
            np.zeros(0, dtype=bool)
        is_in = pc.equal(t["side"], "in") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_in = np.add.reduceat(is_in, starts) \
            if len(starts) else np.zeros(0, dtype=np.int64)
        n_tot = ends - starts
        ok = hash_ok & (n_in > 0) & (n_in < n_tot)
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(starts)),
            "ok": pa.array(ok),
        })

    per_doc = both.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(
            lambda t: check_partition(t.drop_columns(["__p"])),
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
    rebuilt sequence hash.

    One hash partition by doc (P Ray callbacks); per partition the
    span texts are re-joined with one ``pc.binary_join`` over run
    offsets and only the final blake2b fold per doc (inherently
    sequential) runs as an in-process loop."""
    from kgforge.functions.joins import _part_codes

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

    def add_p(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b["doc_id"],
                                        _INVARIANT_PARTITIONS)))

    def hash_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"])
        idx = pc.sort_indices(t, sort_keys=[("doc_id", "ascending"),
                                            ("span_idx", "ascending"),
                                            ("sent_idx", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        dcodes = t["doc_id"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        span = t["span_idx"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        dstarts = np.concatenate(
            [[0], np.flatnonzero(dcodes[1:] != dcodes[:-1]) + 1]) \
            .astype(np.int64) if n else np.zeros(0, dtype=np.int64)
        keep = span >= 0                     # -1 rows are doc markers
        kidx = np.flatnonzero(keep)
        kd = dcodes[kidx]
        ksp = span[kidx]
        if kidx.size:
            brk = np.ones(kidx.size, dtype=bool)
            brk[1:] = (kd[1:] != kd[:-1]) | (ksp[1:] != ksp[:-1])
            sstarts = np.flatnonzero(brk)
        else:
            sstarts = np.zeros(0, dtype=np.int64)
        slens = np.diff(np.concatenate([sstarts, [kidx.size]])) \
            if len(sstarts) else np.zeros(0, dtype=np.int64)
        texts = t["text"].take(pa.array(kidx)).combine_chunks()
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(slens)])
                     .astype(np.int32)), texts)
        joined = pc.binary_join(la, "").to_pylist()
        kinds = t["kind"].take(pa.array(kidx[sstarts])).to_pylist() \
            if len(sstarts) else []
        media = t["media_ref"].take(pa.array(kidx[sstarts])).to_pylist() \
            if len(sstarts) else []
        span_doc = kd[sstarts] if len(sstarts) else \
            np.zeros(0, dtype=np.int64)
        out_rows, hashes = [], []
        jp = 0
        for di in range(len(dstarts)):
            dc = dcodes[dstarts[di]]
            j0 = jp
            while jp < len(span_doc) and span_doc[jp] == dc:
                jp += 1
            hashes.append(span_sequence_hash(
                kinds[j0:jp], joined[j0:jp], media[j0:jp]))
            out_rows.append(int(dstarts[di]))
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(out_rows, pa.int64())),
            "span_hash": pa.array(hashes, pa.uint64()),
            "side": pa.array(["out"] * len(out_rows), pa.string()),
        })

    return rows.map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(hash_partition, batch_format="pyarrow")


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
    reordered or mutated a sentence shows up here.  One hash partition
    by doc; per partition the rebuild is one ``pc.binary_join`` over
    (doc, span) run offsets and the compare one ``pc.equal`` — no
    per-span Python or Ray callbacks.
    """
    from kgforge.functions.joins import _part_codes
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

    def add_p(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__p", pa.array(_part_codes(b["doc_id"],
                                        _INVARIANT_PARTITIONS)))

    def check_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__p"])
        idx = pc.sort_indices(t, sort_keys=[("doc_id", "ascending"),
                                            ("span_idx", "ascending"),
                                            ("sent_idx", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        dcodes = t["doc_id"].combine_chunks().dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False)
        span = t["span_idx"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        if n == 0:
            return pa.table({"doc_id": t["doc_id"],
                             "span_idx": t["span_idx"],
                             "ok": pa.array([], pa.bool_())})
        brk = np.ones(n, dtype=bool)
        brk[1:] = (dcodes[1:] != dcodes[:-1]) | (span[1:] != span[:-1])
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        sent = t["sent_idx"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        is_src = sent == -1
        n_src = np.add.reduceat(is_src.astype(np.int64), starts)
        kidx = np.flatnonzero(~is_src)
        klens = (ends - starts) - n_src
        texts = t["text"].take(pa.array(kidx)).combine_chunks()
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(klens)])
                     .astype(np.int32)), texts)
        rebuilt = pc.binary_join(la, "")
        src_text = t["text"].take(pa.array(starts))
        eq = pc.fill_null(pc.equal(rebuilt, src_text), False) \
            .to_numpy(zero_copy_only=False)
        # the src row sorts first in its run (sent_idx = -1)
        ok = (n_src == 1) & is_src[starts] & eq
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(starts)),
            "span_idx": t["span_idx"].take(pa.array(starts)),
            "ok": pa.array(ok),
        })

    per_span = src.union(out) \
        .map_batches(add_p, batch_format="pyarrow") \
        .groupby("__p").map_groups(check_partition, batch_format="pyarrow")
    bad = per_span.map_batches(
        lambda t: t.filter(pc.equal(t["ok"], False)), batch_format="pyarrow")
    return bad.count()
