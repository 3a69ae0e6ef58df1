"""M6 + M7 + L3: explode T0 spans → sentence rows (SURVEY §2.2).

One stateless ``map_batches`` (``batch_format="pyarrow"``) that:

- flattens the ``spans`` list column (zero-copy ``pc.list_flatten`` /
  ``list_parent_indices``),
- keeps only non-empty ``kind == "text"`` spans for the tagger lane —
  media spans are *never* mutated; the original T0 rows flow to the
  invariant lane untouched (I1, BASELINE.json:15),
- attaches the nearest *preceding* media span's ``media_ref`` as a
  context anchor (L3 — computed intra-row, no shuffle),
- splits span text into sentences (shared
  :func:`kgforge.oracle.segment.split_sentences` — boundary parity with
  the oracle is conformance-critical),
- assigns the stable checkpoint partition id ``pid = blake2b64(doc_id)
  % num_partitions`` (SURVEY §4, lineage T5).

Output row: ``doc_id, span_idx, span_offset, sent_idx, sent_offset,
sent_text, anchor_media_ref, pid``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgforge.common.hashing import hash_u64_np

SENT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("span_offset", pa.int32()),
    ("sent_idx", pa.int32()),
    ("sent_offset", pa.int32()),
    ("sent_text", pa.string()),
    ("anchor_media_ref", pa.string()),
    ("pid", pa.int32()),
])


_TERM_CODES = np.array([ord(c) for c in "。！？；"], dtype=np.uint32)


def _segment_local_arange(seg_ids: np.ndarray) -> np.ndarray:
    """0,1,2,… restarting whenever ``seg_ids`` changes (sorted runs)."""
    n = len(seg_ids)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    starts = np.flatnonzero(np.diff(seg_ids, prepend=seg_ids[0] - 1))
    reps = np.diff(np.append(starts, n))
    return (np.arange(n) - np.repeat(starts, reps)).astype(np.int32)


def make_explode_spans(num_partitions: int = 32):
    """Returns the batch fn (closure carries the partition count).

    Fully vectorized bookkeeping: span_idx is a segment-local arange,
    the media context anchor (L3) is a prefix-cummax over media span
    positions reset at doc boundaries, and sentence boundaries come
    from ONE utf-32 terminator scan over the batch's concatenated text
    (semantics byte-identical to
    :func:`kgforge.oracle.segment.split_sentences` — parity-tested).
    The only per-sentence Python is the final string slice.
    """

    def explode_spans(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)                       # struct array
        parents = pc.list_parent_indices(spans) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(parents)
        kinds = flat.field("kind")
        media = flat.field("media_ref")
        doc_ids = batch["doc_id"].to_pylist()
        pids = (hash_u64_np(doc_ids) %
                np.uint64(num_partitions)).astype(np.int32)

        span_idx = _segment_local_arange(parents)
        # L3 anchor: last nonempty media ref strictly BEFORE each span
        # within the same doc.  Global prefix cummax of media positions
        # + doc-start floor (media from earlier docs sits below the
        # doc's first span index, so the floor test resets per doc).
        is_anchor = pc.and_(pc.not_equal(kinds, "text"),
                            pc.not_equal(media, "")) \
            .to_numpy(zero_copy_only=False)
        apos = np.where(is_anchor, np.arange(n), -1)
        cmax = np.maximum.accumulate(apos) if n else apos
        prev_cmax = np.empty(n, dtype=np.int64)
        if n:
            prev_cmax[0] = -1
            prev_cmax[1:] = cmax[:-1]
        doc_start = np.arange(n) - span_idx                 # span 0 position
        anchor_idx = np.where(prev_cmax >= doc_start, prev_cmax, -1)

        is_text = pc.equal(kinds, "text").to_numpy(zero_copy_only=False)
        texts = flat.field("text").to_pylist()
        t_sel = np.flatnonzero(is_text &
                               np.array([bool(t) for t in texts]))
        if len(t_sel) == 0:
            return SENT_SCHEMA.empty_table()

        sel_texts = [texts[i] for i in t_sel]
        lens = np.array([len(t) for t in sel_texts], dtype=np.int64)
        joined = "".join(sel_texts)
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        span_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
        span_end = span_start + lens
        # sentence ENDS: every terminator position+1, plus the span end
        # when the tail after the last terminator is nonempty
        term_end = np.flatnonzero(np.isin(codes, _TERM_CODES)) + 1
        span_of_term = np.searchsorted(span_end, term_end, side="left")
        # a span's trailing boundary: drop span_end if it equals a
        # terminator end (then the tail is empty)
        has_tail = np.ones(len(t_sel), dtype=bool)
        at_end = term_end == span_end[span_of_term]
        has_tail[span_of_term[at_end]] = False
        tail_ends = span_end[has_tail]
        ends = np.concatenate([term_end, tail_ends])
        owners = np.concatenate([span_of_term,
                                 np.flatnonzero(has_tail)])
        order = np.lexsort((ends, owners))
        ends, owners = ends[order], owners[order]
        # sentence STARTS: span start, or previous sentence's end
        starts = np.empty(len(ends), dtype=np.int64)
        if len(ends):
            starts[0] = span_start[owners[0]]
            same = owners[1:] == owners[:-1]
            starts[1:] = np.where(same, ends[:-1], span_start[owners[1:]])
        sent_idx = _segment_local_arange(owners)
        sent_offset = (starts - span_start[owners]).astype(np.int32)

        src = t_sel[owners]                     # flat-span index per sent
        p = parents[src]
        offsets_np = flat.field("offset") \
            .to_numpy(zero_copy_only=False).astype(np.int32)
        media_py = media.to_pylist()
        anchors = ["" if anchor_idx[i] < 0 else media_py[anchor_idx[i]]
                   for i in src]
        return pa.table({
            "doc_id": pa.array([doc_ids[i] for i in p], pa.string()),
            "span_idx": pa.array(span_idx[src], pa.int32()),
            "span_offset": pa.array(offsets_np[src], pa.int32()),
            "sent_idx": pa.array(sent_idx, pa.int32()),
            "sent_offset": pa.array(sent_offset, pa.int32()),
            "sent_text": pa.array([joined[s:e] for s, e in
                                   zip(starts, ends)], pa.string()),
            "anchor_media_ref": pa.array(anchors, pa.string()),
            "pid": pa.array(pids[p], pa.int32()),
        }, schema=SENT_SCHEMA)

    return explode_spans
