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
from kgforge.oracle.segment import split_sentences

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


def make_explode_spans(num_partitions: int = 32):
    """Returns the batch fn (closure carries the partition count)."""

    def explode_spans(batch: pa.Table) -> pa.Table:
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)                       # struct array
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        media = flat.field("media_ref").to_pylist()
        offsets = flat.field("offset").to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        pids = (hash_u64_np(doc_ids) % np.uint64(num_partitions)).astype(np.int32)

        out = {k: [] for k in ("doc_id", "span_idx", "span_offset", "sent_idx",
                               "sent_offset", "sent_text", "anchor_media_ref",
                               "pid")}
        # span_idx within each doc + running media anchor (intra-row state)
        prev_parent = -1
        span_idx = 0
        anchor = ""
        for i in range(len(kinds)):
            p = int(parents[i])
            if p != prev_parent:
                prev_parent, span_idx, anchor = p, 0, ""
            else:
                span_idx += 1
            if kinds[i] != "text":
                anchor = media[i] or anchor
                continue
            text = texts[i]
            if text:
                for sent_idx, (off, sent) in enumerate(split_sentences(text)):
                    out["doc_id"].append(doc_ids[p])
                    out["span_idx"].append(span_idx)
                    out["span_offset"].append(offsets[i])
                    out["sent_idx"].append(sent_idx)
                    out["sent_offset"].append(off)
                    out["sent_text"].append(sent)
                    out["anchor_media_ref"].append(anchor)
                    out["pid"].append(int(pids[p]))
        return pa.table(out, schema=SENT_SCHEMA)

    return explode_spans
