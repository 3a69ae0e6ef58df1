"""M4: tag sequences → mentions (SURVEY §2.2).

Two batch fns:

- :func:`attach_mentions` — sentence rows + ``tags`` → adds a
  ``mentions`` list<struct> column (sentence-level rows are the unit
  the triple extractor needs co-grouped, so mentions stay attached —
  no later shuffle required to regroup them).
- :func:`explode_mentions` — sentence rows → flat T1 mention rows.
"""

from __future__ import annotations

import pyarrow as pa

from kgforge.oracle.labels import extract_entities

MENTION_STRUCT = pa.struct([
    ("etype", pa.string()),
    ("ment_start", pa.int32()),
    ("ment_end", pa.int32()),
    ("surface", pa.string()),
])

T1_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("sent_idx", pa.int32()),
    ("offset", pa.int32()),
    ("ment_start", pa.int32()),
    ("ment_end", pa.int32()),
    ("surface", pa.string()),
    ("etype", pa.string()),
    ("tagger", pa.string()),
    ("score", pa.float64()),
    ("pid", pa.int32()),
])


def sentence_stage_schema() -> pa.Schema:
    """Schema of the 'sentences' checkpoint (explode + tags + mentions)."""
    from kgforge.stages.explode import SENT_SCHEMA

    return SENT_SCHEMA.append(pa.field("tags", pa.list_(pa.string()))) \
                      .append(pa.field("mentions", pa.list_(MENTION_STRUCT)))


def attach_mentions(batch: pa.Table) -> pa.Table:
    tags_col = batch["tags"].to_pylist()
    texts = batch["sent_text"].to_pylist()
    mentions = []
    for tags, text in zip(tags_col, texts):
        ms = [{"etype": e, "ment_start": s, "ment_end": t,
               "surface": text[s:t]}
              for e, s, t in extract_entities(tags)]
        mentions.append(ms)
    return batch.append_column(
        "mentions", pa.array(mentions, type=pa.list_(MENTION_STRUCT)))


def explode_mentions(batch: pa.Table, tagger: str = "hmm") -> pa.Table:
    """Sentence rows (with ``mentions``) → T1 rows (SURVEY §1.2 T1)."""
    out = {k: [] for k in ("doc_id", "span_idx", "sent_idx", "offset",
                           "ment_start", "ment_end", "surface", "etype",
                           "tagger", "score", "pid")}
    rows = batch.select(["doc_id", "span_idx", "sent_idx", "span_offset",
                         "sent_offset", "mentions", "pid"]).to_pylist()
    for r in rows:
        for m in r["mentions"]:
            out["doc_id"].append(r["doc_id"])
            out["span_idx"].append(r["span_idx"])
            out["sent_idx"].append(r["sent_idx"])
            out["offset"].append(r["span_offset"] + r["sent_offset"])
            out["ment_start"].append(m["ment_start"])
            out["ment_end"].append(m["ment_end"])
            out["surface"].append(m["surface"])
            out["etype"].append(m["etype"])
            out["tagger"].append(tagger)
            out["score"].append(1.0)
            out["pid"].append(r["pid"])
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.string()),
        "span_idx": pa.array(out["span_idx"], pa.int32()),
        "sent_idx": pa.array(out["sent_idx"], pa.int32()),
        "offset": pa.array(out["offset"], pa.int32()),
        "ment_start": pa.array(out["ment_start"], pa.int32()),
        "ment_end": pa.array(out["ment_end"], pa.int32()),
        "surface": pa.array(out["surface"], pa.string()),
        "etype": pa.array(out["etype"], pa.string()),
        "tagger": pa.array(out["tagger"], pa.string()),
        "score": pa.array(out["score"], pa.float64()),
        "pid": pa.array(out["pid"], pa.int32()),
    })
