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
    """Vectorized M4 over the whole batch: dictionary-encode the
    flattened tag column once (≤ 13 distinct tag strings), then compute
    entity start/end masks with numpy over int arrays — semantics
    identical to :func:`kgforge.oracle.labels.extract_entities`
    (tolerant BIO/BIOES; property-tested equal)."""
    import numpy as np
    import pyarrow.compute as pc

    tags_col = batch["tags"]
    if isinstance(tags_col, pa.ChunkedArray):
        tags_col = tags_col.combine_chunks()
    n = batch.num_rows
    flat = pc.list_flatten(tags_col)
    lens = pc.list_value_length(tags_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    total = int(lens.sum())
    mentions: list[list[dict]] = [[] for _ in range(n)]
    if total:
        if pa.types.is_dictionary(flat.type):
            enc = flat.combine_chunks() if isinstance(
                flat, pa.ChunkedArray) else flat
        else:
            enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tag_strs = enc.dictionary.to_pylist()
        # per-distinct-tag type id (0 = O) and prefix class
        typ_lut = np.zeros(len(tag_strs), dtype=np.int64)
        starty_lut = np.zeros(len(tag_strs), dtype=bool)   # B / S
        close_lut = np.zeros(len(tag_strs), dtype=bool)    # E / S / O
        types: list[str] = [""]
        type_ids: dict[str, int] = {}
        for i, t in enumerate(tag_strs):
            if t == "O":
                close_lut[i] = True
                continue
            prefix, etype = t.split("-", 1)
            if etype not in type_ids:
                type_ids[etype] = len(types)
                types.append(etype)
            typ_lut[i] = type_ids[etype]
            starty_lut[i] = prefix in ("B", "S")
            close_lut[i] = prefix in ("E", "S")
        typ = typ_lut[idx]
        starty = starty_lut[idx]
        closes = close_lut[idx]
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sent_start = np.zeros(total, dtype=bool)
        sent_start[offsets[lens > 0]] = True
        prev_typ = np.empty(total, dtype=np.int64)
        prev_typ[0] = 0
        prev_typ[1:] = typ[:-1]
        prev_typ[sent_start] = 0
        prev_closed = np.empty(total, dtype=bool)
        prev_closed[0] = True
        prev_closed[1:] = closes[:-1]
        prev_closed[sent_start] = True
        # continuation: I/E of the same open type
        cont = (typ > 0) & ~starty & (typ == prev_typ) & ~prev_closed
        is_start = (typ > 0) & ~cont
        next_cont = np.zeros(total, dtype=bool)
        next_cont[:-1] = cont[1:]
        is_end = (typ > 0) & (closes | ~next_cont)
        # tolerant rule nuance: E/S closes; a following I of same type
        # re-opens (prev_closed=True ⇒ cont False ⇒ is_start True) ✓
        starts = np.flatnonzero(is_start)
        ends = np.flatnonzero(is_end)
        texts = batch["sent_text"].to_pylist()
        sent_of = np.searchsorted(offsets, starts, side="right") - 1
        for s_pos, e_pos, si in zip(starts, ends, sent_of):
            off = int(offsets[si])
            s_c, e_c = int(s_pos - off), int(e_pos - off) + 1
            mentions[int(si)].append({
                "etype": types[int(typ[s_pos])],
                "ment_start": s_c, "ment_end": e_c,
                "surface": texts[int(si)][s_c:e_c]})
    return batch.append_column(
        "mentions", pa.array(mentions, type=pa.list_(MENTION_STRUCT)))


def explode_mentions(batch: pa.Table, tagger: str = "hmm") -> pa.Table:
    """Sentence rows (with ``mentions``) → T1 rows (SURVEY §1.2 T1).

    Zero-copy explode: ``list_flatten`` the mention struct column +
    ``list_parent_indices`` take of the sentence-level columns."""
    import pyarrow.compute as pc

    ments = batch["mentions"]
    if isinstance(ments, pa.ChunkedArray):
        ments = ments.combine_chunks()
    flat = pc.list_flatten(ments)
    parents = pc.list_parent_indices(ments)
    n = len(flat)
    take = lambda col: pc.take(batch[col], parents)  # noqa: E731
    offset = pc.add(take("span_offset"), take("sent_offset"))
    return pa.table({
        "doc_id": take("doc_id"),
        "span_idx": pc.cast(take("span_idx"), pa.int32()),
        "sent_idx": pc.cast(take("sent_idx"), pa.int32()),
        "offset": pc.cast(offset, pa.int32()),
        "ment_start": pc.cast(flat.field("ment_start"), pa.int32()),
        "ment_end": pc.cast(flat.field("ment_end"), pa.int32()),
        "surface": flat.field("surface"),
        "etype": flat.field("etype"),
        "tagger": pa.array([tagger] * n, pa.string()),
        "score": pa.array([1.0] * n, pa.float64()),
        "pid": pc.cast(take("pid"), pa.int32()),
    })


MENTION_KEY = ["doc_id", "span_idx", "sent_idx", "ment_start", "ment_end"]


def _best_mention_per_span(batch: pa.Table) -> pa.Table:
    """Keep the best row per identical span: score desc, then tagger
    asc (deterministic across any tagger combination)."""
    if batch.num_rows == 0:
        return batch
    df = batch.to_pandas()
    df = df.sort_values(MENTION_KEY + ["score", "tagger"],
                        ascending=[True] * 5 + [False, True],
                        kind="mergesort")
    df = df.drop_duplicates(MENTION_KEY, keep="first")
    return pa.Table.from_pandas(df, schema=batch.schema,
                                preserve_index=False)


def dedup_mentions_ds(mentions_ds, num_buckets: int | None = None):
    """D2 (SURVEY §2.7): dedup identical spans across taggers.

    Running several taggers (HMM ∪ BiLSTM ∪ dictionary) over the same
    sentences double-counts every span both agree on; this keeps ONE
    row per ``(doc_id, span_idx, sent_idx, ment_start, ment_end)`` —
    the max-score row, tagger name as the deterministic tie-break.

    Same scale shape as triple dedup: per-block vectorized combine
    (pandas drop_duplicates) → ONE range exchange keyed on the span
    identity; output globally sorted by that key.  Fully parallel at
    every level — the distinct span set grows with the corpus.
    """
    import numpy as np

    from kgforge.stages.exchange import range_exchange_merge

    partial = mentions_ds.map_batches(_best_mention_per_span,
                                      batch_format="pyarrow").materialize()

    def key_of(batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        from kgforge.stages.exchange import arrow_string_keys

        joined = pc.binary_join_element_wise(
            batch["doc_id"],
            pc.utf8_lpad(pc.cast(batch["span_idx"], pa.string()), 6, "0"),
            pc.utf8_lpad(pc.cast(batch["sent_idx"], pa.string()), 6, "0"),
            pc.utf8_lpad(pc.cast(batch["ment_start"], pa.string()), 6, "0"),
            pc.utf8_lpad(pc.cast(batch["ment_end"], pa.string()), 6, "0"),
            "\x00")
        return arrow_string_keys(joined, 48)

    return range_exchange_merge(partial, key_of=key_of,
                                merge_fn=_best_mention_per_span,
                                num_buckets=num_buckets)
