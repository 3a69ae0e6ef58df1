"""Distributed triple extraction + dedup (SURVEY §2.11, §2.7 D1).

:class:`TripleExtractor` is a stateless-in-spirit actor holding only the
broadcast alias map; it maps sentence-with-mentions batches to T3 triple
rows using the *oracle* rule engine (identical semantics by
construction).  Dedup is the canonical two-phase pattern: in-batch
combine (map_batches) → range-partitioned merge+sort in one exchange
(SHUFFLE 2+3 of SURVEY §3.2 fused; see :func:`dedup_triples_ds`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgforge.oracle.triples import Mention, extract_triples

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("sent_idx", pa.int32()),
    ("support", pa.int64()),
    ("pid", pa.int32()),
])

EDGE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("support", pa.int64()),
    ("first_doc", pa.string()),
])


_ALIAS_CACHE: dict = {}


def alias_from_ref(alias_ref) -> dict:
    """Per-worker-process cache of the broadcast alias map: ``ray.get``
    of a Python dict deserializes on every call, so stateless task fns
    resolve it once per process (the actor-pool alternative paid ~2-5s
    of pool spin-up per stage for the same effect)."""
    key = alias_ref.hex()
    if key not in _ALIAS_CACHE:
        import ray

        _ALIAS_CACHE.clear()          # only one broadcast generation live
        _ALIAS_CACHE[key] = ray.get(alias_ref)
    return _ALIAS_CACHE[key]


def make_triple_extract_fn(alias_ref):
    """Stateless task variant of :class:`TripleExtractor` — fuses with
    upstream map stages (no actor pool)."""

    def extract(batch: pa.Table) -> pa.Table:
        return TripleExtractor(alias_map=alias_from_ref(alias_ref))(batch)

    return extract


class TripleExtractor:
    """Sentence rows (``mentions`` attached) → T3 rows."""

    def __init__(self, alias_ref=None, alias_map=None):
        if alias_ref is not None:
            import ray

            self.alias: dict = ray.get(alias_ref)
        else:
            self.alias = alias_map or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ments = batch["mentions"]
        if isinstance(ments, pa.ChunkedArray):
            ments = ments.combine_chunks()
        # mention-less sentences produce nothing — drop before any
        # Python-object conversion
        batch = batch.filter(pc.greater(pc.list_value_length(ments), 0))
        ments = batch["mentions"]
        if isinstance(ments, pa.ChunkedArray):
            ments = ments.combine_chunks()
        flat = pc.list_flatten(ments)
        parents = pc.list_parent_indices(ments) \
            .to_numpy(zero_copy_only=False)
        etypes = flat.field("etype").to_pylist()
        starts = flat.field("ment_start").to_pylist()
        ends = flat.field("ment_end").to_pylist()
        surfaces = flat.field("surface").to_pylist()
        per_row: list[list[Mention]] = [[] for _ in range(batch.num_rows)]
        for p, e, s, t, sf in zip(parents, etypes, starts, ends, surfaces):
            per_row[p].append(Mention(e, s, t, sf))
        out: list[dict] = []
        for text, doc_id, span_idx, sent_idx, pid, ms in zip(
                batch["sent_text"].to_pylist(),
                batch["doc_id"].to_pylist(),
                batch["span_idx"].to_pylist(),
                batch["sent_idx"].to_pylist(),
                batch["pid"].to_pylist(), per_row):
            for t in extract_triples(text, ms, self.alias, doc_id,
                                     span_idx, sent_idx):
                t["pid"] = pid
                out.append(t)
        return pa.Table.from_pylist(out, schema=TRIPLE_SCHEMA)


def combine_triples_in_batch(batch: pa.Table) -> pa.Table:
    """Partial D1 combiner: merge duplicate (subj, pred, obj) within a
    batch before any exchange (pre-aggregation — SURVEY §4).  Pure
    ``pyarrow.Table.group_by`` — C++-vectorized, no per-row Python."""
    if "doc_id" in batch.column_names:           # T3 input
        batch = pa.table({
            "subj": batch["subj"], "pred": batch["pred"],
            "obj": batch["obj"], "subj_type": batch["subj_type"],
            "obj_type": batch["obj_type"], "support": batch["support"],
            "first_doc": batch["doc_id"]})
    g = batch.group_by(["subj", "pred", "obj"], use_threads=False).aggregate(
        [("subj_type", "min"), ("obj_type", "min"),
         ("support", "sum"), ("first_doc", "min")])
    g = g.select(["subj", "pred", "obj", "subj_type_min", "obj_type_min",
                  "support_sum", "first_doc_min"])
    return g.rename_columns(["subj", "pred", "obj", "subj_type",
                             "obj_type", "support", "first_doc"]) \
        .cast(EDGE_SCHEMA)


def add_hash_bucket(batch: pa.Table, key_cols: list[str],
                    num_buckets: int) -> pa.Table:
    """Append a ``bucket`` int column = stable hash of the key columns
    (vectorized siphash) — the explicit hash-partition key for the
    merge shuffle."""
    import pandas as pd

    if batch.num_rows == 0:
        return batch.append_column("bucket", pa.array([], pa.int64()))
    h = pd.util.hash_pandas_object(
        batch.select(key_cols).to_pandas(), index=False) \
        .to_numpy(dtype=np.uint64)
    return batch.append_column(
        "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))


_KEY_SEP = "\x00"   # below every content codepoint → concat order == tuple order


def _triple_keys(batch: pa.Table) -> np.ndarray:
    """Fixed-width numpy key array (U48): searchsorted/argsort compare
    in C (object-dtype Python strings cost ~100M interpreted compares
    per exchange).  Truncation is safe: keys equal in the first 48
    chars land in the same range bucket, and the within-bucket merge
    sorts on the full columns.  Separator is NUL (U+0000), strictly
    below every possible content codepoint, so concat ordering agrees
    with (subj, pred, obj) tuple ordering; the assert verifies no
    content NUL snuck in (vectorized, one substring count)."""
    import pyarrow.compute as pc

    joined = pc.binary_join_element_wise(batch["subj"], batch["pred"],
                                         batch["obj"], _KEY_SEP)
    n_nul = pc.sum(pc.count_substring(joined, _KEY_SEP)).as_py() or 0
    assert n_nul == 2 * batch.num_rows, \
        "NUL byte inside subj/pred/obj content breaks range-key ordering"
    return np.asarray(joined.to_pylist(), dtype="U48")


def dedup_triples_ds(triples_ds, num_buckets: int | None = None):
    """T3 ds → globally sorted edge table ds (D1 + O2) in ONE exchange.

    Per-block vectorized combine (pre-aggregation), then a
    range-partitioned merge: sample-based split points over the
    combined ``subj␟pred␟obj`` key assign each partial row a range
    bucket; ``groupby(bucket)`` co-locates each key range, the
    per-bucket merge combines + sorts within the range, and because
    groupby emits partitions in key order the concatenated output is
    globally sorted — no separate sort exchange.  The distinct edge
    set is NOT assumed small (structural ``mentions(doc, entity)``
    triples grow with the corpus): every level is parallel; scale by
    raising ``num_buckets``.
    """
    from kgforge.stages.exchange import range_exchange_merge

    partial = triples_ds.map_batches(combine_triples_in_batch,
                                     batch_format="pyarrow").materialize()

    def merge_and_sort(tbl: pa.Table) -> pa.Table:
        merged = combine_triples_in_batch(tbl)
        return merged.sort_by([("subj", "ascending"), ("pred", "ascending"),
                               ("obj", "ascending")])

    return range_exchange_merge(partial, key_of=_triple_keys,
                                merge_fn=merge_and_sort,
                                num_buckets=num_buckets)
