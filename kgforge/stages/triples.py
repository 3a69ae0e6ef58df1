"""Distributed triple extraction + dedup (SURVEY §2.11, §2.7 D1).

:class:`TripleExtractor` is a stateless-in-spirit actor holding only the
broadcast alias map; it maps sentence-with-mentions batches to T3 triple
rows using the *oracle* rule engine (identical semantics by
construction).  Dedup is the canonical two-phase pattern: in-batch
combine (map_batches) → ``groupby(subj, pred, obj).map_groups`` final
merge → global sort (SHUFFLE 2 + 3 of SURVEY §3.2).
"""

from __future__ import annotations

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


class TripleExtractor:
    """Sentence rows (``mentions`` attached) → T3 rows."""

    def __init__(self, alias_ref=None, alias_map=None):
        if alias_ref is not None:
            import ray

            self.alias: dict = ray.get(alias_ref)
        else:
            self.alias = alias_map or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.select(["doc_id", "span_idx", "sent_idx", "sent_text",
                             "mentions", "pid"]).to_pylist()
        out: list[dict] = []
        for r in rows:
            ms = [Mention(m["etype"], m["ment_start"], m["ment_end"],
                          m["surface"]) for m in r["mentions"]]
            if not ms:
                continue
            for t in extract_triples(r["sent_text"], ms, self.alias,
                                     r["doc_id"], r["span_idx"],
                                     r["sent_idx"]):
                t["pid"] = r["pid"]
                out.append(t)
        return pa.Table.from_pylist(out, schema=TRIPLE_SCHEMA)


def combine_triples_in_batch(batch: pa.Table) -> pa.Table:
    """Partial D1 combiner: merge duplicate (subj, pred, obj) within a
    batch before the shuffle (pre-aggregation — SURVEY §4).  Vectorized
    pandas groupby: a Python row loop here was the hot path."""
    df = batch.select(["subj", "pred", "obj", "subj_type", "obj_type",
                       "support", "doc_id"]).to_pandas()
    g = df.groupby(["subj", "pred", "obj"], as_index=False, sort=True).agg(
        subj_type=("subj_type", "min"), obj_type=("obj_type", "min"),
        support=("support", "sum"), first_doc=("doc_id", "min"))
    return pa.Table.from_pandas(
        g[["subj", "pred", "obj", "subj_type", "obj_type", "support",
           "first_doc"]], schema=EDGE_SCHEMA, preserve_index=False)


def dedup_triples_ds(triples_ds):
    """T3 ds → sorted edge table ds (D1 + O2): two-phase aggregate —
    in-batch combiner, then ONE native groupby-aggregate (no per-group
    Python calls), then the global range sort."""
    from ray.data.aggregate import Min, Sum

    partial = triples_ds.map_batches(combine_triples_in_batch,
                                     batch_format="pyarrow")
    merged = partial.groupby(["subj", "pred", "obj"]).aggregate(
        Min("subj_type", alias_name="subj_type"),
        Min("obj_type", alias_name="obj_type"),
        Sum("support", alias_name="support"),
        Min("first_doc", alias_name="first_doc"))
    return merged.sort(["subj", "pred", "obj"])
