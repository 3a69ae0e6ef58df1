"""G3: distributed MSRA-style per-entity eval (SURVEY §2.5).

``map_batches`` computes per-batch (etype → gold/pred/hit) count
partials from aligned gold/predicted tag columns (the combiner), one
small ``groupby(etype)`` Sum merges them, and P/R/F1 are finished on
the driver — counts shuffle, never sentences.  Semantics identical to
:mod:`kgforge.oracle.metrics` (exact (etype, start, end) span match
within a sentence; BASELINE.json:6 "MSRA-style per-entity eval").
"""

from __future__ import annotations

import pyarrow as pa

from kgforge.oracle.labels import ENTITY_TYPES, extract_entities
from kgforge.oracle.metrics import prf_table


def _partial_counts(batch: pa.Table, gold_col: str, pred_col: str
                    ) -> pa.Table:
    counts = {t: {"gold": 0, "pred": 0, "hit": 0} for t in ENTITY_TYPES}
    for g_tags, p_tags in zip(batch[gold_col].to_pylist(),
                              batch[pred_col].to_pylist()):
        g = set(extract_entities(list(g_tags)))
        p = set(extract_entities(list(p_tags)))
        for etype, _, _ in g:
            counts[etype]["gold"] += 1
        for etype, _, _ in p:
            counts[etype]["pred"] += 1
        for ent in g & p:
            counts[ent[0]]["hit"] += 1
    rows = [{"etype": t, **c} for t, c in sorted(counts.items())]
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("etype", pa.string()), ("gold", pa.int64()),
        ("pred", pa.int64()), ("hit", pa.int64())]))


def evaluate_ds(tagged_ds, gold_col: str = "gold_tags",
                pred_col: str = "tags") -> list[dict]:
    """Dataset with aligned gold/pred tag-list columns → per-type +
    micro-average P/R/F1 rows (small driver-side result)."""
    from ray.data.aggregate import Sum

    merged = tagged_ds.map_batches(
        lambda b: _partial_counts(b, gold_col, pred_col),
        batch_format="pyarrow") \
        .groupby("etype").aggregate(
            Sum("gold", alias_name="gold"),
            Sum("pred", alias_name="pred"),
            Sum("hit", alias_name="hit"))
    counts = {r["etype"]: {"gold": int(r["gold"]), "pred": int(r["pred"]),
                           "hit": int(r["hit"])}
              for r in merged.take_all()}
    for t in ENTITY_TYPES:
        counts.setdefault(t, {"gold": 0, "pred": 0, "hit": 0})
    return prf_table(counts)
