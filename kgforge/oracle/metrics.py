"""MSRA-style per-entity-type precision / recall / F1
(``REF?:`` eval/metrics module; BASELINE.json:6 "the repo's MSRA-style
per-entity eval").  A hit is an exact ``(etype, start, end)`` span
match within the same sentence (SURVEY §2.5 G3)."""

from __future__ import annotations

from kgforge.oracle.labels import ENTITY_TYPES, extract_entities


def span_match_counts(gold_tags: list[list[str]], pred_tags: list[list[str]]
                      ) -> dict[str, dict[str, int]]:
    """Per-type {gold, pred, hit} counts over aligned sentence lists."""
    counts = {t: {"gold": 0, "pred": 0, "hit": 0} for t in ENTITY_TYPES}
    for g_tags, p_tags in zip(gold_tags, pred_tags):
        g = set(extract_entities(g_tags))
        p = set(extract_entities(p_tags))
        for etype, s, e in g:
            counts[etype]["gold"] += 1
        for etype, s, e in p:
            counts[etype]["pred"] += 1
        for ent in g & p:
            counts[ent[0]]["hit"] += 1
    return counts


def prf_table(counts: dict[str, dict[str, int]]) -> list[dict]:
    """Counts → per-type + micro-average P/R/F1 rows."""
    rows = []
    tot = {"gold": 0, "pred": 0, "hit": 0}
    for etype in ENTITY_TYPES:
        c = counts[etype]
        for k in tot:
            tot[k] += c[k]
        rows.append(_prf_row(etype, c))
    rows.append(_prf_row("ALL", tot))
    return rows


def _prf_row(etype: str, c: dict[str, int]) -> dict:
    p = c["hit"] / c["pred"] if c["pred"] else 0.0
    r = c["hit"] / c["gold"] if c["gold"] else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return {"etype": etype, "gold": c["gold"], "pred": c["pred"],
            "hit": c["hit"], "precision": p, "recall": r, "f1": f}
