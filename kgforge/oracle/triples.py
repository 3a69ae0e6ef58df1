"""Pattern-rule triple extraction (SURVEY §2.11; BASELINE.json:6
"dependency-pattern triple extractor emitting (subj, pred, obj) rows").

No dependency parser exists offline and the reference stops at NER, so
the rules are a *closed, frozen* pattern set over typed mention pairs
within one sentence (FIXTURES.md §D ``triple_rules.json``): golden
triples are a deterministic function of the mention set, which reduces
the P/R-vs-reference criterion to mention-set equality.

Rule semantics for an ordered mention pair ``(m1, m2)`` with
``m1.end <= m2.start`` in the same sentence:

- types must equal ``(subj_type, obj_type)`` (or reversed when
  ``direction == "obj_first"``, e.g. LOC 的 ORG → located_in(ORG, LOC)),
- the *gap text* between the two mentions must contain one of the
  rule's connectives and be at most ``max_gap`` chars long.

Additionally: ``co_occurs`` between every unordered pair of distinct
canonical entities within ``COOCCUR_WINDOW`` chars, and ``mentions``
from the doc to every canonical entity.
"""

from __future__ import annotations

from dataclasses import dataclass

COOCCUR_WINDOW = 30

# (pred, subj_type, obj_type, direction, connectives, max_gap)
# direction: "subj_first" → subj mention precedes obj mention in text;
#            "obj_first"  → obj mention precedes subj mention.
TRIPLE_RULES: list[tuple[str, str, str, str, tuple[str, ...], int]] = [
    ("works_at",       "PER", "ORG", "subj_first", ("任职于", "在"), 8),
    ("graduated_from", "PER", "ORG", "subj_first", ("毕业于",), 4),
    ("located_in",     "ORG", "LOC", "subj_first", ("位于", "将在"), 4),
    ("located_in",     "ORG", "LOC", "obj_first",  ("的",), 2),
    ("born_in",        "PER", "LOC", "subj_first", ("出生于",), 4),
    ("visited",        "PER", "LOC", "subj_first", ("访问了",), 4),
    ("colleague_of",   "PER", "PER", "subj_first", ("和",), 2),
    ("partner_of",     "ORG", "ORG", "subj_first", ("与",), 2),
]


@dataclass(frozen=True)
class Mention:
    """A detected mention inside one sentence (sentence-local offsets)."""

    etype: str
    start: int
    end: int
    surface: str


def extract_triples(sent_text: str, mentions: list[Mention],
                    canon: dict[str, tuple[str, str]],
                    doc_id: str, span_idx: int, sent_idx: int,
                    emit_mentions_pred: bool = True) -> list[dict]:
    """All triples from one tagged sentence.

    ``canon``: (etype, surface) → (canon_id, canon_surface); unknown
    surfaces map to themselves.  Output rows use canonical surfaces for
    subj/obj.
    Deterministic: mention list is processed in (start, end) order;
    co_occurs pairs are emitted with lexicographically ordered members.
    """

    def canon_of(m: Mention) -> str:
        return canon.get((m.etype, m.surface), (None, m.surface))[1]

    ms = sorted(mentions, key=lambda m: (m.start, m.end))
    rows: list[dict] = []

    def emit(pred, subj_m, obj_m):
        rows.append({
            "subj": canon_of(subj_m), "pred": pred,
            "obj": canon_of(obj_m),
            "subj_type": subj_m.etype, "obj_type": obj_m.etype,
            "doc_id": doc_id, "span_idx": span_idx, "sent_idx": sent_idx,
            "support": 1,
        })

    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            first, second = ms[i], ms[j]
            if second.start < first.end:
                continue  # overlapping mentions: no relation
            gap = sent_text[first.end: second.start]
            for pred, st, ot, direction, conns, max_gap in TRIPLE_RULES:
                if len(gap) > max_gap or not any(c in gap for c in conns):
                    continue
                if direction == "subj_first" and first.etype == st and second.etype == ot:
                    emit(pred, first, second)
                elif direction == "obj_first" and first.etype == ot and second.etype == st:
                    emit(pred, second, first)
            # co-occurrence (type-agnostic, windowed, unordered)
            if second.start - first.end <= COOCCUR_WINDOW:
                ca, cb = canon_of(first), canon_of(second)
                if ca != cb:
                    (s_m, o_m) = (first, second) if ca <= cb else (second, first)
                    emit("co_occurs", s_m, o_m)

    if emit_mentions_pred:
        seen: set[str] = set()
        for m in ms:
            c = canon_of(m)
            if c in seen:
                continue
            seen.add(c)
            rows.append({
                "subj": doc_id, "pred": "mentions", "obj": c,
                "subj_type": "DOC", "obj_type": m.etype,
                "doc_id": doc_id, "span_idx": span_idx, "sent_idx": sent_idx,
                "support": 1,
            })
    return rows


def dedup_triples(rows: list[dict]) -> list[dict]:
    """Oracle-side D1: group by (subj, pred, obj) → support sum, first
    doc (min doc_id), keep types; sorted output (SURVEY §2.6 O2)."""
    agg: dict[tuple[str, str, str], dict] = {}
    for r in rows:
        key = (r["subj"], r["pred"], r["obj"])
        doc = r.get("doc_id", r.get("first_doc"))
        cur = agg.get(key)
        if cur is None:
            agg[key] = {"subj": r["subj"], "pred": r["pred"], "obj": r["obj"],
                        "subj_type": r["subj_type"], "obj_type": r["obj_type"],
                        "support": r["support"], "first_doc": doc}
        else:
            cur["support"] += r["support"]
            cur["first_doc"] = min(cur["first_doc"], doc)
    return [agg[k] for k in sorted(agg)]


def triple_prf(pred_rows: list[dict], gold_rows: list[dict]) -> dict:
    """Set-level precision/recall/F1 over distinct (subj, pred, obj)."""
    p = {(r["subj"], r["pred"], r["obj"]) for r in pred_rows}
    g = {(r["subj"], r["pred"], r["obj"]) for r in gold_rows}
    hit = len(p & g)
    prec = hit / len(p) if p else 1.0
    rec = hit / len(g) if g else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1,
            "n_pred": len(p), "n_gold": len(g), "n_hit": hit}
