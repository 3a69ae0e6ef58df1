"""Single-process oracle end-to-end: T0 docs → tags → mentions →
linking → triples → nodes/edges.  The distributed flagship
(:mod:`kgforge.pipelines.flagship`) must reproduce these outputs
exactly (target P/R = 1.0; requirement ≥ 0.95 per BASELINE.json:2)."""

from __future__ import annotations

from collections import Counter

from kgforge.oracle import hmm as hmm_mod
from kgforge.oracle.corpus import generate_corpus
from kgforge.oracle.labels import extract_entities
from kgforge.oracle.linking import resolve_aliases
from kgforge.oracle.segment import split_sentences
from kgforge.oracle.triples import Mention, dedup_triples, extract_triples
from kgforge.oracle.vocab import build_vocab, count_chars


def train_hmm(n_train: int = 2000, seed: int = 42) -> hmm_mod.HmmModel:
    """Fit the conformance HMM on the deterministic corpus (FIXTURES §A)."""
    train = generate_corpus(n_train, seed=seed)
    vocab = build_vocab(count_chars(train))
    return hmm_mod.fit(train, vocab)


def tag_docs(model: hmm_mod.HmmModel, docs: list[dict]) -> list[dict]:
    """T0 rows → sentence rows with predicted BIO tags.

    Output row: {doc_id, span_idx, span_offset, sent_idx, sent_offset,
    sent_text, tags}.  Media / empty-text spans produce no rows.
    """
    sent_rows: list[dict] = []
    texts: list[str] = []
    for doc in docs:
        for span_idx, span in enumerate(doc["spans"]):
            if span["kind"] != "text" or not span["text"]:
                continue
            for sent_idx, (off, sent) in enumerate(split_sentences(span["text"])):
                sent_rows.append({
                    "doc_id": doc["doc_id"], "span_idx": span_idx,
                    "span_offset": span["offset"], "sent_idx": sent_idx,
                    "sent_offset": off, "sent_text": sent,
                })
                texts.append(sent)
    tags = hmm_mod.decode_texts(model, texts)
    for row, t in zip(sent_rows, tags):
        row["tags"] = t
    return sent_rows


def mentions_of(sent_rows: list[dict]) -> list[dict]:
    """Sentence rows → T1 mention rows (SURVEY §1.2)."""
    out: list[dict] = []
    for row in sent_rows:
        for etype, s, e in extract_entities(row["tags"]):
            out.append({
                "doc_id": row["doc_id"], "span_idx": row["span_idx"],
                "sent_idx": row["sent_idx"],
                "offset": row["span_offset"] + row["sent_offset"],
                "ment_start": s, "ment_end": e,
                "surface": row["sent_text"][s:e], "etype": etype,
                "tagger": "hmm", "score": 1.0,
            })
    return out


def run_oracle(docs: list[dict], model: hmm_mod.HmmModel | None = None) -> dict:
    """Full oracle run → {sent_rows, mentions, canon, triples, edges, nodes}."""
    model = model or train_hmm()
    sent_rows = tag_docs(model, docs)
    ment = mentions_of(sent_rows)
    support = Counter((m["etype"], m["surface"]) for m in ment)
    canon = resolve_aliases(dict(support))

    triples: list[dict] = []
    by_sent: dict[tuple, list[dict]] = {}
    for m in ment:
        by_sent.setdefault((m["doc_id"], m["span_idx"], m["sent_idx"]), []).append(m)
    for row in sent_rows:
        key = (row["doc_id"], row["span_idx"], row["sent_idx"])
        ms = [Mention(m["etype"], m["ment_start"], m["ment_end"], m["surface"])
              for m in by_sent.get(key, [])]
        if ms:
            triples.extend(extract_triples(row["sent_text"], ms, canon,
                                           row["doc_id"], row["span_idx"],
                                           row["sent_idx"]))
    edges = dedup_triples(triples)
    nodes = node_table(ment, canon)
    return {"sent_rows": sent_rows, "mentions": ment, "canon": canon,
            "triples": triples, "edges": edges, "nodes": nodes}


def node_table(mentions: list[dict], canon: dict[str, tuple[str, str]]
               ) -> list[dict]:
    """T4 nodes: canon_id, surface, etype (majority→lexicographic min on
    tie), n_mentions, n_docs — sorted by canon_id (SURVEY §2.5 G5)."""
    from kgforge.oracle.linking import canon_id_of

    per: dict[str, dict] = {}
    for m in mentions:
        key = (m["etype"], m["surface"])
        cid, csurf = canon.get(key, (None, m["surface"]))
        if cid is None:
            cid = canon_id_of(m["etype"], csurf)
        n = per.setdefault(cid, {"canon_id": cid, "surface": csurf,
                                 "types": Counter(), "n_mentions": 0,
                                 "docs": set()})
        n["types"][m["etype"]] += 1
        n["n_mentions"] += 1
        n["docs"].add(m["doc_id"])
    rows = []
    for cid in sorted(per):
        n = per[cid]
        etype = sorted(n["types"].items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        rows.append({"canon_id": cid, "surface": n["surface"], "etype": etype,
                     "n_mentions": n["n_mentions"], "n_docs": len(n["docs"])})
    return rows
