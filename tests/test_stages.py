"""Ray stage unit tests: explode parity with the oracle, CoNLL reader,
checkpoint round-trip (SURVEY §5.2)."""

import pyarrow as pa
import pytest

from kgforge.oracle.corpus import (
    corpus_to_conll, generate_corpus, generate_interleaved_docs,
)
from kgforge.oracle.pipeline import tag_docs
from kgforge.sources.interleaved import docs_to_table
from kgforge.stages.explode import make_explode_spans


def test_explode_matches_oracle_sentences(hmm_model, small_docs):
    batch = docs_to_table(small_docs)
    out = make_explode_spans(32)(batch)
    got = out.select(["doc_id", "span_idx", "span_offset", "sent_idx",
                      "sent_offset", "sent_text"]).to_pylist()
    oracle_rows = [{k: r[k] for k in ("doc_id", "span_idx", "span_offset",
                                      "sent_idx", "sent_offset", "sent_text")}
                   for r in tag_docs(hmm_model, small_docs)]
    assert got == oracle_rows


def test_explode_media_anchor():
    docs = [{"doc_id": "d1", "spans": [
        {"kind": "image", "text": "", "media_ref": "media://image/000001", "offset": 0},
        {"kind": "text", "text": "你好。", "media_ref": "", "offset": 0},
        {"kind": "audio", "text": "", "media_ref": "media://audio/000002", "offset": 3},
        {"kind": "text", "text": "再见。", "media_ref": "", "offset": 3},
    ]}]
    out = make_explode_spans(8)(docs_to_table(docs)).to_pylist()
    assert out[0]["anchor_media_ref"] == "media://image/000001"
    assert out[1]["anchor_media_ref"] == "media://audio/000002"
    assert [r["span_idx"] for r in out] == [1, 3]


def test_explode_empty_and_media_only():
    docs = [
        {"doc_id": "d0", "spans": []},
        {"doc_id": "d1", "spans": [{"kind": "image", "text": "",
                                    "media_ref": "media://image/000009",
                                    "offset": 0}]},
        {"doc_id": "d2", "spans": [{"kind": "text", "text": "",
                                    "media_ref": "", "offset": 0}]},
    ]
    out = make_explode_spans(8)(docs_to_table(docs))
    assert out.num_rows == 0


def test_conll_reader(ray_session, tmp_path):
    sents = generate_corpus(40, seed=42)
    path = tmp_path / "train.txt"
    path.write_text(corpus_to_conll(sents), encoding="utf-8")
    from kgforge.sources.conll import read_conll

    rows = read_conll(str(path)).take_all()
    assert len(rows) == 40
    assert [list(r["chars"]) for r in rows] == [s.chars for s in sents]
    assert [list(r["tags"]) for r in rows] == [s.tags for s in sents]


def test_checkpoint_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from kgforge.stages.checkpoint import CheckpointManager

    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(100)], pa.string()),
        "val": pa.array(list(range(100)), pa.int64()),
        "pid": pa.array([i % 4 for i in range(100)], pa.int32()),
    })
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), num_partitions=4)
    assert not ckpt.is_complete("stage_a")
    out = ckpt.write_stage("stage_a", rd.from_arrow(tbl),
                           checksum_cols=["doc_id", "val"])
    assert ckpt.is_complete("stage_a")
    back = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(back) == 100
    assert back["pid"].dtype.name in ("int32", "int64")
    lineage = ckpt.lineage().to_pylist()
    # partition ids are content-derived (write-through checkpoints);
    # every written block contributes one complete lineage row
    assert len(lineage) >= 1
    assert len({r["partition_id"] for r in lineage}) == len(lineage)
    assert sum(r["output_rows"] for r in lineage) == 100
    assert all(r["status"] == "complete" for r in lineage)
    # resume path: read_stage returns the persisted rows
    back2 = ckpt.read_stage("stage_a").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(back2) == 100


def test_distributed_hmm_training_matches_local(ray_session):
    """G1: distributed count aggregation == single-process fit."""
    import numpy as np
    import ray.data as rd

    from kgforge.oracle import hmm as H
    from kgforge.oracle.labels import BIO_TAGS
    from kgforge.oracle.vocab import build_vocab, count_chars
    from kgforge.stages.tagger import train_hmm_distributed

    train = generate_corpus(300, seed=42)
    vocab = build_vocab(count_chars(train))
    local = H.fit(train, vocab)
    corpus_ds = rd.from_items([
        {"chars": s.chars, "tags": s.tags} for s in train]).repartition(8)
    dist = train_hmm_distributed(corpus_ds, vocab, tuple(BIO_TAGS))
    assert np.allclose(local.pi, dist.pi)
    assert np.allclose(local.a, dist.a)
    assert np.allclose(local.b, dist.b)


def test_distributed_eval_matches_oracle(ray_session, hmm_model):
    """G3: distributed per-type eval == single-process oracle metrics."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.oracle import hmm as H
    from kgforge.oracle.corpus import generate_corpus
    from kgforge.oracle.metrics import prf_table, span_match_counts
    from kgforge.stages.evaluate import evaluate_ds

    test = generate_corpus(150, seed=77)
    pred = H.decode_texts(hmm_model, [s.text for s in test])
    local = prf_table(span_match_counts([s.tags for s in test], pred))

    tbl = pa.table({
        "gold_tags": pa.array([s.tags for s in test]),
        "tags": pa.array(pred),
    })
    dist = evaluate_ds(rd.from_arrow(tbl).repartition(5))
    assert dist == local


def test_sentence_reconstruction_invariant(ray_session, hmm_model,
                                           small_docs, tmp_path):
    """I1 output-side: text spans rebuild exactly from the sentences
    stage; a mutated sentence is detected as a violation."""
    import pyarrow.compute as pc
    import ray.data as rd

    from kgforge.pipelines.flagship import run_flagship
    from kgforge.sources.interleaved import write_interleaved
    from kgforge.stages.invariant import verify_sentence_reconstruction

    model_path = str(tmp_path / "hmm.npz")
    hmm_model.save(model_path)
    t0_path = write_interleaved(small_docs, str(tmp_path / "t0"),
                                rows_per_fragment=40)
    res = run_flagship(t0_path=t0_path, model_path=model_path,
                       ckpt_root=str(tmp_path / "ckpt"),
                       tagger_concurrency=2, verify_i1=True)
    assert res["i1_violations"] == 0
    assert res["i1_span_violations"] == 0

    def corrupt(b):
        import pyarrow as pa

        texts = b["sent_text"].to_pylist()
        if texts:
            texts[0] = texts[0] + "X"
        idx = b.column_names.index("sent_text")
        return b.set_column(idx, "sent_text", pa.array(texts, pa.string()))

    bad = res["sentences"].map_batches(corrupt, batch_format="pyarrow")
    t0_ds = rd.read_parquet(t0_path, file_extensions=["parquet"])
    assert verify_sentence_reconstruction(t0_ds, bad) > 0

    # the doc-hash lane behind verify_i1=True must ALSO be falsifiable:
    # the same mutated sentence, and a dropped sentence, each flip the
    # rebuilt span-sequence hash for the affected docs
    from kgforge.stages.invariant import verify_invariant_output

    assert verify_invariant_output(t0_ds, bad) > 0

    def drop_one(b):
        return b.slice(1) if b.num_rows else b

    dropped = res["sentences"].map_batches(drop_one, batch_format="pyarrow")
    assert verify_invariant_output(t0_ds, dropped) > 0


def test_explode_vectorized_matches_reference_loop():
    """Vectorized explode == the straightforward per-span loop
    (split_sentences + running anchor) on randomized docs covering
    terminators at edges, consecutive terminators, terminator-free
    tails, empty-ref media, and interleaving."""
    import random

    from kgforge.oracle.segment import split_sentences

    rng = random.Random(13)
    frags = ["今天天气很好", "你好", "再见", "哈", "", "外语abc",
             "。", "！", "？", "；", "。。", "正文"]
    docs = []
    for d in range(60):
        spans, off = [], 0
        for _ in range(rng.randint(0, 8)):
            if rng.random() < 0.35:
                ref = ("" if rng.random() < 0.2
                       else f"media://image/{rng.randint(0, 99):06d}")
                spans.append({"kind": "image", "text": "",
                              "media_ref": ref, "offset": off})
            else:
                text = "".join(rng.choice(frags)
                               for _ in range(rng.randint(0, 4)))
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": off})
                off += len(text)
        docs.append({"doc_id": f"r{d:03d}", "spans": spans})

    got = make_explode_spans(16)(docs_to_table(docs)).to_pylist()

    exp = []
    from kgforge.common.hashing import hash_u64_np
    import numpy as np
    doc_ids = [d["doc_id"] for d in docs]
    pids = (hash_u64_np(doc_ids) % np.uint64(16)).astype(int)
    for p, doc in enumerate(docs):
        anchor = ""
        for span_idx, s in enumerate(doc["spans"]):
            if s["kind"] != "text":
                anchor = s["media_ref"] or anchor
                continue
            if not s["text"]:
                continue
            for sent_idx, (o, sent) in enumerate(
                    split_sentences(s["text"])):
                exp.append({"doc_id": doc["doc_id"], "span_idx": span_idx,
                            "span_offset": s["offset"],
                            "sent_idx": sent_idx, "sent_offset": o,
                            "sent_text": sent, "anchor_media_ref": anchor,
                            "pid": int(pids[p])})
    assert got == exp and len(exp) > 50


def test_triple_extractor_vectorized_matches_oracle(hmm_model):
    """Vectorized TripleExtractor == per-sentence oracle rule loop
    (multiset of rows) on tagged fixture sentences, with a non-trivial
    alias map."""
    from collections import Counter

    from kgforge.oracle.corpus import generate_interleaved_docs
    from kgforge.oracle.linking import resolve_aliases
    from kgforge.oracle.pipeline import tag_docs
    from kgforge.oracle.triples import Mention, extract_triples
    from kgforge.stages.mentions import attach_mentions
    from kgforge.stages.triples import TripleExtractor

    docs = generate_interleaved_docs(150, seed=42)
    rows = tag_docs(hmm_model, docs)          # rows carry oracle tags
    batch = pa.Table.from_pylist(
        [{**r, "pid": i % 8} for i, r in enumerate(rows)])
    with_m = attach_mentions(batch)

    # alias map discovered from the mention surfaces
    support: dict = {}
    import pyarrow.compute as pc
    flat = pc.list_flatten(with_m["mentions"])
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    for e, s in zip(flat.field("etype").to_pylist(),
                    flat.field("surface").to_pylist()):
        support[(e, s)] = support.get((e, s), 0) + 1
    alias = resolve_aliases(support)

    got = TripleExtractor(alias_map=alias)(with_m)
    got_rows = Counter(tuple(sorted(r.items()))
                       for r in got.to_pylist())

    exp_rows: Counter = Counter()
    parents = pc.list_parent_indices(with_m["mentions"]).to_pylist()
    per_row = [[] for _ in range(with_m.num_rows)]
    for p, e, st, en, sf in zip(
            parents, flat.field("etype").to_pylist(),
            flat.field("ment_start").to_pylist(),
            flat.field("ment_end").to_pylist(),
            flat.field("surface").to_pylist()):
        per_row[p].append(Mention(e, st, en, sf))
    for i in range(with_m.num_rows):
        r = with_m.slice(i, 1).to_pylist()[0]
        for t in extract_triples(r["sent_text"], per_row[i], alias,
                                 r["doc_id"], r["span_idx"],
                                 r["sent_idx"]):
            t["pid"] = r["pid"]
            exp_rows[tuple(sorted(t.items()))] += 1
    assert got_rows == exp_rows and len(got_rows) > 100
