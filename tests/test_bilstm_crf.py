"""A2 BiLSTM-CRF: numpy forward + CRF Viterbi correctness,
deterministic training, Tagger-protocol parity in the Ray pipeline."""

import numpy as np
import pytest

from kgforge.oracle import bilstm_crf as B
from kgforge.oracle.corpus import generate_corpus
from kgforge.oracle.labels import extract_entities
from kgforge.oracle.vocab import build_vocab, count_chars


@pytest.fixture(scope="module")
def trained():
    train = generate_corpus(600, seed=42)
    vocab = build_vocab(count_chars(train))
    return B.fit(train, vocab, epochs=10), vocab


def test_viterbi_crf_vs_bruteforce():
    """Batched CRF Viterbi == exhaustive path enumeration (≤ 5 tags,
    ≤ 6 steps)."""
    rng = np.random.RandomState(3)
    T, L = 4, 5
    em = rng.standard_normal((2, L, T))
    trans = rng.standard_normal((T, T))
    start = rng.standard_normal(T)
    stop = rng.standard_normal(T)
    lengths = np.array([L, 3])
    got = B.viterbi_crf(em, lengths, trans, start, stop)

    import itertools

    for b, n in enumerate(lengths):
        best, best_s = None, -np.inf
        for path in itertools.product(range(T), repeat=int(n)):
            s = start[path[0]] + em[b, 0, path[0]]
            for t in range(1, int(n)):
                s += trans[path[t - 1], path[t]] + em[b, t, path[t]]
            s += stop[path[-1]]
            if s > best_s:
                best_s, best = s, list(path)
        assert got[b] == best


def test_accuracy_on_heldout(trained):
    model, _ = trained
    test = generate_corpus(200, seed=99)
    pred = B.decode_texts(model, [s.text for s in test])
    gold_n = pred_n = hit = 0
    for s, p in zip(test, pred):
        g, q = set(extract_entities(s.tags)), set(extract_entities(p))
        gold_n += len(g)
        pred_n += len(q)
        hit += len(g & q)
    prec, rec = hit / pred_n, hit / gold_n
    assert prec > 0.9 and rec > 0.9


def test_training_deterministic(trained):
    model, vocab = trained
    again = B.fit(generate_corpus(600, seed=42), vocab, epochs=10)
    assert np.array_equal(model.proj, again.proj)
    assert np.array_equal(model.unigram, again.unigram)
    assert np.array_equal(model.trans, again.trans)


def test_batch_composition_independent(trained):
    """Decoding a sentence alone == decoding it padded in a batch with
    longer sentences: the masked BiLSTM must never let pad embeddings
    leak into real-token states (esp. the backward direction)."""
    model, _ = trained
    test = generate_corpus(300, seed=7)
    texts = [s.text for s in test]
    batched = B.decode_texts(model, texts)
    # Decode in small shuffled groups (different pad lengths per group)
    regrouped: dict[int, list[str]] = {}
    order = np.random.RandomState(0).permutation(len(texts))
    for pos, idx in enumerate(order):
        regrouped.setdefault(pos % 17, []).append(idx)
    got = [None] * len(texts)
    for grp in regrouped.values():
        out = B.decode_texts(model, [texts[i] for i in grp])
        for i, tags in zip(grp, out):
            got[i] = tags
    assert got == batched
    # And singleton decode agrees for a sample
    for i in range(0, len(texts), 37):
        assert B.decode_texts(model, [texts[i]])[0] == batched[i]


def test_save_load_roundtrip(trained, tmp_path):
    model, _ = trained
    p = str(tmp_path / "bilstm_crf.npz")
    model.save(p)
    loaded = B.BiLstmCrfModel.load(p)
    texts = ["王伟在华为工作。", "清华大学位于北京。"]
    assert B.decode_texts(model, texts) == B.decode_texts(loaded, texts)


def test_tagger_protocol_in_pipeline(ray_session, trained, tmp_path):
    """BiLstmCrfTagger slots into the same actor-pool position as
    HmmTagger and produces mentions end-to-end."""
    import pyarrow as pa
    import ray.data as rd

    from kgforge.stages.mentions import attach_mentions
    from kgforge.stages.tagger import BiLstmCrfTagger

    model, _ = trained
    p = str(tmp_path / "m.npz")
    model.save(p)
    sents = pa.table({
        "sent_text": pa.array(["王伟在华为工作。", "清华大学位于北京。"],
                              pa.string()),
    })
    out = rd.from_arrow(sents).map_batches(
        BiLstmCrfTagger, fn_constructor_kwargs={"model_path": p},
        batch_format="pyarrow", concurrency=1) \
        .map_batches(attach_mentions, batch_format="pyarrow").take_all()
    ments = [m for r in out for m in r["mentions"]]
    surfaces = {m["surface"] for m in ments}
    assert "华为" in surfaces and "北京" in surfaces


def test_flagship_with_bilstm_tagger(ray_session, trained, tmp_path):
    """The flagship pipeline runs unchanged with the BiLSTM-CRF tagger
    plugged into the actor-pool slot (Tagger protocol, SURVEY §2.10)."""
    from kgforge.oracle.corpus import generate_interleaved_docs
    from kgforge.pipelines.flagship import run_flagship
    from kgforge.sources.interleaved import write_interleaved
    from kgforge.stages.tagger import BiLstmCrfTagger

    model, _ = trained
    mp = str(tmp_path / "bilstm_crf.npz")
    model.save(mp)
    docs = generate_interleaved_docs(60, seed=42)
    t0 = write_interleaved(docs, str(tmp_path / "t0"), rows_per_fragment=20)
    res = run_flagship(t0_path=t0, model_path=mp,
                       ckpt_root=str(tmp_path / "ckpt"),
                       tagger_cls=BiLstmCrfTagger, tagger_concurrency=2)
    assert res["edges"].count() > 0
    assert res["nodes"].count() > 0


def test_distributed_parameter_mixing(ray_session, trained):
    from kgforge.stages.tagger import train_bilstm_distributed

    _, vocab = trained
    train = generate_corpus(600, seed=42)
    m1 = train_bilstm_distributed(train, vocab, shards=4, rounds=4,
                                  epochs_per_round=2)
    # deterministic for a fixed shard count
    m2 = train_bilstm_distributed(train, vocab, shards=4, rounds=4,
                                  epochs_per_round=2)
    assert np.array_equal(m1.proj, m2.proj)
    assert np.array_equal(m1.unigram, m2.unigram)
    assert np.array_equal(m1.trans, m2.trans)

    # quality within noise of the sequential trainer on held-out data
    test = generate_corpus(200, seed=99)
    pred = B.decode_texts(m1, [s.text for s in test])
    gold_n = pred_n = hit = 0
    for s, p in zip(test, pred):
        g, q = set(extract_entities(s.tags)), set(extract_entities(p))
        gold_n += len(g)
        pred_n += len(q)
        hit += len(g & q)
    assert hit / pred_n > 0.9 and hit / gold_n > 0.9
