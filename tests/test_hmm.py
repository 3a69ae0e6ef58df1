"""HMM fit + Viterbi pinned against brute-force path enumeration and
batch-vs-single equality (SURVEY §5.2)."""

import itertools

import numpy as np
import pytest

from kgforge.oracle import hmm as H
from kgforge.oracle.corpus import generate_corpus
from kgforge.oracle.labels import BIO_TAGS
from kgforge.oracle.vocab import build_vocab, count_chars


@pytest.fixture(scope="module")
def tiny_model():
    train = generate_corpus(200, seed=42)
    vocab = build_vocab(count_chars(train))
    return H.fit(train, vocab)


def brute_force(model, obs_ids):
    T = len(model.pi)
    best, best_score = None, -np.inf
    for path in itertools.product(range(T), repeat=len(obs_ids)):
        score = model.pi[path[0]] + model.b[path[0], obs_ids[0]]
        for t in range(1, len(path)):
            score += model.a[path[t - 1], path[t]] + model.b[path[t], obs_ids[t]]
        if score > best_score:
            best_score, best = score, path
    return np.array(best), best_score


def test_viterbi_matches_brute_force(tiny_model):
    sents = ["王伟在北大。", "今天很好", "李", "北京大学位于北京。"[:5]]
    for s in sents:
        ids = tiny_model.encode(list(s))
        v = H.viterbi(tiny_model, ids)
        bf, bf_score = brute_force(tiny_model, ids)
        # score equality (argmax path may tie; scores must match)
        def score_of(path):
            sc = tiny_model.pi[path[0]] + tiny_model.b[path[0], ids[0]]
            for t in range(1, len(path)):
                sc += tiny_model.a[path[t - 1], path[t]] + tiny_model.b[path[t], ids[t]]
            return sc
        assert score_of(v) == pytest.approx(bf_score, abs=1e-9)


def test_batch_equals_single(tiny_model):
    texts = ["王伟在清华大学工作。", "今天天气很好。", "李", "",
             "张磊访问了上海。", "中国银行与招商银行达成合作。"]
    lengths = np.array([len(t) for t in texts])
    Lmax = int(lengths.max())
    obs = np.zeros((len(texts), Lmax), dtype=np.int64)
    for i, t in enumerate(texts):
        if t:
            obs[i, : len(t)] = tiny_model.encode(list(t))
    batch_paths = H.viterbi_batch(tiny_model, obs, lengths)
    for i, t in enumerate(texts):
        single = H.viterbi(tiny_model, tiny_model.encode(list(t)))
        assert np.array_equal(batch_paths[i], single), t


def test_decode_reasonable_accuracy(tiny_model):
    test = generate_corpus(200, seed=43)
    pred = H.decode_texts(tiny_model, [s.text for s in test])
    total = hit = 0
    for s, p in zip(test, pred):
        total += len(s.tags)
        hit += sum(a == b for a, b in zip(s.tags, p))
    assert hit / total > 0.9


def test_save_load_roundtrip(tiny_model, tmp_path):
    path = str(tmp_path / "hmm.npz")
    tiny_model.save(path)
    loaded = H.HmmModel.load(path)
    assert np.array_equal(loaded.pi, tiny_model.pi)
    assert np.array_equal(loaded.b, tiny_model.b)
    assert loaded.vocab == tiny_model.vocab
    assert loaded.tags == tuple(BIO_TAGS)


def test_fit_counts_mergeable():
    """Distributed G1: partial counts over shards sum to global counts."""
    train = generate_corpus(100, seed=42)
    vocab = build_vocab(count_chars(train))
    t2i = {t: i for i, t in enumerate(BIO_TAGS)}
    whole = H.fit_counts(train, t2i, vocab)
    a = H.fit_counts(train[:37], t2i, vocab)
    b = H.fit_counts(train[37:], t2i, vocab)
    for w, x, y in zip(whole, a, b):
        assert np.array_equal(w, x + y)
