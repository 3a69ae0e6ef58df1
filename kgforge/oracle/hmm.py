"""HMM sequence tagger: MLE fit with Laplace smoothing + Viterbi decode.

Reference expectation: ``REF?:hmm.py`` — ``fit`` counts initial /
transition / emission statistics over the training corpus; ``viterbi``
decodes in log space (SURVEY.md §2.3 A1/A3).  Smoothing constant
``ALPHA`` recorded in the saved artifact (FIXTURES.md §D) so it can be
re-aligned with the reference's constant per SURVEY §0.1.

Two decoders:

- :func:`viterbi` — single sentence, the semantic definition.
- :func:`viterbi_batch` — padded numpy batch, O(L·T²) vectorized over
  the batch dimension; this is what the Ray actor pool calls per Arrow
  batch.  ``tests/test_hmm.py`` pins batch == single == brute force.
"""

from __future__ import annotations

import numpy as np

from kgforge.oracle.labels import BIO_TAGS
from kgforge.oracle.vocab import UNK_ID

ALPHA = 1.0  # Laplace smoothing (REF?: re-align per SURVEY §0.1)
NEG_INF = -1e30


class HmmModel:
    """log-space parameters: ``pi[T]``, ``a[T,T]``, ``b[T,V]``."""

    def __init__(self, pi: np.ndarray, a: np.ndarray, b: np.ndarray,
                 vocab: dict[str, int], tags: tuple[str, ...] = BIO_TAGS):
        self.pi = pi
        self.a = a
        self.b = b
        self.vocab = vocab
        self.tags = tags

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, pi=self.pi, a=self.a, b=self.b, alpha=np.float64(ALPHA),
            vocab_keys=np.array(list(self.vocab.keys()), dtype=object),
            vocab_vals=np.array(list(self.vocab.values()), dtype=np.int64),
            tags=np.array(list(self.tags), dtype=object),
        )

    @classmethod
    def load(cls, path: str) -> "HmmModel":
        z = np.load(path, allow_pickle=True)
        vocab = dict(zip(z["vocab_keys"].tolist(), z["vocab_vals"].tolist()))
        return cls(z["pi"], z["a"], z["b"], vocab, tuple(z["tags"].tolist()))

    def encode(self, chars: list[str]) -> np.ndarray:
        v = self.vocab
        return np.array([v.get(c, UNK_ID) for c in chars], dtype=np.int64)


def fit_counts(sentences, tag_to_id: dict[str, int], vocab: dict[str, int]
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Raw count arrays (the distributed trainer emits these per batch
    and sums them — SURVEY §2.5 G1; this is the mergeable partial)."""
    T, V = len(tag_to_id), max(vocab.values()) + 1
    pi_c = np.zeros(T)
    a_c = np.zeros((T, T))
    b_c = np.zeros((T, V))
    for s in sentences:
        ids = [tag_to_id[t] for t in s.tags]
        if not ids:
            continue
        pi_c[ids[0]] += 1
        for t0, t1 in zip(ids, ids[1:]):
            a_c[t0, t1] += 1
        for tag_id, ch in zip(ids, s.chars):
            b_c[tag_id, vocab.get(ch, UNK_ID)] += 1
    return pi_c, a_c, b_c


def counts_to_model(pi_c: np.ndarray, a_c: np.ndarray, b_c: np.ndarray,
                    vocab: dict[str, int],
                    tags: tuple[str, ...] = BIO_TAGS) -> HmmModel:
    """Normalize counts with Laplace smoothing → log-prob model."""
    pi = np.log((pi_c + ALPHA) / (pi_c.sum() + ALPHA * len(pi_c)))
    a = np.log((a_c + ALPHA) / (a_c.sum(axis=1, keepdims=True) + ALPHA * a_c.shape[1]))
    b = np.log((b_c + ALPHA) / (b_c.sum(axis=1, keepdims=True) + ALPHA * b_c.shape[1]))
    return HmmModel(pi, a, b, vocab, tags)


def fit(sentences, vocab: dict[str, int],
        tags: tuple[str, ...] = BIO_TAGS) -> HmmModel:
    tag_to_id = {t: i for i, t in enumerate(tags)}
    return counts_to_model(*fit_counts(sentences, tag_to_id, vocab), vocab, tags)


def viterbi(model: HmmModel, obs_ids: np.ndarray) -> np.ndarray:
    """Single-sequence log-space Viterbi; ties broken by lowest tag id
    (numpy argmax convention — deterministic)."""
    L = len(obs_ids)
    if L == 0:
        return np.zeros(0, dtype=np.int64)
    T = len(model.pi)
    delta = model.pi + model.b[:, obs_ids[0]]
    psi = np.zeros((L, T), dtype=np.int64)
    for t in range(1, L):
        scores = delta[:, None] + model.a          # [prev, cur]
        psi[t] = np.argmax(scores, axis=0)
        delta = scores[psi[t], np.arange(T)] + model.b[:, obs_ids[t]]
    path = np.zeros(L, dtype=np.int64)
    path[-1] = int(np.argmax(delta))
    for t in range(L - 1, 0, -1):
        path[t - 1] = psi[t, path[t]]
    return path


def viterbi_batch(model: HmmModel, obs: np.ndarray, lengths: np.ndarray
                  ) -> list[np.ndarray]:
    """Batched Viterbi over a padded id matrix ``obs[B, Lmax]``.

    Vectorized across the batch; per-step work is ``[B, T, T]`` with
    T = 7 tags, so the loop over Lmax dominates at O(Lmax · B · T²).
    Padding positions are ignored via per-sentence length masking.
    """
    B, Lmax = obs.shape
    if B == 0 or Lmax == 0:
        return [np.zeros(0, dtype=np.int64) for _ in range(B)]
    mat = viterbi_batch_padded(model, obs, lengths)
    return [mat[i, :int(lengths[i])].astype(np.int64) for i in range(B)]


def _backtrace_padded(delta: np.ndarray, psi: np.ndarray,
                      lengths: np.ndarray) -> np.ndarray:
    """Vectorized backtrace → padded tag-id matrix [B, Lmax].

    The per-row Python loop was O(total chars) interpreter iterations
    (~100M per 3M sentences); this walks the Lmax axis once with [B]
    gathers per step."""
    B, Lmax, _ = psi.shape
    path = np.zeros((B, Lmax), dtype=np.int64)
    last = np.argmax(delta, axis=1)                       # [B]
    rows = np.arange(B)
    nz = lengths > 0
    path[rows[nz], lengths[nz] - 1] = last[nz]
    cur = last
    for t in range(Lmax - 1, 0, -1):
        upd = lengths > t
        if not upd.any():
            continue
        prev = np.take_along_axis(psi[:, t, :], cur[:, None],
                                  axis=1)[:, 0].astype(np.int64)
        cur = np.where(upd, prev, cur)
        path[upd, t - 1] = prev[upd]
    return path


def viterbi_batch_padded(model: HmmModel, obs: np.ndarray,
                         lengths: np.ndarray) -> np.ndarray:
    """Like :func:`viterbi_batch` but returns the padded [B, Lmax]
    tag-id matrix (no per-row Python objects — the hot-path API)."""
    B, Lmax = obs.shape
    T = len(model.pi)
    if B == 0 or Lmax == 0:
        return np.zeros((B, Lmax), dtype=np.int64)
    delta = model.pi[None, :] + model.b[:, obs[:, 0]].T
    psi = np.zeros((B, Lmax, T), dtype=np.int32)
    for t in range(1, Lmax):
        active = lengths > t
        if not active.any():
            break
        scores = delta[:, :, None] + model.a[None, :, :]
        am = np.argmax(scores, axis=1)
        psi[:, t, :] = am
        new_delta = np.take_along_axis(scores, am[:, None, :], axis=1)[:, 0, :] \
            + model.b[:, obs[:, t]].T
        delta = np.where(active[:, None], new_delta, delta)
    return _backtrace_padded(delta, psi, lengths)


def decode_texts(model: HmmModel, texts: list[str]) -> list[list[str]]:
    """Convenience: raw strings → BIO tag lists via the batch decoder."""
    if not texts:
        return []
    lengths = np.array([len(t) for t in texts], dtype=np.int64)
    Lmax = max(1, int(lengths.max()))
    obs = np.zeros((len(texts), Lmax), dtype=np.int64)
    for i, txt in enumerate(texts):
        if txt:
            obs[i, : len(txt)] = model.encode(list(txt))
    paths = viterbi_batch(model, obs, lengths)
    return [[model.tags[j] for j in p] for p in paths]
