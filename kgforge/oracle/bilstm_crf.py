"""NumPy BiLSTM-CRF tagger (SURVEY §2.3 A2; ``REF?:bilstm_crf`` —
reference's PyTorch model re-expressed forward-only in numpy, since no
torch ships in this sandbox, SURVEY §0.3).

Architecture at inference (faithful to the reference family):
char embedding → BiLSTM → linear projection → CRF Viterbi decode.

Training (deterministic, seconds): the embedding + BiLSTM weights are
FIXED seeded random (echo-state / reservoir style — the recurrent
encoder provides contextual features), and the projection + CRF
transition scores are fit with the structured perceptron (collins
2002): decode with current weights, update on the score difference
between gold and predicted paths.  This keeps training bit-exact
reproducible with no autograd while exercising the exact inference
stack the reference uses.  Conformance does NOT depend on this model —
the HMM is the conformance-critical tagger (SURVEY §2.3 note); this is
the architecture-completeness member of the ``Tagger`` protocol.
"""

from __future__ import annotations

import numpy as np

from kgforge.oracle.labels import BIO_TAGS
from kgforge.oracle.vocab import UNK_ID


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


class BiLstmCrfModel:
    """Weights + vocab; save/load via npz (same artifact story as HMM)."""

    def __init__(self, vocab: dict[str, int], tags=BIO_TAGS,
                 emb_dim: int = 24, hidden: int = 32, seed: int = 42):
        self.vocab = vocab
        self.tags = tuple(tags)
        rng = np.random.RandomState(seed)
        V = max(vocab.values()) + 1
        T = len(self.tags)
        d, h = emb_dim, hidden
        s = 1.0 / np.sqrt(d + h)
        self.emb = rng.standard_normal((V, d)) * 0.5
        # one weight matrix per direction: input [d+h] → gates [4h]
        self.w_f = rng.standard_normal((d + h, 4 * h)) * s
        self.b_f = np.zeros(4 * h)
        self.w_b = rng.standard_normal((d + h, 4 * h)) * s
        self.b_b = np.zeros(4 * h)
        self.b_f[h:2 * h] = 1.0        # forget-gate bias 1 (standard)
        self.b_b[h:2 * h] = 1.0
        # trained parameters (structured perceptron)
        self.proj = np.zeros((2 * h, T))
        self.bias = np.zeros(T)
        self.unigram = np.zeros((V, T))   # char-identity emission feature
        self.trans = np.zeros((T, T))
        self.start = np.zeros(T)
        self.stop = np.zeros(T)
        self.d, self.h, self.T = d, h, T

    # ---- persistence ----------------------------------------------------

    def save(self, path: str) -> None:
        chars = list(self.vocab.keys())
        ids = np.array([self.vocab[c] for c in chars], dtype=np.int64)
        np.savez_compressed(
            path, emb=self.emb, w_f=self.w_f, b_f=self.b_f, w_b=self.w_b,
            b_b=self.b_b, proj=self.proj, bias=self.bias,
            unigram=self.unigram, trans=self.trans,
            start=self.start, stop=self.stop,
            vocab_chars=np.array(chars, dtype=object), vocab_ids=ids,
            tags=np.array(list(self.tags), dtype=object))

    @classmethod
    def load(cls, path: str) -> "BiLstmCrfModel":
        z = np.load(path, allow_pickle=True)
        vocab = {c: int(i) for c, i in zip(z["vocab_chars"], z["vocab_ids"])}
        m = cls.__new__(cls)
        m.vocab = vocab
        m.tags = tuple(z["tags"])
        for k in ("emb", "w_f", "b_f", "w_b", "b_b", "proj", "bias",
                  "unigram", "trans", "start", "stop"):
            setattr(m, k, z[k])
        m.d = m.emb.shape[1]
        m.h = m.w_f.shape[1] // 4
        m.T = len(m.tags)
        return m

    # ---- encoder --------------------------------------------------------

    def _lstm_dir(self, x: np.ndarray, w: np.ndarray, b: np.ndarray,
                  reverse: bool, lengths: np.ndarray | None = None
                  ) -> np.ndarray:
        """x: [B, L, d] → h-sequence [B, L, h] (one direction).

        ``lengths`` masks padding: state (ht, ct) is frozen at positions
        >= a row's true length, so the backward recurrence effectively
        starts at each row's true last index and real tokens never see
        pad embeddings — decoding is batch-composition independent
        (packed/masked LSTM semantics)."""
        B, L, d = x.shape
        h = self.h
        hs = np.zeros((B, L, h))
        ht = np.zeros((B, h))
        ct = np.zeros((B, h))
        steps = range(L - 1, -1, -1) if reverse else range(L)
        for t in steps:
            z = np.concatenate([x[:, t, :], ht], axis=1) @ w + b
            i = _sigmoid(z[:, :h])
            f = _sigmoid(z[:, h:2 * h])
            g = np.tanh(z[:, 2 * h:3 * h])
            o = _sigmoid(z[:, 3 * h:])
            nct = f * ct + i * g
            nht = o * np.tanh(nct)
            if lengths is not None:
                active = (lengths > t)[:, None]
                ct = np.where(active, nct, ct)
                ht = np.where(active, nht, ht)
            else:
                ct, ht = nct, nht
            hs[:, t, :] = ht
        return hs

    def encode(self, obs: np.ndarray,
               lengths: np.ndarray | None = None) -> np.ndarray:
        """obs: [B, L] char ids → contextual features [B, L, 2h]."""
        x = self.emb[obs]
        fwd = self._lstm_dir(x, self.w_f, self.b_f, reverse=False,
                             lengths=lengths)
        bwd = self._lstm_dir(x, self.w_b, self.b_b, reverse=True,
                             lengths=lengths)
        return np.concatenate([fwd, bwd], axis=2)

    def emissions(self, obs: np.ndarray,
                  lengths: np.ndarray | None = None) -> np.ndarray:
        return (self.encode(obs, lengths) @ self.proj + self.bias
                + self.unigram[obs])


def viterbi_crf(emissions: np.ndarray, lengths: np.ndarray,
                trans: np.ndarray, start: np.ndarray, stop: np.ndarray
                ) -> list[list[int]]:
    """Batched CRF Viterbi over padded emissions [B, L, T]: vectorized
    over the batch at every timestep; rows freeze (stop updating) once
    past their true length, so their delta holds the step-(n-1) value."""
    B, L, T = emissions.shape
    delta = start[None, :] + emissions[:, 0, :]           # [B, T]
    back = np.zeros((B, L, T), dtype=np.int64)
    for t in range(1, L):
        cand = delta[:, :, None] + trans[None, :, :]      # [B, prev, cur]
        bk = cand.argmax(axis=1)                          # [B, T]
        nd = cand.max(axis=1) + emissions[:, t, :]
        back[:, t, :] = bk
        active = lengths > t
        delta = np.where(active[:, None], nd, delta)
    final = delta + stop[None, :]
    paths: list[list[int]] = []
    for b in range(B):
        n = int(lengths[b])
        if n == 0:
            paths.append([])
            continue
        last = int(final[b].argmax())
        out = [last]
        for t in range(n - 1, 0, -1):
            last = int(back[b, t, last])
            out.append(last)
        paths.append(out[::-1])
    return paths


def _path_score_feats(hs: np.ndarray, path: list[int], T: int):
    """Feature extraction for the perceptron: projection counts
    (sum of h_t per tag), transition counts, start/stop indicators."""
    n = len(path)
    proj_feat = np.zeros((hs.shape[1], T))
    trans_feat = np.zeros((T, T))
    bias_feat = np.zeros(T)
    start_feat = np.zeros(T)
    stop_feat = np.zeros(T)
    for t, y in enumerate(path):
        proj_feat[:, y] += hs[t]
        bias_feat[y] += 1
        if t > 0:
            trans_feat[path[t - 1], y] += 1
    start_feat[path[0]] += 1
    stop_feat[path[-1]] += 1
    return proj_feat, bias_feat, trans_feat, start_feat, stop_feat


def fit(sentences, vocab: dict[str, int], tags=BIO_TAGS,
        epochs: int = 5, seed: int = 42, lr: float = 0.1
        ) -> BiLstmCrfModel:
    """Structured-perceptron training of proj/bias/trans/start/stop on
    top of the fixed seeded BiLSTM encoder.  Deterministic: fixed
    iteration order, no shuffling, integer-free of wall clock."""
    model = BiLstmCrfModel(vocab, tags=tags, seed=seed)
    fit_epochs(model, sentences, epochs=epochs, lr=lr)
    return model


def fit_epochs(model: BiLstmCrfModel, sentences, epochs: int = 1,
               lr: float = 0.1) -> int:
    """Run ``epochs`` perceptron epochs over ``sentences``, updating
    ``model`` IN PLACE from its current weights (the resumable /
    parameter-mixing building block).  Returns the last epoch's
    mistake count.  Same determinism contract as :func:`fit`."""
    vocab = model.vocab
    tag_to_id = {t: i for i, t in enumerate(model.tags)}
    T = model.T
    # pre-encode every sentence once (encoder is frozen)
    encoded: list[tuple[np.ndarray, np.ndarray, list[int]]] = []
    for s in sentences:
        if not s.chars:
            continue
        ids = np.array([vocab.get(c, UNK_ID) for c in s.chars])
        hs = model.encode(ids[None, :])[0]           # [L, 2h]
        encoded.append((hs, ids, [tag_to_id[t] for t in s.tags]))

    n_wrong = 0
    for _ in range(epochs):
        n_wrong = 0
        for hs, ids, gold in encoded:
            em = (hs @ model.proj + model.bias +
                  model.unigram[ids])[None, :, :]
            pred = viterbi_crf(em, np.array([hs.shape[0]]),
                               model.trans, model.start, model.stop)[0]
            if pred == gold:
                continue
            n_wrong += 1
            gp, gb, gt, gs, ge = _path_score_feats(hs, gold, T)
            pp, pb, pt, ps, pe = _path_score_feats(hs, pred, T)
            model.proj += lr * (gp - pp)
            model.bias += lr * (gb - pb)
            model.trans += lr * (gt - pt)
            model.start += lr * (gs - ps)
            model.stop += lr * (ge - pe)
            for t, (yg, yp) in enumerate(zip(gold, pred)):
                if yg != yp:
                    model.unigram[ids[t], yg] += lr
                    model.unigram[ids[t], yp] -= lr
        if n_wrong == 0:
            break
    return n_wrong


def decode_texts(model: BiLstmCrfModel, texts: list[str]
                 ) -> list[list[str]]:
    """Batch decode: pad to max length, encode once, CRF Viterbi."""
    if not texts:
        return []
    lengths = np.array([len(t) for t in texts], dtype=np.int64)
    Lmax = max(1, int(lengths.max()))
    obs = np.zeros((len(texts), Lmax), dtype=np.int64)
    for i, t in enumerate(texts):
        if t:
            obs[i, :len(t)] = [model.vocab.get(c, UNK_ID) for c in t]
    em = model.emissions(obs, lengths)
    paths = viterbi_crf(em, lengths, model.trans, model.start, model.stop)
    return [[model.tags[j] for j in p] for p in paths]
