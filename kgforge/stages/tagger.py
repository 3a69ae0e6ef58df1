"""A1/A2: stateful tagger actor-pool stages (SURVEY §2.3).

Callable classes for ``ds.map_batches(Cls, concurrency=N, ...)`` —
model artifacts load ONCE per actor in ``__init__`` (from a path or a
``ray.put`` broadcast ref), per-batch work is the vectorized batched
Viterbi.  This is the ``Tagger`` plugin protocol (SURVEY §2.10): any
class with ``__init__(model source)`` + ``__call__(pa.Table) ->
pa.Table`` slots into the same pipeline position; ``num_gpus`` is a
config knob on the stage, not a code difference (no GPU in sandbox).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgforge.oracle import hmm as hmm_mod


_MODEL_CACHE: dict = {}


def make_hmm_tagger_fn(model_path: str):
    """Stateless task variant of :class:`HmmTagger`: the model loads
    once per worker process from ``model_path`` (module-level cache) and
    the stage FUSES with adjacent task stages — no actor pool to spin
    up.  Right when model state is cheap to load (the HMM ``.npz`` is a
    few hundred KB); use the :class:`HmmTagger` actor-pool form when
    per-worker setup is expensive (BiLSTM weights, GPU transfer)."""

    def tag(batch: pa.Table) -> pa.Table:
        tagger = _MODEL_CACHE.get(model_path)
        if tagger is None:
            tagger = HmmTagger(model_path=model_path)
            _MODEL_CACHE.clear()
            _MODEL_CACHE[model_path] = tagger
        return tagger(batch)

    return tag


class HmmTagger:
    """HMM-Viterbi tagger (``REF?:hmm`` predict path).

    ``model_path``: ``.npz`` artifact on a shared filesystem, or
    ``model_ref``: a ``ray.ObjectRef`` to an :class:`HmmModel` placed
    once with ``ray.put`` (broadcast — read per actor, not per batch).
    """

    TEXT_COL = "sent_text"

    def __init__(self, model_path: str | None = None, model_ref=None):
        if model_ref is not None:
            import ray

            self.model: hmm_mod.HmmModel = ray.get(model_ref)
        elif model_path is not None:
            self.model = hmm_mod.HmmModel.load(model_path)
        else:
            raise ValueError("need model_path or model_ref")
        self.tags = list(self.model.tags)
        # dense codepoint→char-id LUT: per-char Python dict lookups were
        # the encoding hot path (~100M lookups per 1M sentences); BMP
        # table + UNK for astral chars, built once per actor/worker
        from kgforge.oracle.vocab import UNK_ID

        lut = np.full(0x10000, UNK_ID, dtype=np.int64)
        for ch, cid in self.model.vocab.items():
            if len(ch) != 1:          # special tokens (<PAD>/<UNK>)
                continue
            cp = ord(ch)
            if cp < 0x10000:
                lut[cp] = cid
        self._lut = lut

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.TEXT_COL].to_pylist()
        tags_col = self.decode_column(texts)
        if "tags" in batch.column_names:
            batch = batch.drop_columns(["tags"])
        return batch.append_column("tags", tags_col)

    def _encode(self, texts: list[str]):
        """Vectorized encode: one UTF-32 pass over the concatenated
        batch, LUT gather, scatter into the padded matrix."""
        from kgforge.oracle.vocab import UNK_ID

        lengths = np.array([len(t) for t in texts], dtype=np.int64)
        Lmax = max(1, int(lengths.max()) if len(lengths) else 1)
        joined = "".join(texts)
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        ids = np.where(codes < 0x10000,
                       self._lut[np.minimum(codes, 0xFFFF)],
                       UNK_ID)
        obs = np.zeros((len(texts), Lmax), dtype=np.int64)
        row = col = None
        if len(codes):
            offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
            row = np.repeat(np.arange(len(texts)), lengths)
            col = np.arange(len(codes)) - np.repeat(offsets, lengths)
            obs[row, col] = ids
        return obs, lengths, row, col

    def decode_column(self, texts: list[str]) -> pa.Array:
        """Batch decode → ``list<dictionary<int8, string>>`` Arrow
        column built straight from the padded int path matrix — zero
        per-tag Python objects (the previous list-of-str materialized
        ~30 interpreter objects per sentence)."""
        if not texts:
            return pa.array([], type=pa.list_(
                pa.dictionary(pa.int8(), pa.string())))
        obs, lengths, row, col = self._encode(texts)
        mat = hmm_mod.viterbi_batch_padded(self.model, obs, lengths)
        flat = (mat[row, col] if row is not None
                else np.zeros(0, dtype=np.int64))
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        dict_arr = pa.DictionaryArray.from_arrays(
            pa.array(flat.astype(np.int8)),
            pa.array(self.tags, pa.string()))
        return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                        dict_arr)

    def decode(self, texts: list[str]) -> list[list[str]]:
        if not texts:
            return []
        obs, lengths, _, _ = self._encode(texts)
        paths = hmm_mod.viterbi_batch(self.model, obs, lengths)
        tags = self.tags
        return [[tags[j] for j in p] for p in paths]


class BiLstmCrfTagger:
    """A2: BiLSTM-CRF tagger in the same ``Tagger`` protocol slot as
    :class:`HmmTagger` — actor-pool class UDF, model loads once per
    actor in ``__init__`` (this is the expensive-state case the pool
    exists for; on a GPU cluster the stage takes ``num_gpus=φ`` with no
    code change — SURVEY §2.3 A2)."""

    TEXT_COL = "sent_text"

    def __init__(self, model_path: str | None = None, model_ref=None):
        from kgforge.oracle import bilstm_crf as bc

        if model_ref is not None:
            import ray

            self.model = ray.get(model_ref)
        elif model_path is not None:
            self.model = bc.BiLstmCrfModel.load(model_path)
        else:
            raise ValueError("need model_path or model_ref")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from kgforge.oracle import bilstm_crf as bc

        texts = batch[self.TEXT_COL].to_pylist()
        tag_lists = bc.decode_texts(self.model, texts)
        if "tags" in batch.column_names:
            batch = batch.drop_columns(["tags"])
        return batch.append_column(
            "tags", pa.array(tag_lists, type=pa.list_(pa.string())))


class HmmTrainerStage:
    """A3/G1: per-batch HMM count partials (mergeable — summed by the
    caller over all batches, then normalized once on the driver).

    Vectorized (parity-tested against :func:`oracle.hmm.fit_counts`):
    tag ids via dictionary-encode + code remap, char ids via ONE utf-32
    pass over the batch's joined text and the same BMP LUT the tagger
    uses, and all three count tensors as ``np.bincount`` over fused
    (state, next/emission) codes — no per-sentence Python objects."""

    def __init__(self, vocab: dict[str, int], tags: tuple[str, ...]):
        from kgforge.oracle.vocab import UNK_ID

        self.vocab = vocab
        self.tag_to_id = {t: i for i, t in enumerate(tags)}
        self.tags = tags
        self.V = max(vocab.values()) + 1
        lut = np.full(0x10000, UNK_ID, dtype=np.int64)
        for ch, cid in vocab.items():
            if len(ch) == 1 and ord(ch) < 0x10000:
                lut[ord(ch)] = cid
        self._lut = lut
        self._unk = UNK_ID

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        T, V = len(self.tags), self.V
        tags_col = batch["tags"]
        if isinstance(tags_col, pa.ChunkedArray):
            tags_col = tags_col.combine_chunks()
        flat = pc.list_flatten(tags_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(tags_col) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        enc = flat.dictionary_encode()
        dmap = np.array([self.tag_to_id[t]
                         for t in enc.dictionary.to_pylist()], np.int64) \
            if len(enc.dictionary) else np.zeros(0, np.int64)
        codes_idx = enc.indices.to_numpy(zero_copy_only=False)
        tids = dmap[codes_idx] if len(codes_idx) else \
            np.zeros(0, np.int64)

        texts = pc.binary_join(batch["chars"], "").to_pylist()
        cps = np.frombuffer("".join(texts).encode("utf-32-le"),
                            dtype=np.uint32)
        cids = np.where(cps < 0x10000,
                        self._lut[np.minimum(cps, 0xFFFF)], self._unk)

        pi_c = np.zeros(T)
        a_c = np.zeros(T * T)
        b_c = np.zeros(T * V)
        if len(tids):
            starts = np.flatnonzero(np.diff(parents, prepend=-1))
            pi_c += np.bincount(tids[starts], minlength=T)
            same = parents[1:] == parents[:-1]
            a_c += np.bincount(tids[:-1][same] * T + tids[1:][same],
                               minlength=T * T)
            b_c += np.bincount(tids * V + cids, minlength=T * V)
        return pa.table({
            "pi": pa.array([pi_c], type=pa.list_(pa.float64())),
            "a": pa.array([a_c], type=pa.list_(pa.float64())),
            "b": pa.array([b_c], type=pa.list_(pa.float64())),
        })


def train_hmm_distributed(corpus_ds, vocab: dict[str, int],
                          tags: tuple[str, ...]) -> hmm_mod.HmmModel:
    """Distributed HMM fit: map_batches partial counts → driver sum
    (T·T + T·V floats ≪ memory — SURVEY §2.5 G1)."""
    T, V = len(tags), max(vocab.values()) + 1
    partials = corpus_ds.map_batches(
        HmmTrainerStage, fn_constructor_kwargs={"vocab": vocab, "tags": tags},
        batch_format="pyarrow", concurrency=2)
    pi = np.zeros(T)
    a = np.zeros((T, T))
    b = np.zeros((T, V))
    for chunk in partials.iter_batches(batch_format="pyarrow"):
        for row in chunk.to_pylist():
            pi += np.array(row["pi"])
            a += np.array(row["a"]).reshape(T, T)
            b += np.array(row["b"]).reshape(T, V)
    return hmm_mod.counts_to_model(pi, a, b, vocab, tags)


def train_bilstm_distributed(sentences, vocab: dict[str, int],
                             tags=None, shards: int = 4,
                             rounds: int = 3,
                             epochs_per_round: int = 1,
                             seed: int = 42, lr: float = 0.1):
    """Distributed structured-perceptron training by ITERATIVE
    PARAMETER MIXING (McDonald, Hall & Mann, NAACL 2010): the labeled
    corpus is sharded deterministically (sentence index mod
    ``shards``); each round, every shard runs ``epochs_per_round``
    perceptron epochs FROM THE SAME broadcast weights (one Ray task
    per shard, frozen-encoder model rebuilt from the shared seed), and
    the trained parameter vectors are uniformly averaged in shard
    order — so the result is bit-deterministic for a fixed shard
    count (averaging order fixed; each shard's inner loop is the
    sequential trainer's).  Weights-in-flight per round: one
    (proj + bias + unigram + trans + start + stop) tensor set per
    shard — model-sized, never corpus-sized; the corpus itself ships
    once per shard as a ``ray.put`` broadcast.

    Contract note: parameter mixing is NOT the sequential perceptron —
    quality matches within noise (tested ≥ 0.9 P/R on the held-out
    corpus) but weights differ from :func:`kgforge.oracle.bilstm_crf.fit`;
    shard count is part of the reproducibility key."""
    import ray

    from kgforge.oracle import bilstm_crf as B

    tags = tuple(tags) if tags is not None else B.BIO_TAGS
    parts = [[s for i, s in enumerate(sentences) if i % shards == p]
             for p in range(shards)]
    part_refs = [ray.put(p) for p in parts]

    model = B.BiLstmCrfModel(vocab, tags=tags, seed=seed)
    trained = ("proj", "bias", "unigram", "trans", "start", "stop")

    @ray.remote(num_cpus=1)
    def shard_epoch(weights: dict, part_ref_inner) -> dict:
        m = B.BiLstmCrfModel(vocab, tags=tags, seed=seed)
        for k, v in weights.items():
            setattr(m, k, v.copy())
        B.fit_epochs(m, part_ref_inner, epochs=epochs_per_round, lr=lr)
        return {k: getattr(m, k) for k in trained}

    for _ in range(rounds):
        w = {k: getattr(model, k) for k in trained}
        outs = ray.get([shard_epoch.remote(w, ref)
                        for ref in part_refs])
        for k in trained:
            avg = outs[0][k].copy()
            for o in outs[1:]:          # fixed shard order: exact
                avg += o[k]
            setattr(model, k, avg / float(shards))
    return model
