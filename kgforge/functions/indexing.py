"""Tokenized-corpus operators: context-window chunking, inverted
index, TF-IDF ranking.

Tokenization matches :mod:`kgforge.functions.textstats` (split on
``\\s+``, empty tokens dropped) so every operator here shares one
vocabulary definition with the doc-frequency/decontamination family —
and with the DuckDB oracles (``regexp_extract_all(text, '\\S+')``).

Scale shapes:
- ``chunk_docs_ds`` is a pure map — zero shuffle, chunks stream out
  with ~``chunk/stride``× token duplication (the standard overlap
  cost of context-window packing for LLM training).
- ``inverted_index_ds`` ships distinct (term, doc) pairs once, hash-
  partitioned by term; posting lists are built per partition from one
  vectorized sort + run-offset ``ListArray`` (no per-term Python).
- ``tfidf_topk_ds`` is two keyed shuffles (by term to attach df, by
  doc to rank) — document frequencies are NEVER collected to the
  driver or broadcast, so an open 100-M-term vocabulary costs only
  its share of the term shuffle.  Scores use a LINEAR idf (tf * N/df):
  division is IEEE-correctly-rounded in every engine, so the doubles
  are bit-identical between Ray and the SQL oracle — a log-idf is one
  `pc.ln` away but trades away value-exact verifiability.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgforge.common.hashing import round_away
from kgforge.functions.joins import _part_codes


def _token_lists(batch: pa.Table, text_col: str):
    """flat token array + parent doc indices, empties dropped."""
    toks = pc.split_pattern_regex(pc.fill_null(batch[text_col], ""),
                                  r"\s+")
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    mask = pc.not_equal(flat, "")
    flat, par = flat.filter(mask), par.filter(mask)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if isinstance(par, pa.ChunkedArray):
        par = par.combine_chunks()
    return flat, par


def _excl_cumsum(lens: np.ndarray) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64) \
        if len(lens) else np.zeros(0, dtype=np.int64)


def _segment_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (vectorized)."""
    tot = int(lens.sum())
    if tot == 0:
        return np.zeros(0, dtype=np.int64)
    return np.arange(tot, dtype=np.int64) - np.repeat(_excl_cumsum(lens),
                                                      lens)


def chunk_docs_ds(ds, chunk: int = 64, stride: int = 48,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Split every document into overlapping context windows of
    ``chunk`` tokens starting every ``stride`` tokens (window ``i``
    covers tokens ``[i*stride, min(i*stride+chunk, n))`` for every
    ``i*stride < n``) → (doc_id, chunk_idx, chunk_text, n_tokens).

    Fully vectorized: one regex split per batch, then the chunk
    windows are materialized as a single gather (flat repeat/modulo
    index math) into one ``ListArray`` joined with
    ``pc.binary_join`` — no per-document Python.  Empty documents
    produce no chunks."""
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")

    def per_batch(b: pa.Table) -> pa.Table:
        return chunk_batch(b, chunk, stride, text_col, id_col)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def chunk_batch(b: pa.Table, chunk: int, stride: int,
                text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """The pure per-batch kernel of :func:`chunk_docs_ds` (exposed for
    direct property testing)."""
    flat, par = _token_lists(b, text_col)
    n = b.num_rows
    ntok = np.bincount(par.to_numpy(zero_copy_only=False),
                       minlength=n).astype(np.int64)
    docstart = _excl_cumsum(ntok)
    n_chunks = np.where(ntok > 0, (ntok - 1) // stride + 1, 0)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    cidx = _segment_arange(n_chunks)
    cstart = cidx * stride
    clen = np.minimum(cstart + chunk, ntok[doc_of]) - cstart
    within = _segment_arange(clen)
    gidx = (np.repeat(docstart[doc_of] + cstart, clen) + within)
    offsets = np.concatenate([[0], np.cumsum(clen)]).astype(np.int32)
    la = pa.ListArray.from_arrays(pa.array(offsets),
                                  flat.take(pa.array(gidx)))
    return pa.table({
        id_col: b[id_col].take(pa.array(doc_of)),
        "chunk_idx": pa.array(cidx),
        "chunk_text": pc.binary_join(la, " "),
        "n_tokens": pa.array(clen),
    })


def inverted_index_ds(ds, min_df: int = 2, text_col: str = "text",
                      id_col: str = "doc_id", num_partitions: int = 64):
    """Posting lists: term → (df, comma-joined ascending doc ids).
    Distinct (term, doc) pairs — distinct already per batch since a
    document is one row — are hash-partitioned by term; each partition
    sorts once, cuts term runs, and emits its lists via run-offset
    ``ListArray`` + ``binary_join``.  Only terms with
    ``df >= min_df`` are emitted (singleton terms dominate open
    vocabularies and carry no retrieval signal)."""
    def pairs(b: pa.Table) -> pa.Table:
        flat, par = _token_lists(b, text_col)
        ids = b[id_col].take(par)
        t = pa.table({"term": flat, "doc": ids})
        dd = t.group_by(["term", "doc"], use_threads=False).aggregate([])
        return dd.append_column(
            "__p", pa.array(_part_codes(dd["term"], num_partitions)))

    def build(t: pa.Table) -> pa.Table:
        t = t.sort_by([("term", "ascending"), ("doc", "ascending")])
        codes = t["term"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        if len(codes) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.string())})
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [len(codes)]]))
        keep = lens >= min_df
        docs_str = pc.cast(t["doc"], pa.string()).combine_chunks()
        # ListArray over the sorted doc column, one list per kept term
        offs, vals = [], []
        ko = np.flatnonzero(keep)
        # vectorized gather of kept runs
        g = np.repeat(starts[ko], lens[ko]) + _segment_arange(lens[ko])
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(lens[ko])])
                     .astype(np.int32)),
            docs_str.take(pa.array(g)))
        del offs, vals
        return pa.table({
            "term": t["term"].take(pa.array(starts[ko])),
            "df": pa.array(lens[ko].astype(np.int64)),
            "postings": pc.binary_join(la, ","),
        })

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__p").map_groups(build, batch_format="pyarrow")


def tfidf_topk_ds(ds, k: int = 5, text_col: str = "text",
                  id_col: str = "doc_id", num_partitions: int = 64):
    """Top-``k`` terms per document by ``tf * (N / df)`` (linear idf —
    see module docstring), score rounded away-from-zero to 4 decimals,
    ties broken by term ascending → (doc_id, term, tf, df, score).

    Plan: per-batch (term, doc, tf) partials; partition by TERM — df
    is completed per partition (every row of a term is co-located) and
    attached by segment repeat; partition by DOC — per-doc ranking is
    one vectorized sort + within-run rank mask.  N (total docs) is the
    only driver-side scalar."""
    n_docs = ds.count()

    def pairs(b: pa.Table) -> pa.Table:
        flat, par = _token_lists(b, text_col)
        ids = b[id_col].take(par)
        t = pa.table({"term": flat, "doc": ids,
                      "one": pa.array(np.ones(len(flat), dtype=np.int64))})
        g = t.group_by(["term", "doc"], use_threads=False).aggregate(
            [("one", "sum")])
        g = pa.table({"term": g["term"], "doc": g["doc"],
                      "tf": pc.cast(g["one_sum"], pa.int64())})
        return g.append_column(
            "__p", pa.array(_part_codes(g["term"], num_partitions)))

    def attach_df(t: pa.Table) -> pa.Table:
        t = t.sort_by([("term", "ascending")])
        codes = t["term"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        if len(codes) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc": t["doc"],
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [len(codes)]]))
        df = np.repeat(lens, lens).astype(np.int64)
        out = pa.table({"term": t["term"], "doc": t["doc"],
                        "tf": t["tf"], "df": pa.array(df)})
        return out.append_column(
            "__q", pa.array(_part_codes(out["doc"], num_partitions)))

    def rank(t: pa.Table) -> pa.Table:
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        df = t["df"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        score = tf * (float(n_docs) / df)
        t = t.append_column("__s", pa.array(score))
        t = t.sort_by([("doc", "ascending"), ("__s", "descending"),
                       ("term", "ascending")])
        dcol = t["doc"].combine_chunks()
        codes = dcol.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        if len(codes) == 0:
            keep = np.zeros(0, dtype=bool)
        else:
            starts = np.concatenate(
                [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
            lens = np.diff(np.concatenate([starts, [len(codes)]]))
            keep = _segment_arange(lens) < k
        kept = t.filter(pa.array(keep))
        sc = kept["__s"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: kept["doc"], "term": kept["term"], "tf": kept["tf"],
            "df": kept["df"],
            "score": pa.array(round_away(sc, 4)),
        })

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__p").map_groups(attach_df, batch_format="pyarrow") \
        .groupby("__q").map_groups(rank, batch_format="pyarrow")


def bigram_topk_ds(ds, k: int = 25, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Top-``k`` adjacent token pairs corpus-wide (the n-gram LM /
    collocation base table) → (bigram, n), n desc then bigram asc.
    Shape mirrors ``textstats.doc_frequency_ds``: per-batch partial
    counts (arrow ``group_by``) so the global shuffle carries bigram
    partials, never tokens."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        flat, par = _token_lists(b, text_col)
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pv = par.to_numpy(zero_copy_only=False)
        adj = pv[1:] == pv[:-1]
        w1 = flat.slice(0, len(flat) - 1).filter(pa.array(adj))
        w2 = flat.slice(1).filter(pa.array(adj))
        big = pc.binary_join_element_wise(w1, w2, " ")
        t = pa.table({"bigram": big})
        col = t["bigram"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = col.value_counts()
        return pa.table({"bigram": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n"))
    return counts.sort(["n", "bigram"], descending=[True, False]).limit(k)
