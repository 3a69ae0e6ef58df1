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

def term_search_ds(ds, terms, k: int = 20, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Conjunctive full-scan search: the top-``k`` documents containing
    ALL query terms, ranked by total query-term frequency (int64 —
    value-exact), ties by ascending id.  Pure map + partial-top-k: the
    tiny query-term set rides inside the UDF, per-batch scoring is one
    ``pc.is_in`` + two arrow group_bys, and the global sort sees at
    most k rows per block.  (The indexed path for repeated queries is
    :func:`inverted_index_ds`; a one-shot conjunctive query is cheaper
    as a scan than as an index build.)"""
    tset = pa.array(sorted(set(terms)), pa.string())
    nterms = len(tset)

    def score(b: pa.Table) -> pa.Table:
        flat, par = _token_lists(b, text_col)
        mask = pc.is_in(flat, value_set=tset)
        t = pa.table({"d": par.filter(mask), "term": flat.filter(mask)})
        g = t.group_by(["d", "term"], use_threads=False).aggregate(
            [([], "count_all")])
        g2 = g.group_by(["d"], use_threads=False).aggregate(
            [("count_all", "sum"), ("term", "count")])
        g2 = g2.filter(pc.equal(g2["term_count"], nterms))
        return pa.table({
            id_col: b[id_col].take(g2["d"]),
            "score": pc.cast(g2["count_all_sum"], pa.int64()),
        })

    def partial_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        idx = pc.sort_indices(b, sort_keys=[("score", "descending"),
                                            (id_col, "ascending")])
        return b.take(idx.slice(0, k))

    return ds.map_batches(score, batch_format="pyarrow") \
        .map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["score", id_col], descending=[True, False]).limit(k)


def pmi_topk_ds(ds, k: int = 25, min_count: int = 5,
                text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 64):
    """Top-``k`` collocations by LIFT — ``n_ab * T / (n_a * n_b)``,
    the exp of PMI — over adjacent token pairs with support
    ``n_ab >= min_count``.  Monotone in PMI, but needs no log: every
    arithmetic step (int64→double casts, one multiply chain, one
    divide) is IEEE correctly-rounded and executed in the same order
    as the SQL twin, so the doubles are bit-identical (same contract
    as ``tfidf_topk_ds``'s linear idf).

    Scale shape — two keyed shuffles, mirroring ``tfidf_topk_ds``:
    per-batch bigram AND unigram count partials; cogroup by ``w1``
    completes both counts per partition (hash co-location) and
    attaches ``n_a``; cogroup by ``w2`` attaches ``n_b``.  The
    vocabulary is never collected or broadcast; ``T`` (total tokens)
    is the one driver scalar, a sum over unigram partials."""
    from kgforge.functions.joins import cogroup_partition_ds

    def uni_partial(b: pa.Table) -> pa.Table:
        flat, _ = _token_lists(b, text_col)
        vc = flat.value_counts()
        return pa.table({"term": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    def bi_partial(b: pa.Table) -> pa.Table:
        flat, par = _token_lists(b, text_col)
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n_ab": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        pv = par.to_numpy(zero_copy_only=False)
        adj = pa.array(pv[1:] == pv[:-1])
        t = pa.table({"w1": flat.slice(0, len(flat) - 1).filter(adj),
                      "w2": flat.slice(1).filter(adj)})
        g = t.group_by(["w1", "w2"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"w1": g["w1"], "w2": g["w2"],
                         "n_ab": pc.cast(g["count_all"], pa.int64())})

    uni = ds.map_batches(uni_partial, batch_format="pyarrow") \
        .materialize()                      # reused 3×: w1, w2, T
    bi = ds.map_batches(bi_partial, batch_format="pyarrow")
    total = int(uni.sum("n") or 0)

    def attach(side_key: str, out_key: str, carry: list[str],
               agg_left: bool):
        def per_partition(t: pa.Table, starts, nl, nr) -> pa.Table:
            n_right = pc.fill_null(t["n"], 0).combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            cs = np.concatenate([[0], np.cumsum(n_right)])
            ends = starts + nl + nr
            per_key = cs[ends] - cs[starts]       # right-run sums
            lrows = np.repeat(starts, nl) + _segment_arange(nl)
            key_of = np.repeat(np.arange(len(starts)), nl)
            li = pa.array(lrows)
            cols = {side_key: t["__k"].take(li)}
            for c in carry:
                cols[c] = t[c].take(li)
            cols[out_key] = pa.array(per_key[key_of])
            lt = pa.table(cols)
            if agg_left:
                # bigram partials: complete the (w1, w2) sum here —
                # hash co-location by w1 makes the partition-sum exact
                g = lt.group_by([side_key, "w2"], use_threads=False) \
                    .aggregate([("n_ab", "sum"), (out_key, "max")])
                return pa.table({side_key: g[side_key], "w2": g["w2"],
                                 "n_ab": pc.cast(g["n_ab_sum"],
                                                 pa.int64()),
                                 out_key: pc.cast(g[f"{out_key}_max"],
                                                  pa.int64())})
            return lt
        return per_partition

    # schema hints: s1 is itself a cogroup — a schema() probe on it
    # would execute the whole first exchange once extra
    sch_uni = pa.schema([("term", pa.string()), ("n", pa.int64())])
    s1 = cogroup_partition_ds(bi, uni, "w1", "term",
                              attach("w1", "n_a", ["w2", "n_ab"], True),
                              ["w2", "n_ab"], ["n"],
                              num_partitions=num_partitions,
                              left_schema=pa.schema(
                                  [("w1", pa.string()),
                                   ("w2", pa.string()),
                                   ("n_ab", pa.int64())]),
                              right_schema=sch_uni)
    s2 = cogroup_partition_ds(s1, uni, "w2", "term",
                              attach("w2", "n_b", ["w1", "n_ab", "n_a"],
                                     False),
                              ["w1", "n_ab", "n_a"], ["n"],
                              num_partitions=num_partitions,
                              left_schema=pa.schema(
                                  [("w1", pa.string()),
                                   ("w2", pa.string()),
                                   ("n_ab", pa.int64()),
                                   ("n_a", pa.int64())]),
                              right_schema=sch_uni)

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["n_ab"], min_count))
        n_ab = b["n_ab"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n_a = pc.fill_null(b["n_a"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        n_b = pc.fill_null(b["n_b"], 0).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        lift = round_away((n_ab * np.float64(total)) / (n_a * n_b), 4)
        out = pa.table({
            "w1": b["w1"], "w2": b["w2"],
            "n_ab": pc.cast(b["n_ab"], pa.int64()),
            "n_a": pc.cast(pc.fill_null(b["n_a"], 0), pa.int64()),
            "n_b": pc.cast(pc.fill_null(b["n_b"], 0), pa.int64()),
            "lift": pa.array(lift),
        })
        if out.num_rows <= k:
            return out
        idx = pc.sort_indices(out, sort_keys=[("lift", "descending"),
                                              ("w1", "ascending"),
                                              ("w2", "ascending")])
        return out.take(idx.slice(0, k))

    return s2.map_batches(finish, batch_format="pyarrow") \
        .sort(["lift", "w1", "w2"], descending=[True, False, False]) \
        .limit(k)

def pack_chunks_ds(chunks_ds, capacity: int = 512,
                   id_col: str = "doc_id", idx_col: str = "chunk_idx",
                   tok_col: str = "n_tokens", num_partitions: int = 64):
    """Sequence packing for LLM training: assign every context chunk a
    training BIN of ``capacity`` tokens by OFFSET PACKING — chunks are
    laid on a token line in content-hash order (md5-u64 of
    ``doc#chunk``, a fixed pseudo-random permutation shared verbatim
    with the SQL twin) and ``bin = token_offset // capacity``,
    ``bin_offset = token_offset % capacity``.  Deterministic,
    layout-invariant, and exact — unlike first-fit-decreasing, whose
    greedy state is inherently sequential and partitioning-dependent.

    Scale shape (same as ``sampling.weighted_sample_ds``): partitions
    are the TOP hash bits so hash order ≡ (partition, local) order;
    one pass collects per-partition token sums (P rows to the driver),
    a prefix over that tiny table gives each partition its global
    offset, and the bin labels are a partition-local cumsum.  The
    chunk stream itself never shuffles."""
    from kgforge.common.hashing import md5_u64_arr

    shift = np.uint64(64 - int(np.log2(num_partitions)))
    if 1 << (64 - int(shift)) != num_partitions:
        raise ValueError("num_partitions must be a power of two")

    def compact(b: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pc.cast(b[id_col], pa.string()), "#",
            pc.cast(b[idx_col], pa.string()), "")
        h = md5_u64_arr(keys)
        return pa.table({
            id_col: b[id_col], idx_col: b[idx_col],
            "__w": pa.array(b[tok_col].combine_chunks()
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "__h": pa.array(h, pa.uint64()),
            "__p": pa.array((h >> shift).astype(np.int32))})

    base = chunks_ds.map_batches(compact,
                                 batch_format="pyarrow").materialize()

    def psum(b: pa.Table) -> pa.Table:
        g = b.group_by(["__p"], use_threads=False).aggregate(
            [("__w", "sum")])
        return pa.table({"__p": g["__p"], "s": g["__w_sum"]})

    parts = base.map_batches(psum, batch_format="pyarrow").to_pandas()
    sums = np.zeros(num_partitions, dtype=np.int64)
    if len(parts):
        agg = parts.groupby("__p")["s"].sum()
        sums[agg.index.to_numpy()] = agg.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])

    def label(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("__h", "ascending"),
                                            (id_col, "ascending"),
                                            (idx_col, "ascending")])
        t = t.take(idx)
        w = t["__w"].combine_chunks().to_numpy(zero_copy_only=False)
        off = int(offsets[int(t["__p"][0].as_py())]) if t.num_rows else 0
        start = np.cumsum(w) - w + off          # exclusive prefix sum
        return pa.table({
            id_col: t[id_col], idx_col: t[idx_col],
            tok_col: pa.array(w),
            "bin": pa.array(start // capacity),
            "bin_offset": pa.array(start % capacity),
        })

    return base.groupby("__p").map_groups(label, batch_format="pyarrow")


def doc_rarity_ds(ds, text_col: str = "text", id_col: str = "doc_id",
                  num_partitions: int = 64):
    """Token-rarity quality scores per document — the CCNet-style
    "is this doc made of common or rare tokens" filter signal, made
    hash-exact: for each document, the corpus-wide occurrence count of
    its tokens aggregated as ``n_tokens`` (occurrences), ``sum_ct``
    (Σ per-token corpus count over occurrences), ``min_ct`` (rarest
    token's count) and ``mean_ct`` (= sum_ct / n_tokens, ONE exact-int
    division → bit-identical double in both engines).  A perplexity
    scorer swaps the count for a log-prob; counts keep the driver
    value-hash exact, log-sums would drift per summation order.

    Plan (tfidf shape): per-batch (term, doc, tf) partials → partition
    by TERM (each term's corpus count completes locally, attached by
    segment repeat) → partition by DOC (per-doc sums are segment
    reductions).  The corpus never shuffles — only (term, doc, tf)
    partials and per-term counts do; no vocabulary broadcast or driver
    collection at any point."""
    from kgforge.functions.joins import _part_codes

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

    def attach_ct(t: pa.Table) -> pa.Table:
        t = t.sort_by([("term", "ascending")])
        codes = t["term"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(codes) == 0:
            out = pa.table({"doc": t["doc"],
                            "tf": pa.array([], pa.int64()),
                            "ct": pa.array([], pa.int64())})
        else:
            starts = np.concatenate(
                [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
            lens = np.diff(np.concatenate([starts, [len(codes)]]))
            ct = np.repeat(np.add.reduceat(tf, starts), lens)
            out = pa.table({"doc": t["doc"], "tf": t["tf"],
                            "ct": pa.array(ct.astype(np.int64))})
        return out.append_column(
            "__q", pa.array(_part_codes(out["doc"], num_partitions)))

    def per_doc(t: pa.Table) -> pa.Table:
        t = t.sort_by([("doc", "ascending")])
        codes = t["doc"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False)
        ct = t["ct"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(codes) == 0:
            return pa.table({id_col: t["doc"],
                             "n_tokens": pa.array([], pa.int64()),
                             "sum_ct": pa.array([], pa.int64()),
                             "min_ct": pa.array([], pa.int64()),
                             "mean_ct": pa.array([], pa.float64())})
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
        n_tok = np.add.reduceat(tf, starts)
        sum_ct = np.add.reduceat(tf * ct, starts)
        min_ct = np.minimum.reduceat(ct, starts)
        return pa.table({
            id_col: t["doc"].take(pa.array(starts)),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "sum_ct": pa.array(sum_ct.astype(np.int64)),
            "min_ct": pa.array(min_ct.astype(np.int64)),
            "mean_ct": pa.array(sum_ct.astype(np.float64)
                                / n_tok.astype(np.float64)),
        })

    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__p").map_groups(attach_ct, batch_format="pyarrow") \
        .groupby("__q").map_groups(per_doc, batch_format="pyarrow")


def next_token_topk_ds(ds, k: int = 3, text_col: str = "text",
                       num_partitions: int = 64):
    """Bigram language-model table: for every previous token, the
    top-``k`` next tokens by corpus count (ties → next ascending) →
    (prev, next, n).  The autocomplete / LM-smoothing base table.

    Scale shape: per-batch (prev, next, count) partials (one arrow
    ``group_by`` per batch — tokens never leave the batch), ONE
    exchange keyed by PREV-hash partition (each prev's candidates
    co-locate), then the per-partition cut is one vectorized sort +
    within-run rank mask over all prevs at once — the tfidf ranking
    altitude, no per-key Python, no global sort."""
    from kgforge.functions.joins import _part_codes

    def partial(b: pa.Table) -> pa.Table:
        flat, par = _token_lists(b, text_col)
        empty = pa.table({"prev": pa.array([], pa.string()),
                          "next": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "__p": pa.array([], pa.int32())})
        if len(flat) < 2:
            return empty
        pv = par.to_numpy(zero_copy_only=False)
        adj = pv[1:] == pv[:-1]
        w1 = flat.slice(0, len(flat) - 1).filter(pa.array(adj))
        w2 = flat.slice(1).filter(pa.array(adj))
        g = pa.table({"prev": w1, "next": w2}) \
            .group_by(["prev", "next"], use_threads=False) \
            .aggregate([([], "count_all")])
        g = pa.table({"prev": g["prev"], "next": g["next"],
                      "n": pc.cast(g["count_all"], pa.int64())})
        return g.append_column(
            "__p", pa.array(_part_codes(g["prev"], num_partitions)))

    def rank(t: pa.Table) -> pa.Table:
        t = t.select(["prev", "next", "n"]).group_by(
            ["prev", "next"], use_threads=False).aggregate([("n", "sum")])
        t = pa.table({"prev": t["prev"], "next": t["next"],
                      "n": pc.cast(t["n_sum"], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("prev", "ascending"),
                                            ("n", "descending"),
                                            ("next", "ascending")])
        t = t.take(idx)
        codes = t["prev"].combine_chunks().dictionary_encode().indices \
            .to_numpy(zero_copy_only=False)
        if len(codes) == 0:
            return t
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1])
        lens = np.diff(np.concatenate([starts, [len(codes)]]))
        keep = _segment_arange(lens) < k
        return t.filter(pa.array(keep))

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__p").map_groups(rank, batch_format="pyarrow")


def source_similarity_ds(ds, text_col: str = "text",
                         by: str = "source",
                         num_partitions: int = 32):
    """Corpus-similarity moments between sources: for every source
    pair (src_a < src_b) the EXACT integer dot product of their
    term-frequency vectors plus both squared norms —
    ``(src_a, src_b, dot, na2, nb2)``.  The consumer derives cosine
    from the three integers; an engine-side sqrt would risk the
    value hash (float ulp), so none is taken.

    Plan: per-batch (source, term, count) partials → one
    (source, term) groupby; dot products form in TERM-hash
    partitions (each term's full row set is co-located, runs are
    bounded by the number of sources, pairwise products vectorized
    per run and pre-summed per pair in-partition) → a tiny final
    pair groupby; norms are one more source-keyed reduce.  Shuffle
    volume is the (source, term) TF table — the corpus never moves.
    Assumes the source column is low-cardinality (pair count grows
    as sources²)."""
    from ray.data.aggregate import Sum

    def tf_partial(batch: pa.Table) -> pa.Table:
        flat, par = _token_lists(batch, text_col)
        if len(flat) == 0:
            return pa.table({by: pa.array([], pa.string()),
                             "w": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        t = pa.table({by: batch[by].take(par), "w": flat})
        g = t.group_by([by, "w"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({by: g[by], "w": g["w"],
                         "c": pc.cast(g["count_all"], pa.int64())})

    tf = ds.select_columns([by, text_col]) \
        .map_batches(tf_partial, batch_format="pyarrow") \
        .groupby([by, "w"]).aggregate(Sum("c", alias_name="c")) \
        .materialize()

    def tag_term(b: pa.Table) -> pa.Table:
        return b.append_column("__p", pa.array(
            _part_codes(b["w"], num_partitions)))

    def pair_partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"src_a": pa.array([], pa.string()),
                          "src_b": pa.array([], pa.string()),
                          "dot": pa.array([], pa.int64())})
        t = t.sort_by([("w", "ascending"), (by, "ascending")])
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(w) == 0:
            return empty
        s = t[by].combine_chunks()
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = np.concatenate(
            [[0], np.flatnonzero(w[1:] != w[:-1]) + 1])
        runlen = np.diff(np.concatenate([starts, [len(w)]]))
        outs = []
        for k in np.unique(runlen):
            if k < 2:
                continue
            runs = starts[runlen == k]
            idx = runs[:, None] + np.arange(k)[None, :]
            ii, jj = np.triu_indices(int(k), 1)
            outs.append((idx[:, ii].ravel(), idx[:, jj].ravel()))
        if not outs:
            return empty
        ai = np.concatenate([o[0] for o in outs])
        bi = np.concatenate([o[1] for o in outs])
        part = pa.table({"src_a": s.take(pa.array(ai)),
                         "src_b": s.take(pa.array(bi)),
                         "dot": pa.array(c[ai] * c[bi])})
        g = part.group_by(["src_a", "src_b"], use_threads=False) \
            .aggregate([("dot", "sum")])
        return pa.table({"src_a": g["src_a"], "src_b": g["src_b"],
                         "dot": g["dot_sum"]})

    dots = tf.map_batches(tag_term, batch_format="pyarrow") \
        .groupby("__p").map_groups(pair_partials,
                                   batch_format="pyarrow") \
        .groupby(["src_a", "src_b"]) \
        .aggregate(Sum("dot", alias_name="dot"))

    def norm_partial(b: pa.Table) -> pa.Table:
        c = b["c"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = pa.table({by: b[by], "n2": pa.array(c * c)})
        g = t.group_by([by], use_threads=False).aggregate(
            [("n2", "sum")])
        return pa.table({by: g[by], "n2": g["n2_sum"]})

    norms = {r[by]: r["n2"] for r in
             tf.map_batches(norm_partial, batch_format="pyarrow")
             .groupby(by).aggregate(Sum("n2", alias_name="n2"))
             .take_all()}                       # sources-bounded

    def attach_norms(b: pa.Table) -> pa.Table:
        na = [norms[x] for x in b["src_a"].to_pylist()]
        nb = [norms[x] for x in b["src_b"].to_pylist()]
        return pa.table({
            "src_a": b["src_a"], "src_b": b["src_b"], "dot": b["dot"],
            "na2": pa.array(na, pa.int64()),
            "nb2": pa.array(nb, pa.int64())})

    return dots.map_batches(attach_norms, batch_format="pyarrow")


def bm25_topk_ds(ds, terms, n_docs: int, sum_dl: int,
                 k1: float = 1.2, b: float = 0.75, k: int = 20,
                 text_col: str = "text", id_col: str = "doc_id",
                 dl_col: str = "n_chars"):
    """Okapi BM25 top-``k`` documents for a fixed query-term set:
    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)`` (the Lucene
    non-negative variant) and doc length ``dl`` taken from the
    ``dl_col`` column (chars), so the oracle needs no second
    tokenization pass.  Returns ``(doc_id, score, n_terms)`` — the
    top-``k`` by (score rounded to 4, doc_id asc).

    Determinism contract with the SQL twin: terms are summed in FIXED
    slot order (lexicographic), missing terms add exactly ``0.0``, and
    every double derives from exact integers (tf, df, N, Σdl) through
    an identically-ordered formula — bit-identical scores, so the
    top-``k`` cut agrees.

    Scale plan: one tokenize+filter pass emits only matched-doc rows
    (fixed tf slots, ≤ |terms| ints per doc — the corpus text never
    leaves the scan); the bounded matched set is materialized once,
    df comes from one ``Sum`` aggregate over indicator columns, and
    the ranking pass folds per-batch top-``k`` partials on the driver
    (k × blocks rows).  N and Σdl arrive as scalars from a pruned
    metadata read owned by the caller."""
    from ray.data.aggregate import Sum

    slots = sorted(set(terms))

    def match(batch: pa.Table) -> pa.Table:
        flat, par = _token_lists(batch, text_col)
        cols = {"doc": batch[id_col],
                "dl": pc.cast(batch[dl_col], pa.int64())}
        any_hit = None
        for i, term in enumerate(slots):
            hit = pc.equal(flat, term)
            # per-doc tf for this slot: segment-sum of the hit mask
            tf = np.zeros(batch.num_rows, dtype=np.int64)
            idx = par.to_numpy(zero_copy_only=False)[
                hit.to_numpy(zero_copy_only=False)]
            np.add.at(tf, idx, 1)
            cols[f"tf{i}"] = pa.array(tf)
            cols[f"m{i}"] = pa.array((tf > 0).astype(np.int64))
            any_hit = tf > 0 if any_hit is None else (any_hit | (tf > 0))
        t = pa.table(cols)
        if any_hit is None:
            return t.slice(0, 0)
        return t.filter(pa.array(any_hit))

    matched = ds.map_batches(match, batch_format="pyarrow") \
        .materialize()                      # match-rate-bounded rows
    aggs = [Sum(f"m{i}", alias_name=f"df{i}") for i in range(len(slots))]
    stat = matched.aggregate(*aggs) or {}
    dfs = [int(stat.get(f"df{i}") or 0) for i in range(len(slots))]

    n_f = float(n_docs)
    avgdl = float(sum_dl) / n_f
    idfs = [float(np.log((n_f - df + 0.5) / (df + 0.5) + 1.0))
            for df in dfs]

    def rank(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64()),
                             "n_terms": pa.array([], pa.int64())})
        dl = batch["dl"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        den_norm = k1 * ((1.0 - b) + b * dl / avgdl)
        score = np.zeros(len(dl), dtype=np.float64)
        n_terms = np.zeros(len(dl), dtype=np.int64)
        for i in range(len(slots)):
            tf = batch[f"tf{i}"].combine_chunks() \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            comp = idfs[i] * (tf * (k1 + 1.0)) / (tf + den_norm)
            comp[tf == 0.0] = 0.0
            score = score + comp
            n_terms += (tf > 0).astype(np.int64)
        sr = round_away(score, 4)
        order = np.lexsort((np.asarray(
            batch["doc"].combine_chunks().to_numpy(
                zero_copy_only=False)), -sr))[:k]
        return pa.table({
            id_col: batch["doc"].combine_chunks().take(
                pa.array(order, pa.int64())),
            "score": pa.array(sr[order]),
            "n_terms": pa.array(n_terms[order])})

    parts = matched.map_batches(rank, batch_format="pyarrow") \
        .take_all()                          # k × blocks rows
    import pandas as pd

    if not parts:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "n_terms": pd.Series([], dtype="int64")})
    df = pd.DataFrame(parts).sort_values(
        ["score", id_col], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def bpe_merges_ds(docs_ds, text_col: str = "text",
                  n_merges: int = 8):
    """Learn the first ``n_merges`` BPE merge rules over the corpus —
    classic Sennrich subword training, distributed: merges are picked
    by weighted adjacent-symbol-pair frequency over the WORD-FREQUENCY
    dictionary (never the raw corpus), applied left-to-right greedy
    (overlapping runs keep every other match, the reference BPE
    semantics), ties broken (count DESC, left ASC, right ASC) so the
    rule sequence is deterministic.  Returns one row per merge:
    ``(step, left, right, pair_count)``.

    Scale shape: ONE corpus pass builds the (word, n) dict (per-batch
    count partials, one vocab-bounded groupby); each of the
    ``n_merges`` rounds is a vectorized pair-count map over the
    symbolized dict + a pair groupby whose argmax ships per-block
    TOP-1 partials to the driver, then a vectorized merge map — the
    corpus is never re-read and nothing corpus-sized ever moves.  The
    dict materializes per round (vocab-bounded) to keep the lineage
    flat.  Iterative by nature → no SQL twin (rows-only lane; the
    pure-Python reference BPE in the unit test is the oracle)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def word_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(b[text_col], ""), pattern=r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        t = pa.table({"word": flat})
        g = t.group_by(["word"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"word": g["word"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    words = docs_ds.select_columns([text_col]) \
        .map_batches(word_counts, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n"))

    def symbolize(b: pa.Table) -> pa.Table:
        return pa.table({
            "syms": pa.array([list(w) for w in
                              b["word"].to_pylist()],
                             pa.list_(pa.string())),
            "n": b["n"]})

    dict_ds = words.map_batches(symbolize, batch_format="pyarrow") \
        .materialize()

    def pair_counts(b: pa.Table) -> pa.Table:
        syms = b["syms"].combine_chunks()
        vals = np.asarray(syms.values.to_pylist(), dtype=object)
        offs = syms.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = b["n"].combine_chunks().to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        npairs = np.maximum(lens - 1, 0)
        tot = int(npairs.sum())
        if tot == 0:
            return pa.table({"l": pa.array([], pa.string()),
                             "r": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(npairs)[:-1]]), npairs)
        idx = np.repeat(offs[:-1], npairs) + within
        w = np.repeat(n, npairs)
        t = pa.table({"l": pa.array(vals[idx].tolist(), pa.string()),
                      "r": pa.array(vals[idx + 1].tolist(),
                                    pa.string()),
                      "c": pa.array(w.astype(np.int64))})
        g = t.group_by(["l", "r"], use_threads=False).aggregate(
            [("c", "sum")])
        return pa.table({"l": g["l"], "r": g["r"], "c": g["c_sum"]})

    def top1(b: pa.Table) -> pa.Table:
        if b.num_rows <= 1:
            return b
        c = pc.negate(b["c"]).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((np.asarray(b["r"].to_pylist()),
                            np.asarray(b["l"].to_pylist()), c))
        return b.take(pa.array(order[:1]))

    def greedy_keep(match: np.ndarray) -> np.ndarray:
        """Left-to-right non-overlapping keeps: within each run of
        consecutive matches keep even offsets (reference BPE)."""
        if not match.any():
            return match
        run_start = match & np.concatenate([[True], ~match[:-1]])
        starts_idx = np.maximum.accumulate(
            np.where(run_start, np.arange(len(match)), 0))
        off = np.arange(len(match)) - starts_idx
        return match & (off % 2 == 0)

    merges = []
    for step in range(1, n_merges + 1):
        cand = dict_ds.map_batches(pair_counts,
                                   batch_format="pyarrow") \
            .groupby(["l", "r"]).aggregate(Sum("c", alias_name="c")) \
            .map_batches(top1, batch_format="pyarrow").to_pandas()
        if not len(cand):
            break
        cand = cand.sort_values(["c", "l", "r"],
                                ascending=[False, True, True])
        left, right = str(cand.iloc[0]["l"]), str(cand.iloc[0]["r"])
        cnt = int(cand.iloc[0]["c"])
        if cnt <= 0:
            break
        merges.append((step, left, right, cnt))

        def apply(b: pa.Table, _l=left, _r=right) -> pa.Table:
            syms = b["syms"].combine_chunks()
            vals = np.asarray(syms.values.to_pylist(), dtype=object)
            offs = syms.offsets.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if len(vals) == 0:
                return b
            same_row = np.ones(max(len(vals) - 1, 0), dtype=bool)
            row_end = np.zeros(len(vals), dtype=bool)
            row_end[offs[1:] - 1] = True
            same_row &= ~row_end[:-1]
            match = (vals[:-1] == _l) & (vals[1:] == _r) & same_row
            keep = greedy_keep(match)
            if not keep.any():
                return b
            drop = np.zeros(len(vals), dtype=bool)
            drop[np.flatnonzero(keep) + 1] = True
            vals = vals.copy()
            vals[np.flatnonzero(keep)] = _l + _r
            lens = np.diff(offs)
            drops_per_row = np.add.reduceat(
                drop.astype(np.int64), offs[:-1]) \
                if len(offs) > 1 else np.zeros(0, np.int64)
            new_lens = lens - drops_per_row
            new_vals = vals[~drop]
            new_offs = np.concatenate(
                [[0], np.cumsum(new_lens)]).astype(np.int32)
            syms_new = pa.ListArray.from_arrays(
                pa.array(new_offs, pa.int32()),
                pa.array(new_vals.tolist(), pa.string()))
            return pa.table({"syms": syms_new, "n": b["n"]})

        dict_ds = dict_ds.map_batches(apply, batch_format="pyarrow") \
            .materialize()

    return pa.table({
        "step": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64())})
