"""Distributed triple extraction + dedup (SURVEY §2.11, §2.7 D1).

:class:`TripleExtractor` is a stateless-in-spirit actor holding only the
broadcast alias map; it maps sentence-with-mentions batches to T3 triple
rows using the *oracle* rule engine (identical semantics by
construction).  Dedup is the canonical two-phase pattern: in-batch
combine (map_batches) → range-partitioned merge+sort in one exchange
(SHUFFLE 2+3 of SURVEY §3.2 fused; see :func:`dedup_triples_ds`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgforge.oracle.triples import COOCCUR_WINDOW, TRIPLE_RULES

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("sent_idx", pa.int32()),
    ("support", pa.int64()),
    ("pid", pa.int32()),
])

EDGE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("support", pa.int64()),
    ("first_doc", pa.string()),
])


_ALIAS_CACHE: dict = {}


def alias_from_ref(alias_ref) -> dict:
    """Per-worker-process cache of the broadcast alias map: ``ray.get``
    of a Python dict deserializes on every call, so stateless task fns
    resolve it once per process (the actor-pool alternative paid ~2-5s
    of pool spin-up per stage for the same effect)."""
    key = alias_ref.hex()
    if key not in _ALIAS_CACHE:
        import ray

        _ALIAS_CACHE.clear()          # only one broadcast generation live
        _ALIAS_CACHE[key] = ray.get(alias_ref)
    return _ALIAS_CACHE[key]


def make_triple_extract_fn(alias_ref):
    """Stateless task variant of :class:`TripleExtractor` — fuses with
    upstream map stages (no actor pool)."""

    def extract(batch: pa.Table) -> pa.Table:
        return TripleExtractor(alias_map=alias_from_ref(alias_ref))(batch)

    return extract


_MAX_RULE_GAP = max(r[5] for r in TRIPLE_RULES)


class TripleExtractor:
    """Sentence rows (``mentions`` attached) → T3 rows.

    Vectorized re-expression of :func:`kgforge.oracle.triples
    .extract_triples` (multiset-equal output; parity-tested): pair
    generation is a shifted-parents comparison, gap-length pruning and
    type/direction rule masks are numpy, connective containment is a
    ``np.char.find`` over only the gap strings that survive the length
    prune, and the per-sentence ``mentions``-pred dedup is a pandas
    ``drop_duplicates``.  Python touches strings exactly once per
    surviving gap slice."""

    emit_mentions_pred = True

    def __init__(self, alias_ref=None, alias_map=None):
        if alias_ref is not None:
            import ray

            self.alias: dict = ray.get(alias_ref)
        else:
            self.alias = alias_map or {}

    def _canon_surfaces(self, etypes: np.ndarray,
                        surfaces: np.ndarray) -> np.ndarray:
        """Vectorized canon lookup: resolve once per distinct
        (etype, surface), fan back out by code index — no per-row
        tuple construction.  Key separator is \\x1f (unit separator):
        np.char treats NUL as a terminator, and etype labels are closed
        enum strings that cannot contain control chars."""
        if not self.alias:
            return surfaces
        key = np.char.add(np.char.add(etypes.astype("U"), "\x1f"),
                          surfaces.astype("U"))
        uniq, inv = np.unique(key, return_inverse=True)
        vals = np.empty(len(uniq), dtype=object)
        for i, k in enumerate(uniq):
            e, _, s = str(k).partition("\x1f")
            vals[i] = self.alias.get((e, s), (None, s))[1]
        return vals[inv]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        ments = batch["mentions"]
        if isinstance(ments, pa.ChunkedArray):
            ments = ments.combine_chunks()
        # mention-less sentences produce nothing — drop before any
        # Python-object conversion
        batch = batch.filter(pc.greater(pc.list_value_length(ments), 0))
        if batch.num_rows == 0:
            return TRIPLE_SCHEMA.empty_table()
        ments = batch["mentions"]
        if isinstance(ments, pa.ChunkedArray):
            ments = ments.combine_chunks()
        flat = pc.list_flatten(ments)
        parents = pc.list_parent_indices(ments) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        etypes = np.asarray(flat.field("etype").to_pylist(), dtype=object)
        starts = flat.field("ment_start") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ends = flat.field("ment_end") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        surfaces = np.asarray(flat.field("surface").to_pylist(),
                              dtype=object)
        # oracle order: mentions sorted by (start, end) within sentence
        order = np.lexsort((ends, starts, parents))
        parents, etypes = parents[order], etypes[order]
        starts, ends = starts[order], ends[order]
        surfaces = surfaces[order]
        canon = self._canon_surfaces(etypes, surfaces)

        texts = batch["sent_text"].to_pylist()
        doc_ids = np.asarray(batch["doc_id"].to_pylist(), dtype=object)
        span_idx = batch["span_idx"].to_numpy(zero_copy_only=False)
        sent_idx = batch["sent_idx"].to_numpy(zero_copy_only=False)
        pid = batch["pid"].to_numpy(zero_copy_only=False)

        cols = {k: [] for k in ("subj", "pred", "obj", "subj_type",
                                "obj_type", "p")}

        def emit(subj, pred, obj, st, ot, p):
            cols["subj"].append(np.asarray(subj, dtype=object))
            cols["pred"].append(np.full(len(p), pred, dtype=object)
                                if isinstance(pred, str)
                                else np.asarray(pred, dtype=object))
            cols["obj"].append(np.asarray(obj, dtype=object))
            cols["subj_type"].append(np.asarray(st, dtype=object))
            cols["obj_type"].append(np.asarray(ot, dtype=object))
            cols["p"].append(np.asarray(p, dtype=np.int64))

        # ---- ordered same-sentence pairs (i before j) -------------------
        n = len(parents)
        i1s, i2s = [], []
        _, counts = np.unique(parents, return_counts=True)
        for k in range(1, int(counts.max()) if n else 0):
            cand = np.flatnonzero(parents[:-k] == parents[k:])
            if len(cand):
                i1s.append(cand)
                i2s.append(cand + k)
        if i1s:
            i1 = np.concatenate(i1s)
            i2 = np.concatenate(i2s)
            keep = starts[i2] >= ends[i1]       # overlapping → no relation
            i1, i2 = i1[keep], i2[keep]
        else:
            i1 = i2 = np.zeros(0, dtype=np.int64)
        gap_len = starts[i2] - ends[i1]

        # ---- pattern rules (gap ≤ max rule gap only) --------------------
        nr = np.flatnonzero(gap_len <= _MAX_RULE_GAP)
        if len(nr):
            g1, g2 = i1[nr], i2[nr]
            gl = gap_len[nr]
            gp = parents[g1]
            gaps = np.asarray([texts[p][e:s] for p, e, s in
                               zip(gp, ends[g1], starts[g2])], dtype="U8")
            t1, t2 = etypes[g1], etypes[g2]
            for pred, st, ot, direction, conns, max_gap in TRIPLE_RULES:
                has = np.zeros(len(nr), dtype=bool)
                for c in conns:
                    has |= np.char.find(gaps, c) >= 0
                m = has & (gl <= max_gap)
                if direction == "subj_first":
                    m &= (t1 == st) & (t2 == ot)
                    sj, ob = g1, g2
                else:
                    m &= (t1 == ot) & (t2 == st)
                    sj, ob = g2, g1
                if m.any():
                    emit(canon[sj[m]], pred, canon[ob[m]],
                         etypes[sj[m]], etypes[ob[m]], gp[m])

        # ---- co-occurrence (windowed, unordered, canon-distinct) --------
        co = np.flatnonzero((gap_len <= COOCCUR_WINDOW) &
                            (canon[i1] != canon[i2]))
        if len(co):
            c1, c2 = i1[co], i2[co]
            a_first = canon[c1] <= canon[c2]
            sj = np.where(a_first, c1, c2)
            ob = np.where(a_first, c2, c1)
            emit(canon[sj], "co_occurs", canon[ob],
                 etypes[sj], etypes[ob], parents[c1])

        # ---- mentions pred: first occurrence per (sentence, canon) ------
        if self.emit_mentions_pred:
            dfm = pd.DataFrame({"p": parents, "canon": canon,
                                "etype": etypes})
            firsts = dfm.drop_duplicates(["p", "canon"], keep="first")
            fp = firsts["p"].to_numpy()
            emit(doc_ids[fp], "mentions", firsts["canon"].to_numpy(),
                 np.full(len(fp), "DOC", dtype=object),
                 firsts["etype"].to_numpy(), fp)

        if not cols["p"]:
            return TRIPLE_SCHEMA.empty_table()
        p_all = np.concatenate(cols["p"])
        m_rows = len(p_all)
        return pa.table({
            "subj": pa.array(np.concatenate(cols["subj"]), pa.string()),
            "pred": pa.array(np.concatenate(cols["pred"]), pa.string()),
            "obj": pa.array(np.concatenate(cols["obj"]), pa.string()),
            "subj_type": pa.array(np.concatenate(cols["subj_type"]),
                                  pa.string()),
            "obj_type": pa.array(np.concatenate(cols["obj_type"]),
                                 pa.string()),
            "doc_id": pa.array(doc_ids[p_all], pa.string()),
            "span_idx": pa.array(span_idx[p_all].astype(np.int32)),
            "sent_idx": pa.array(sent_idx[p_all].astype(np.int32)),
            "support": pa.array(np.ones(m_rows, dtype=np.int64)),
            "pid": pa.array(pid[p_all].astype(np.int32)),
        }, schema=TRIPLE_SCHEMA)


def combine_triples_in_batch(batch: pa.Table) -> pa.Table:
    """Partial D1 combiner: merge duplicate (subj, pred, obj) within a
    batch before any exchange (pre-aggregation — SURVEY §4).  Pure
    ``pyarrow.Table.group_by`` — C++-vectorized, no per-row Python."""
    if "doc_id" in batch.column_names:           # T3 input
        batch = pa.table({
            "subj": batch["subj"], "pred": batch["pred"],
            "obj": batch["obj"], "subj_type": batch["subj_type"],
            "obj_type": batch["obj_type"], "support": batch["support"],
            "first_doc": batch["doc_id"]})
    g = batch.group_by(["subj", "pred", "obj"], use_threads=False).aggregate(
        [("subj_type", "min"), ("obj_type", "min"),
         ("support", "sum"), ("first_doc", "min")])
    g = g.select(["subj", "pred", "obj", "subj_type_min", "obj_type_min",
                  "support_sum", "first_doc_min"])
    return g.rename_columns(["subj", "pred", "obj", "subj_type",
                             "obj_type", "support", "first_doc"]) \
        .cast(EDGE_SCHEMA)


def add_hash_bucket(batch: pa.Table, key_cols: list[str],
                    num_buckets: int) -> pa.Table:
    """Append a ``bucket`` int column = stable hash of the key columns
    (vectorized siphash) — the explicit hash-partition key for the
    merge shuffle."""
    import pandas as pd

    if batch.num_rows == 0:
        return batch.append_column("bucket", pa.array([], pa.int64()))
    h = pd.util.hash_pandas_object(
        batch.select(key_cols).to_pandas(), index=False) \
        .to_numpy(dtype=np.uint64)
    return batch.append_column(
        "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))


_KEY_SEP = "\x00"   # below every content codepoint → concat order == tuple order


def _triple_keys(batch: pa.Table) -> np.ndarray:
    """Fixed-width numpy key array (U48): searchsorted/argsort compare
    in C (object-dtype Python strings cost ~100M interpreted compares
    per exchange).  Truncation is safe: keys equal in the first 48
    chars land in the same range bucket, and the within-bucket merge
    sorts on the full columns.  Separator is NUL (U+0000), strictly
    below every possible content codepoint, so concat ordering agrees
    with (subj, pred, obj) tuple ordering; the assert verifies no
    content NUL snuck in (vectorized, one substring count)."""
    import pyarrow.compute as pc

    from kgforge.stages.exchange import arrow_string_keys

    joined = pc.binary_join_element_wise(batch["subj"], batch["pred"],
                                         batch["obj"], _KEY_SEP)
    n_nul = pc.sum(pc.count_substring(joined, _KEY_SEP)).as_py() or 0
    assert n_nul == 2 * batch.num_rows, \
        "NUL byte inside subj/pred/obj content breaks range-key ordering"
    return arrow_string_keys(joined, 48)


def dedup_triples_ds(triples_ds, num_buckets: int | None = None):
    """T3 ds → globally sorted edge table ds (D1 + O2) in ONE exchange.

    Per-block vectorized combine (pre-aggregation), then a
    range-partitioned merge: sample-based split points over the
    combined ``subj␟pred␟obj`` key assign each partial row a range
    bucket; ``groupby(bucket)`` co-locates each key range, the
    per-bucket merge combines + sorts within the range, and because
    groupby emits partitions in key order the concatenated output is
    globally sorted — no separate sort exchange.  The distinct edge
    set is NOT assumed small (structural ``mentions(doc, entity)``
    triples grow with the corpus): every level is parallel; scale by
    raising ``num_buckets``.
    """
    from kgforge.stages.exchange import range_exchange_merge

    partial = triples_ds.map_batches(combine_triples_in_batch,
                                     batch_format="pyarrow").materialize()

    def merge_and_sort(tbl: pa.Table) -> pa.Table:
        merged = combine_triples_in_batch(tbl)
        return merged.sort_by([("subj", "ascending"), ("pred", "ascending"),
                               ("obj", "ascending")])

    return range_exchange_merge(partial, key_of=_triple_keys,
                                merge_fn=merge_and_sort,
                                num_buckets=num_buckets)
