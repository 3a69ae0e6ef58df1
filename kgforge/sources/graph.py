"""S4: node/edge graph-table materialization (SURVEY §2.1 S4, §2.5 G5).

Nodes: ``canon_id, surface, etype, n_mentions, n_docs`` — exact distinct
doc counts via the two-phase groupby (no sketch needed:
``groupby(canon_id, doc_id, etype)`` partials → per-canon merge).
Edges: the deduped, sorted triple table.  Written in the Lance-layout
Parquet fallback (directory + ``_manifest.json``; see
``kgforge.sources.interleaved`` for the pylance story).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

NODE_SCHEMA = pa.schema([
    ("canon_id", pa.string()),
    ("surface", pa.string()),
    ("etype", pa.string()),
    ("n_mentions", pa.int64()),
    ("n_docs", pa.int64()),
])


DOC_SALT_BUCKETS = 256


def _combine_node_partials(batch: pa.Table) -> pa.Table:
    """Commutative-associative combiner over (canon, doc, etype) partial
    counts — vectorized ``group_by``, reusable at every tree level.
    Adds ``salt = blake2b64(doc_id) % S``: the doc space is hash-
    partitioned so the hot-canon distinct-doc count can be computed
    exactly in S parallel pieces (a single canon key otherwise funnels
    every (canon, doc) row of a hot entity into ONE merge task —
    measured 1-2M-row stragglers on the 800k-doc bench)."""
    import numpy as np

    from kgforge.common.hashing import hash_u64_np

    if "n" not in batch.column_names:        # first level: raw mentions
        batch = batch.select(["canon_id", "canon_surface", "doc_id",
                              "etype"]).append_column(
            "n", pa.array([1] * batch.num_rows, pa.int64()))
    g = batch.group_by(["canon_id", "canon_surface", "doc_id", "etype"],
                       use_threads=False).aggregate([("n", "sum")])
    g = g.rename_columns(["canon_id", "canon_surface", "doc_id",
                          "etype", "n"])
    salts = (hash_u64_np(g["doc_id"].to_pylist()) %
             np.uint64(DOC_SALT_BUCKETS)).astype(np.int32) \
        if g.num_rows else np.zeros(0, dtype=np.int32)
    return g.append_column("salt", pa.array(salts, pa.int32()))


_STAGE1_SCHEMA = pa.schema([
    ("canon_id", pa.string()),
    ("canon_surface", pa.string()),
    ("etype", pa.string()),
    ("n", pa.int64()),
    ("nd", pa.int64()),
])


def _salted_doc_partials(batch: pa.Table) -> pa.Table:
    """Stage-1 merge over one (canon, salt) key range: exact per-salt
    distinct-doc counts + per-etype mention sums.  Each (canon, doc)
    pair lives in exactly ONE salt bucket, so summing ``nd`` across
    salts later is an exact distinct count — the classic salted
    exact-distinct plan; no single task ever sees a hot canon's whole
    doc set."""
    df = batch.to_pandas()
    if df.empty:
        return _STAGE1_SCHEMA.empty_table()
    te = df.groupby(["canon_id", "canon_surface", "salt", "etype"],
                    as_index=False)["n"].sum()
    nd = df.drop_duplicates(["canon_id", "salt", "doc_id"]) \
        .groupby(["canon_id", "salt"], as_index=False) \
        .size().rename(columns={"size": "nd"})
    # attach the per-(canon, salt) distinct-doc count to ONE etype row
    # (first in etype order) so global sums stay exact
    te = te.sort_values(["canon_id", "salt", "etype"], kind="mergesort")
    first = ~te.duplicated(["canon_id", "salt"])
    te = te.merge(nd, on=["canon_id", "salt"], how="left")
    te["nd"] = te["nd"].where(first.to_numpy(), 0).astype("int64")
    return pa.Table.from_pandas(
        te[["canon_id", "canon_surface", "etype", "n", "nd"]],
        schema=_STAGE1_SCHEMA, preserve_index=False)


def _finalize_nodes(batch: pa.Table) -> pa.Table:
    """Stage-2 merge per canon range over the tiny stage-1 partials:
    majority etype with lexicographic tie-break, summed mention +
    distinct-doc counts — all pandas-vectorized."""
    df = batch.to_pandas()
    if df.empty:
        return NODE_SCHEMA.empty_table()
    te = df.groupby(["canon_id", "etype"], as_index=False)["n"].sum()
    te = te.sort_values(["canon_id", "n", "etype"],
                        ascending=[True, False, True])
    top = te.drop_duplicates("canon_id")[["canon_id", "etype"]]
    agg = df.groupby("canon_id").agg(
        surface=("canon_surface", "first"),
        n_mentions=("n", "sum"),
        n_docs=("nd", "sum")).reset_index()
    out = agg.merge(top, on="canon_id").sort_values("canon_id")
    return pa.Table.from_pandas(
        out[["canon_id", "surface", "etype", "n_mentions", "n_docs"]],
        schema=NODE_SCHEMA, preserve_index=False)


def build_nodes_ds(linked_mentions_ds, num_buckets: int | None = None):
    """T1+canon ds → nodes ds, skew-proof.

    Three levels, each fully parallel and each shrinking the data:

    1. per-block combine → distinct (canon, doc, etype) counted rows
       with a ``salt = hash(doc) % 256`` doc-space partition,
    2. range exchange keyed on ``(canon_id, salt)`` → exact per-salt
       distinct-doc + per-etype counts (≤ canons × 256 × etypes rows),
    3. range exchange keyed on ``canon_id`` → final majority-etype
       election + exact global sums, globally sorted output.

    The salt is what makes this web-scale: with only canon_id as the
    key, every (canon, doc) row of a hot entity (华为 at 20% document
    frequency) funnels into one merge task — measured as a 1-2M-row
    straggler turning the node build into the pipeline's longest pole
    at 32 CPUs."""
    import numpy as np
    import pyarrow.compute as pc

    from kgforge.stages.exchange import arrow_string_keys, \
        range_exchange_merge

    partial = linked_mentions_ds.map_batches(
        _combine_node_partials, batch_format="pyarrow").materialize()

    def key1(batch: pa.Table) -> np.ndarray:
        joined = pc.binary_join_element_wise(
            batch["canon_id"],
            pc.utf8_lpad(pc.cast(batch["salt"], pa.string()), 3, "0"),
            "\x01")
        return arrow_string_keys(joined, 48)

    stage1 = range_exchange_merge(partial, key_of=key1,
                                  merge_fn=_salted_doc_partials,
                                  num_buckets=num_buckets).materialize()

    def key2(batch: pa.Table) -> np.ndarray:
        col = batch["canon_id"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return arrow_string_keys(col, 48)

    # _finalize_nodes sorts by canon_id within the bucket; range buckets
    # in key order ⇒ globally sorted node table
    return range_exchange_merge(stage1, key_of=key2,
                                merge_fn=_finalize_nodes,
                                num_buckets=num_buckets)


def write_graph_table(ds, path: str, table_name: str) -> str:
    """Write one graph table (Lance-layout Parquet dir + manifest).

    A Ray write task killed mid-file and retried leaves a torn orphan
    (PAR1 header, no footer) beside the complete retry file — Ray's
    write filenames carry the attempt's task index, so the orphan is
    never overwritten.  Every block the returned ``write_parquet``
    acknowledges was durably written by a SUCCESSFUL attempt, so any
    file failing the footer check is a dead attempt's residue: it is
    quarantined (deleted) before the manifest is built, and readers
    that glob the directory see only complete fragments."""
    from kgforge.common.parquet_io import prune_torn_fragments

    os.makedirs(path, exist_ok=True)
    out_dir = os.path.join(path, table_name)
    ds.write_parquet(out_dir, mode="overwrite")
    files = prune_torn_fragments(out_dir)
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump({"format": "lance-layout-parquet", "version": 1,
                   "table": table_name, "fragments": files}, f, indent=1)
    return out_dir
