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


def _combine_node_partials(batch: pa.Table) -> pa.Table:
    """Commutative-associative combiner over (canon, doc, etype) partial
    counts — vectorized ``group_by``, reusable at every tree level."""
    if "n" not in batch.column_names:        # first level: raw mentions
        batch = batch.select(["canon_id", "canon_surface", "doc_id",
                              "etype"]).append_column(
            "n", pa.array([1] * batch.num_rows, pa.int64()))
    g = batch.group_by(["canon_id", "canon_surface", "doc_id", "etype"],
                       use_threads=False).aggregate([("n", "sum")])
    return g.rename_columns(["canon_id", "canon_surface", "doc_id",
                             "etype", "n"])


def _finalize_nodes(batch: pa.Table) -> pa.Table:
    """Final per-canon merge (single task over the distinct
    (canon, doc, etype) partials): majority etype with lexicographic
    tie-break, exact distinct-doc counts — all pandas-vectorized."""
    df = batch.to_pandas()
    if df.empty:
        return NODE_SCHEMA.empty_table()
    # majority etype: sum n per (canon, etype), pick (-n, etype) min
    te = df.groupby(["canon_id", "etype"], as_index=False)["n"].sum()
    te = te.sort_values(["canon_id", "n", "etype"],
                        ascending=[True, False, True])
    top = te.drop_duplicates("canon_id")[["canon_id", "etype"]]
    agg = df.groupby("canon_id").agg(
        surface=("canon_surface", "first"),
        n_mentions=("n", "sum"),
        n_docs=("doc_id", "nunique")).reset_index()
    out = agg.merge(top, on="canon_id").sort_values("canon_id")
    return pa.Table.from_pandas(
        out[["canon_id", "surface", "etype", "n_mentions", "n_docs"]],
        schema=NODE_SCHEMA, preserve_index=False)


def build_nodes_ds(linked_mentions_ds, num_buckets: int | None = None):
    """T1+canon ds → nodes ds.

    Per-block vectorized combine of (canon, doc, etype) counted
    partials, then ONE hash-partitioned exchange keyed on
    ``hash(canon_id) % num_buckets`` (all rows of a canon land in one
    bucket, so the per-bucket finalize computes exact majority etype +
    distinct-doc counts), then a global sort by canon_id.  Fully
    parallel at every level — the distinct (canon, doc) set grows with
    the corpus and is never single-tasked."""
    import numpy as np

    from kgforge.stages.exchange import range_exchange_merge

    partial = linked_mentions_ds.map_batches(
        _combine_node_partials, batch_format="pyarrow").materialize()

    def key_of(batch: pa.Table) -> np.ndarray:
        return np.asarray(batch["canon_id"].to_pylist(), dtype="U48")

    # _finalize_nodes sorts by canon_id within the bucket; range buckets
    # in key order ⇒ globally sorted node table
    return range_exchange_merge(partial, key_of=key_of,
                                merge_fn=_finalize_nodes,
                                num_buckets=num_buckets)


def write_graph_table(ds, path: str, table_name: str) -> str:
    """Write one graph table (Lance-layout Parquet dir + manifest)."""
    os.makedirs(path, exist_ok=True)
    out_dir = os.path.join(path, table_name)
    ds.write_parquet(out_dir, mode="overwrite")
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump({"format": "lance-layout-parquet", "version": 1,
                   "table": table_name, "fragments": files}, f, indent=1)
    return out_dir
