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


def build_nodes_ds(linked_mentions_ds):
    """T1+canon ds → nodes ds (distributed, two shuffles over small keys)."""
    from ray.data.aggregate import Count

    phase1 = linked_mentions_ds.groupby(
        ["canon_id", "canon_surface", "doc_id", "etype"]).aggregate(
        Count(alias_name="n"))

    def merge_canon(group: pa.Table) -> pa.Table:
        etypes: dict[str, int] = {}
        for e, n in zip(group["etype"].to_pylist(), group["n"].to_pylist()):
            etypes[e] = etypes.get(e, 0) + int(n)
        top = sorted(etypes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        return pa.Table.from_pylist([{
            "canon_id": group["canon_id"][0].as_py(),
            "surface": group["canon_surface"][0].as_py(),
            "etype": top,
            "n_mentions": int(pc.sum(group["n"]).as_py()),
            "n_docs": len(set(group["doc_id"].to_pylist())),
        }], schema=NODE_SCHEMA)

    return phase1.groupby("canon_id").map_groups(
        merge_canon, batch_format="pyarrow").sort("canon_id")


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
