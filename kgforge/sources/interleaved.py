"""T0 interleaved-document table: schema, writer, readers (SURVEY §2.1 S2).

The production format is a Lance table (``BASELINE.json:15``); ``pylance``
is not installable in this sandbox (SURVEY §0.3), so tables are written
in a *Lance-layout fallback*: a directory of Parquet fragments plus a
``_manifest.json``.  ``read_interleaved`` prefers ``ray.data.read_lance``
when the dependency exists, else reads the fragment directory — the
schema is identical either way.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

SPAN_STRUCT = pa.struct([
    pa.field("kind", pa.string()),
    pa.field("text", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("offset", pa.int32()),
])

T0_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("spans", pa.list_(SPAN_STRUCT)),
])


def docs_to_table(docs: list[dict]) -> pa.Table:
    """Python T0 rows (oracle generator output) → Arrow table."""
    return pa.Table.from_pylist(docs, schema=T0_SCHEMA)


def write_interleaved(docs: list[dict], path: str,
                      rows_per_fragment: int = 10_000) -> str:
    """Write a T0 table as a Lance-layout fragment dir + manifest."""
    os.makedirs(path, exist_ok=True)
    table = docs_to_table(docs)
    n = table.num_rows
    fragments = []
    for i, start in enumerate(range(0, max(n, 1), rows_per_fragment)):
        frag = table.slice(start, rows_per_fragment)
        name = f"frag-{i:05d}.parquet"
        pq.write_table(frag, os.path.join(path, name))
        fragments.append({"file": name, "rows": frag.num_rows})
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump({"format": "lance-layout-parquet", "version": 1,
                   "schema": T0_SCHEMA.to_string(), "fragments": fragments},
                  f, indent=1)
    return path


def read_interleaved(path: str, **kwargs):
    """T0 directory → ``ray.data.Dataset`` (lazy, streaming).

    Prefers real Lance when available; falls back to the Parquet
    fragment layout.  ``kwargs`` forwarded to the reader (e.g.
    ``override_num_blocks``).
    """
    import ray.data as rd

    try:
        import lance  # noqa: F401
        if os.path.exists(os.path.join(path, "_versions")):
            return rd.read_lance(path, **kwargs)
    except ImportError:
        pass
    return rd.read_parquet(path, file_extensions=["parquet"], **kwargs)
