"""JSONL / CSV ingestion adapters (source-format breadth).

The engine's canonical storage is parquet (and the documented
parquet-in-Lance-layout fallback in :mod:`kgforge.sources.interleaved`),
but real corpora arrive as JSON-lines dumps and CSV exports.  These
wrappers ride Ray Data's native streaming readers (`read_json` /
`read_csv` — arrow-backed, one block per file shard, no driver
materialization) and normalize to the engine's table schemas so every
downstream operator works unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def read_documents_jsonl(path: str, columns: list[str] | None = None):
    """Documents table from a JSONL dump: one object per line with
    (doc_id, source, text[, lang, quality]).  Missing optional fields
    are filled to the parquet schema's shape; ``columns`` prunes like
    the parquet reader (applied post-parse — JSON has no column
    pruning at the scan, which is exactly why parquet is the
    canonical format; this adapter exists for ingest, not steady
    state)."""
    import ray.data as rd

    ds = rd.read_json(path)

    def normalize(b: pa.Table) -> pa.Table:
        cols = {}
        cols["doc_id"] = pc.cast(b["doc_id"], pa.int64())
        cols["source"] = pc.cast(b["source"], pa.string())
        cols["text"] = pc.fill_null(pc.cast(b["text"], pa.string()), "")
        out = pa.table(cols)
        if columns is not None:
            out = out.select([c for c in columns
                              if c in out.column_names])
        return out

    return ds.map_batches(normalize, batch_format="pyarrow")


def read_events_csv(path: str, columns: list[str] | None = None):
    """Events table from CSV: (event_id, ts, user_id, event_type,
    value, props) with ``ts`` parsed to microsecond timestamps.
    Arrow's CSV reader streams record batches per shard; the
    normalize pass casts to the parquet schema so the whole events
    operator family runs on CSV drops unchanged."""
    import ray.data as rd

    ds = rd.read_csv(path)

    def normalize(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["ts"], pa.timestamp("us"))
        cols = {
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "ts": ts,
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "event_type": pc.cast(b["event_type"], pa.string()),
            "value": pc.cast(b["value"], pa.float64()),
            "props": pc.fill_null(pc.cast(b["props"], pa.string()),
                                  "{}"),
        }
        out = pa.table(cols)
        if columns is not None:
            out = out.select([c for c in columns
                              if c in out.column_names])
        return out

    return ds.map_batches(normalize, batch_format="pyarrow")
