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


def _binary_shard_reader(path: str, decode, columns):
    """Shard-per-file table reader on Ray Data's streaming
    ``read_binary_files`` source: each file decodes to Arrow ON THE
    WORKER (one block per shard, nothing on the driver), with column
    pruning pushed into the decoder."""
    import ray.data as rd

    files = rd.read_binary_files(path)

    def decode_batch(b: pa.Table) -> pa.Table:
        tables = [decode(data, columns)
                  for data in b["bytes"].to_pylist()]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return decode(None, columns).slice(0, 0)
        return pa.concat_tables(tables, promote_options="default")

    return files.map_batches(decode_batch, batch_format="pyarrow")


def read_documents_orc(path: str, columns: list[str] | None = None):
    """Documents table from ORC shards — column pruning happens at the
    ORC stripe decode (``ORCFile.read(columns=...)``), mirroring the
    parquet reader's scan-level pruning."""
    from pyarrow import orc as _orc

    want = columns or ["doc_id", "source", "text"]

    def decode(data, cols):
        if data is None:
            return pa.table({c: pa.array([], pa.string())
                             for c in want})
        f = _orc.ORCFile(pa.BufferReader(data))
        return f.read(columns=list(cols) if cols else None)

    return _binary_shard_reader(path, decode, want)


def read_documents_feather(path: str,
                           columns: list[str] | None = None):
    """Documents table from Feather/Arrow-IPC shards — zero-copy
    column projection at the IPC decode."""
    from pyarrow import feather as _feather

    want = columns or ["doc_id", "source", "text"]

    def decode(data, cols):
        if data is None:
            return pa.table({c: pa.array([], pa.string())
                             for c in want})
        return _feather.read_table(
            pa.BufferReader(data),
            columns=list(cols) if cols else None)

    return _binary_shard_reader(path, decode, want)
