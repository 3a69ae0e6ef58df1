"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` / ``media_ref`` columns with typed
metadata.  The Ray-side plumbing — schema, actor-pool stage shape,
batch sizing, output layout — is real and tested; the actual byte
decoding is STUBBED because no image/audio library ships in this
container: :class:`MediaDecoder` with ``mode="real"`` raises
``NotImplementedError`` at the exact call site where PIL/librosa would
run, and ``mode="fake"`` produces a deterministic, SQL-expressible
pseudo-decode (pure function of ``media_ref``) so the full pipeline is
exercisable end-to-end and driver-verifiable.

Scale notes: media batches are large-payload → small ``batch_size``
(default 64) with an actor pool so codec init happens once per actor;
decoded features are fixed-width numeric columns (columnar, compact)
while raw bytes never outlive the stage.
"""

from __future__ import annotations

import pyarrow as pa

FEATURE_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("span_idx", pa.int32()),
    pa.field("kind", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("width", pa.int64()),
    pa.field("height", pa.int64()),
    pa.field("duration_ms", pa.int64()),
    pa.field("n_frames", pa.int64()),
])


def fake_decode_meta(kind: str, media_ref: str) -> tuple[int, int, int, int]:
    """Deterministic pseudo-decode — pure arithmetic on the ref string
    so a DuckDB oracle can reproduce it exactly:

    width       = 256 + (length(media_ref) % 64)
    height      = 144 + (length(media_ref) % 32)
    duration_ms = 1000 * (1 + length(media_ref) % 30)   (audio/video else 0)
    n_frames    = duration_ms / 40                       (video else 1)
    """
    ln = len(media_ref or "")
    width = 256 + ln % 64
    height = 144 + ln % 32
    duration = 1000 * (1 + ln % 30) if kind in ("audio", "video") else 0
    n_frames = duration // 40 if kind == "video" else 1
    return width, height, duration, n_frames


class MediaDecoder:
    """Actor-pool decode stage over exploded span rows.

    ``__init__`` is where a real build loads codecs / models once per
    actor; ``__call__`` consumes batches with (doc_id, span_idx, kind,
    media_ref) and emits :data:`FEATURE_SCHEMA` rows for media spans.
    """

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        if mode == "real":
            # real codec imports would happen here, once per actor
            self._codec = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        refs = batch["media_ref"].to_pylist()
        keep = [i for i, k in enumerate(kinds) if k not in ("text",)]
        out = {name: [] for name in FEATURE_SCHEMA.names}
        doc_ids = batch["doc_id"].to_pylist()
        span_idx = batch["span_idx"].to_pylist()
        for i in keep:
            if self.mode == "real":
                raise NotImplementedError(
                    "no image/audio codec available in this container; "
                    "run with mode='fake' (deterministic pseudo-decode)")
            w, h, d, f = fake_decode_meta(kinds[i], refs[i])
            out["doc_id"].append(doc_ids[i])
            out["span_idx"].append(span_idx[i])
            out["kind"].append(kinds[i])
            out["media_ref"].append(refs[i])
            out["width"].append(w)
            out["height"].append(h)
            out["duration_ms"].append(d)
            out["n_frames"].append(f)
        return pa.Table.from_pydict(out, schema=FEATURE_SCHEMA)


def media_features_ds(span_rows_ds, mode: str = "fake",
                      concurrency=(1, 4), batch_size: int = 64):
    """Exploded span rows → decoded media feature table (actor pool)."""
    return span_rows_ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class FrameSampler:
    """Video frame-sampling stage stub: emits one row per sampled frame
    (every ``stride_ms``) with deterministic frame ids — exercises the
    1→N flat-map layout used by real frame extraction."""

    def __init__(self, stride_ms: int = 1000):
        self.stride_ms = stride_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "span_idx": [], "media_ref": [],
               "frame_idx": [], "ts_ms": []}
        for doc_id, span_idx, kind, ref in zip(
                batch["doc_id"].to_pylist(), batch["span_idx"].to_pylist(),
                batch["kind"].to_pylist(), batch["media_ref"].to_pylist()):
            if kind != "video":
                continue
            _, _, dur, _ = fake_decode_meta(kind, ref)
            for f, ts in enumerate(range(0, dur, self.stride_ms)):
                out["doc_id"].append(doc_id)
                out["span_idx"].append(span_idx)
                out["media_ref"].append(ref)
                out["frame_idx"].append(f)
                out["ts_ms"].append(ts)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "span_idx": pa.array(out["span_idx"], pa.int32()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "frame_idx": pa.array(out["frame_idx"], pa.int64()),
            "ts_ms": pa.array(out["ts_ms"], pa.int64()),
        })
