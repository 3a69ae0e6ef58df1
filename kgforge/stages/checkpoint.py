"""S5: per-partition checkpoints + lineage/metrics (SURVEY §2.1 S5, §4).

Checkpoint layout under ``ckpt_root``::

    {stage}/part-<xor>-<sum>-<rows>.parquet  # one file per block/partition
    {stage}/_SUCCESS                         # stage completion marker
    lineage/{stage}.parquet                  # T5 rows: one per partition

Write path is **write-through**: every map task persists its own block
(and a one-row lineage fragment) inline during the compute pass — no
second materialization, no driver-side readback, no hive explosion.
File names are content-addressed (``<xor>-<sum>-<rows>`` of per-row
hashes) so a Ray task *retry* rewrites the same file idempotently
instead of duplicating rows; the (xor, sum, rows) triple means two
distinct blocks colliding requires a simultaneous xor- and
sum-collision (xor alone cancels pairwise-duplicated rows).

A stage writes to ``{stage}.tmp/`` first and renames — a crash
mid-write leaves no ``_SUCCESS``, so resume recomputes that stage from
the previous checkpoint and nothing downstream reads a torn table
("resumes mid-pipeline after failure", BASELINE.json:6).  Lineage rows
carry per-partition row counts, an order-insensitive content checksum,
and wall time (T5 schema, SURVEY §1.2).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _restore_pid(batch: pa.Table) -> pa.Table:
    if "pid" in batch.column_names and batch.schema.field("pid").type != pa.int32():
        idx = batch.column_names.index("pid")
        batch = batch.set_column(
            idx, "pid", batch["pid"].cast(pa.int32()))
    return batch


LINEAGE_SCHEMA = pa.schema([
    ("stage", pa.string()),
    ("partition_id", pa.int32()),
    ("input_rows", pa.int64()),
    ("output_rows", pa.int64()),
    ("checksum", pa.uint64()),
    ("wall_s", pa.float64()),
    ("status", pa.string()),
])


def _content_checksum(batch: pa.Table, cols: list[str]) -> tuple[int, int]:
    """Order-insensitive (xor, sum) u64 pair of vectorized per-row
    hashes over the key columns (``pd.util.hash_pandas_object`` —
    C-speed siphash; a per-row Python hash loop here dominated
    checkpoint time).  XOR alone cancels duplicated rows pairwise
    (possible in T3: same (subj,pred,obj,doc_id) from two sentences);
    the wraparound SUM does not, so the pair is a faithful
    order-insensitive content summary."""
    if batch.num_rows == 0:
        return 0, 0
    import pandas as pd

    df = batch.select(cols).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
    with np.errstate(over="ignore"):
        s = int(np.add.reduce(h))
    return int(np.bitwise_xor.reduce(h)), s & 0xFFFFFFFFFFFFFFFF


def _make_block_writer(tmp_dir: str, stage: str, checksum_cols: list[str],
                       t_start: float):
    """Write-through batch fn: persist the block + its lineage fragment,
    pass the batch downstream unchanged."""

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        xor, tot = _content_checksum(batch, checksum_cols)
        cs = xor ^ ((tot * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        name = f"part-{xor:016x}-{tot:016x}-{batch.num_rows}"
        pq.write_table(batch, os.path.join(tmp_dir, name + ".parquet"))
        lineage = pa.Table.from_pylist([{
            "stage": stage,
            "partition_id": int(cs & 0x7FFFFFFF),
            "input_rows": batch.num_rows,
            "output_rows": batch.num_rows,
            "checksum": cs,
            "wall_s": time.monotonic() - t_start,
            "status": "complete",
        }], schema=LINEAGE_SCHEMA)
        pq.write_table(lineage,
                       os.path.join(tmp_dir, "_lineage", name + ".parquet"))
        return batch

    return write_block


class CheckpointManager:
    def __init__(self, root: str, num_partitions: int = 32):
        self.root = root
        self.num_partitions = num_partitions
        os.makedirs(root, exist_ok=True)

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self.stage_dir(stage), "_SUCCESS"))

    def write_stage(self, stage: str, ds, checksum_cols: list[str],
                    input_rows: int | None = None,
                    schema: pa.Schema | None = None):
        """Run ``ds`` once with write-through block persistence; returns
        the *materialized* dataset (downstream consumers stream from the
        object store; the Parquet files exist for resume).  Atomic via
        tmp-dir + rename; ``_SUCCESS`` only after all blocks landed."""
        t0 = time.monotonic()
        final = self.stage_dir(stage)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(os.path.join(tmp, "_lineage"), exist_ok=True)

        written = ds.map_batches(
            _make_block_writer(tmp, stage, checksum_cols, t0),
            batch_format="pyarrow", batch_size=None).materialize()

        lineage_dir = os.path.join(tmp, "_lineage")
        frags = sorted(os.listdir(lineage_dir))
        if frags:
            lineage_tbl = pa.concat_tables(
                [pq.read_table(os.path.join(lineage_dir, f)) for f in frags])
        else:
            lineage_tbl = LINEAGE_SCHEMA.empty_table()
            # zero-row stage: persist schema so resume sees it
            arrow_schema = schema
            if arrow_schema is None:
                try:
                    arrow_schema = written.schema().base_schema
                except Exception:
                    arrow_schema = pa.schema([("pid", pa.int32())])
            pq.write_table(arrow_schema.empty_table(),
                           os.path.join(tmp, "empty.parquet"))
        os.makedirs(os.path.join(self.root, "lineage"), exist_ok=True)
        pq.write_table(lineage_tbl,
                       os.path.join(self.root, "lineage", f"{stage}.parquet"))
        shutil.rmtree(lineage_dir)
        os.rename(tmp, final)
        with open(os.path.join(final, "_SUCCESS"), "w") as f:
            f.write(str(len(frags)))
        return written

    def read_stage(self, stage: str):
        import ray.data as rd

        ds = rd.read_parquet(self.stage_dir(stage),
                             file_extensions=["parquet"])
        return ds.map_batches(_restore_pid, batch_format="pyarrow")

    def lineage(self) -> pa.Table:
        path = os.path.join(self.root, "lineage")
        tables = [pq.read_table(os.path.join(path, f))
                  for f in sorted(os.listdir(path))] if os.path.isdir(path) else []
        return pa.concat_tables(tables) if tables else \
            pa.Table.from_pylist([], schema=LINEAGE_SCHEMA)
