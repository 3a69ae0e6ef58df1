"""S5: per-partition checkpoints + lineage/metrics (SURVEY §2.1 S5, §4).

Checkpoint layout under ``ckpt_root``::

    {stage}/pid=N/part-*.parquet     # partition-keyed Parquet fragments
    {stage}/_SUCCESS                 # stage completion marker (atomic)
    lineage/{stage}.parquet          # T5 rows: one per partition

A stage writes to ``{stage}.tmp/`` first and renames — a crash mid-write
leaves no ``_SUCCESS``, so resume recomputes that stage from the previous
checkpoint and nothing downstream can read a torn table ("resumes
mid-pipeline after failure", BASELINE.json:6).  Lineage rows carry
per-partition row counts, an order-insensitive content checksum, and
wall time (T5 schema, SURVEY §1.2).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from kgforge.common.hashing import hash_u64

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


def _content_checksum(batch: pa.Table, cols: list[str]) -> int:
    """Order-insensitive u64: XOR of vectorized per-row hashes over the
    key columns (``pd.util.hash_pandas_object`` — C-speed siphash; the
    previous per-row blake2b Python loop dominated checkpoint time)."""
    if batch.num_rows == 0:
        return 0
    import pandas as pd

    df = batch.select(cols).to_pandas()
    h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
    return int(np.bitwise_xor.reduce(h))


def _partition_lineage(part_dir: str, stage: str, pid: int,
                       checksum_cols: list[str], input_rows: int,
                       wall: float) -> dict:
    tbl = pq.read_table(part_dir)
    return {
        "stage": stage, "partition_id": pid,
        "input_rows": input_rows, "output_rows": tbl.num_rows,
        "checksum": _content_checksum(tbl, checksum_cols),
        "wall_s": wall, "status": "complete",
    }


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
        """Materialize ``ds`` as this stage's checkpoint (atomic) and
        record per-partition lineage.  Returns a fresh Dataset reading
        the checkpoint (downstream consumers re-read from Parquet, so
        upstream lineage is never re-executed — this is both the resume
        point and the fan-out point for multi-consumer stages)."""
        t0 = time.monotonic()
        final = self.stage_dir(stage)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(tmp, exist_ok=True)
        ds.write_parquet(tmp, partition_cols=["pid"])
        if not any(e.startswith("pid=") for e in os.listdir(tmp)):
            # zero-row stage: persist an empty table so downstream reads
            # (and resume) still see the stage's schema
            arrow_schema = schema
            if arrow_schema is None:
                try:
                    arrow_schema = ds.schema().base_schema
                except Exception:
                    arrow_schema = pa.schema([("pid", pa.int32())])
            pq.write_table(arrow_schema.empty_table(),
                           os.path.join(tmp, "empty.parquet"))
        wall = time.monotonic() - t0
        # lineage per partition — one Ray task per pid dir (parallel
        # readback of the small per-pid fragments, vectorized checksum)
        import ray

        lineage_task = ray.remote(num_cpus=1)(_partition_lineage)
        refs = []
        for entry in sorted(os.listdir(tmp)):
            if not entry.startswith("pid="):
                continue
            pid = int(entry.split("=")[1])
            refs.append(lineage_task.remote(
                os.path.join(tmp, entry), stage, pid, checksum_cols,
                -1 if input_rows is None else input_rows, wall))
        rows = ray.get(refs)
        os.makedirs(os.path.join(self.root, "lineage"), exist_ok=True)
        pq.write_table(pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA),
                       os.path.join(self.root, "lineage", f"{stage}.parquet"))
        os.rename(tmp, final)
        with open(os.path.join(final, "_SUCCESS"), "w") as f:
            f.write(str(len(rows)))
        return self.read_stage(stage)

    def read_stage(self, stage: str):
        import ray.data as rd

        ds = rd.read_parquet(self.stage_dir(stage),
                             file_extensions=["parquet"])
        # hive partitioning surfaces `pid` as string — restore int32
        return ds.map_batches(_restore_pid, batch_format="pyarrow")

    def lineage(self) -> pa.Table:
        path = os.path.join(self.root, "lineage")
        tables = [pq.read_table(os.path.join(path, f))
                  for f in sorted(os.listdir(path))] if os.path.isdir(path) else []
        return pa.concat_tables(tables) if tables else \
            pa.Table.from_pylist([], schema=LINEAGE_SCHEMA)
