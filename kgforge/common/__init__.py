from kgforge.common.hashing import (
    hash_u64,
    hash_u64_bytes,
    hash_u64_np,
    span_sequence_hash,
    stable_partition_id,
)

__all__ = [
    "hash_u64",
    "hash_u64_bytes",
    "hash_u64_np",
    "span_sequence_hash",
    "stable_partition_id",
]
