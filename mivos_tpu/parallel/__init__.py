"""Parallelism: device mesh/sharding helpers and the bank-sharded
memory read (SURVEY.md §2.8, §5.7)."""
from mivos_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                     maybe_initialize_distributed,
                                     replicated)
from mivos_tpu.parallel.sharded_memory import (shard_bank,
                                               sharded_memory_read)

__all__ = ["batch_sharding", "make_mesh", "maybe_initialize_distributed",
           "replicated", "shard_bank", "sharded_memory_read"]
