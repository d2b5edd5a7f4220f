"""Compute ops: aggregation, memory reads (XLA + Pallas), distance
maps (XLA + native), resizes, SyncBN, on-device L-BFGS."""
from mivos_tpu.ops.aggregate import (aggregate_sbg, aggregate_wbg,
                                     aggregate_wbg_channel,
                                     aggregate_wbg_last)
from mivos_tpu.ops.distmaps import dist_maps, pad_points
from mivos_tpu.ops.memory_read import full_softmax_affinity, memory_read

__all__ = [
    "aggregate_sbg", "aggregate_wbg", "aggregate_wbg_channel",
    "aggregate_wbg_last", "dist_maps", "full_softmax_affinity",
    "memory_read", "pad_points",
]
