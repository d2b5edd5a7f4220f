"""Compiled-cost accounting for sharded programs.

A compiled XLA executable exposes a per-device cost model
(`compiled.cost_analysis()`: FLOPs, bytes accessed — under SPMD these
are PER-DEVICE figures) and the optimized HLO (`compiled.as_text()`),
where every byte of cross-device traffic appears as a collective op
with a static shape. These helpers turn both into numbers so the
scaling claims in config.py can be ASSERTED instead of asserted-in-a-
comment: object_sharded splits per-frame compute ~K/D per device with
only O(K*H*W) cross-object collectives, and bank_sharded reads move
O(query) bytes independent of bank length (tests/test_sharding_costs.py,
PERF.md "sharding cost evidence"). Real multi-chip latency cannot be
measured in a single-chip sandbox; the compiled cost model is the
honest substitute. The reference has no distributed inference at all
(reference inference_core.py:36).
"""
from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}

# Collective HLO opcodes (plus their async -start halves; -done ops are
# skipped so async collectives are not double-counted).
_COLLECTIVE_RE = re.compile(
    r"=\s*(.+?)\s+"
    r"(all-gather|all-reduce|all-to-all|collective-permute|reduce-scatter)"
    r"(-start)?\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")


def _shape_bytes(shapes: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shapes):
        if dtype not in _DTYPE_BYTES:
            continue  # layout/annotation tokens, e.g. metadata ids
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_bytes(compiled) -> Dict[str, int]:
    """Per-opcode output bytes of every collective in the optimized HLO.

    The output shape of an all-gather is the full gathered buffer each
    device receives; for an all-reduce it equals the reduced buffer —
    both are the per-device wire-volume proxy XLA's own cost tables
    use. Returns {} for a collective-free program.
    """
    out: Dict[str, int] = {}
    for line in compiled.as_text().splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        out[op] = out.get(op, 0) + _shape_bytes(shapes)
    return out


def compiled_flops(compiled) -> float:
    """Per-device FLOPs from the executable's cost model."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])
