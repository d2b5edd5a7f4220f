"""Metric accumulation across iterations with derived-metric hooks.

Reference: util/log_integrator.py. Values whose key starts with 'hide'
are accumulated but not logged — hooks read them to derive metrics
(e.g. IoU from hidden intersection/union sums, model/losses.py:8-17).

The reference mean-reduces to rank 0 with torch.distributed.reduce
(:69-76); here cross-process reduction uses
jax.multihost_utils.process_allreduce semantics via a psum over hosts —
on a single process it is a no-op.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

Hook = Callable[[Dict[str, float]], Tuple[str, float]]


def _cross_host_mean(values: Dict[str, float]) -> Dict[str, float]:
    import jax

    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    keys = sorted(values)
    arr = np.asarray([values[k] for k in keys], np.float32)
    total = multihost_utils.process_allgather(arr)  # (hosts, n)
    mean = np.asarray(total).mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}


class Integrator:
    def __init__(self, logger, distributed: bool = True,
                 is_main: bool = True):
        self.values: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.hooks: List[Hook] = []
        self.logger = logger
        self.distributed = distributed
        self.is_main = is_main

    def add_tensor(self, key: str, value) -> None:
        v = float(np.asarray(value).mean())
        if key not in self.values:
            self.values[key] = v
            self.counts[key] = 1
        else:
            self.values[key] += v
            self.counts[key] += 1

    def add_dict(self, d: Dict) -> None:
        for k, v in d.items():
            self.add_tensor(k, v)

    def add_hook(self, hook) -> None:
        if isinstance(hook, list):
            self.hooks.extend(hook)
        else:
            self.hooks.append(hook)

    def reset_except_hooks(self) -> None:
        self.values = {}
        self.counts = {}

    def finalize(self, prefix: str, it: int, f=None) -> Dict[str, float]:
        for hook in self.hooks:
            k, v = hook(self.values)
            self.add_tensor(k, v)

        avgs = {k: v / self.counts[k] for k, v in self.values.items()}
        if self.distributed:
            avgs = _cross_host_mean(avgs)
        out = {}
        for k, avg in avgs.items():
            if k.startswith("hide"):
                continue
            out[k] = avg
            if self.is_main and self.logger is not None:
                self.logger.log_metrics(prefix, k, avg, it, f)
        return out
