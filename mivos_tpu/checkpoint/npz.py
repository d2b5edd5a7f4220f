"""Single-file .npz weight snapshots.

Orbax (checkpoint/manager.py) is the full training-resume store; these
helpers cover the lighter "ship one weights file" case (synthetic
pretraining artifacts, converted-checkpoint caches) with zero
dependencies — the flax param tree is flattened to '/'-joined keys.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_tree(v, path))
        else:
            flat[path] = np.asarray(v)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path: str, params: Dict) -> None:
    np.savez_compressed(path, **flatten_tree(params))


def load_params_npz(path: str) -> Dict:
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})
