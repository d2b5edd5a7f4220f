"""Mass-produce propagated probability maps for fusion training.

Reference: generation/fusion_generator.py — a stripped InferenceCore
(no fusion, no host-offload buffers) that propagates a GT mask placed
on one frame across a [left_limit, right_limit] window and keeps the
per-frame aggregated probabilities.

Reuses the session's jitted step functions (core/inference.py), so the
XLA executables are shared with interactive inference.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.core.inference import build_step_fns
from mivos_tpu.core.memory_bank import MemoryBank
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.utils.tensor import dev_i32, pad_divide_by


class FusionGenerator:
    def __init__(self, prop_net: PropagationNetwork, prop_params,
                 images, mem_freq: int = 5):
        """images: (T, h, w, 3) normalized, UNPADDED."""
        if prop_net.dtype == "bfloat16":
            from mivos_tpu.utils.tensor import cast_params_bf16

            prop_params = cast_params_bf16(prop_params)
        self.prop_net, self.prop_params = prop_net, prop_params
        self.mem_freq = mem_freq
        (self.query_fn, self.memorize_fn, self.propagate_step,
         *_rest) = build_step_fns(prop_net, None)

        images = jnp.asarray(images)
        self.t, self.h, self.w = images.shape[:3]
        self.images, self.pad = pad_divide_by(images, 16)
        self.nh, self.nw = self.images.shape[1:3]
        self.n16 = (self.nh // 16) * (self.nw // 16)
        self.k = 0
        self.prob: List[Optional[jax.Array]] = []

    def reset(self, k: int) -> None:
        """New object count (reference fusion_generator.py:33-35)."""
        self.k = k
        self.prob = [None] * self.t
        # Bank dtype follows the compute dtype (memorize emits it),
        # exactly like InferenceCore's bank.
        bank_dtype = jnp.bfloat16 if self.prop_net.dtype == "bfloat16" \
            else jnp.float32
        self.bank = MemoryBank(k, self.n16, dtype=bank_dtype)

    def _do_pass(self, idx: int, limit: int, forward: bool) -> None:
        if forward:
            this_range = range(idx + 1, limit + 1)
            dist = limit - idx
        else:
            this_range = range(idx - 1, limit - 1, -1)
            dist = idx - limit
        if dist <= 0:
            return
        total_m = (dist - 1) // self.mem_freq + 1 + 1
        key_k, key_v = self.memorize_fn(
            self.prop_params, self.images[idx],
            self.prob[idx][1:])
        self.bank.reset(total_m, key_k, key_v)
        m_front = 1
        last_ti = idx
        prev_in_mem = True

        for ti in this_range:
            rows = self.bank.valid_rows(include_transient=not prev_in_mem)
            write_row = dev_i32(m_front * self.n16)
            q = self.query_fn(self.prop_params, self.images[ti])
            agg, self.bank.keys, self.bank.values = self.propagate_step(
                self.prop_params, self.bank.keys, self.bank.values,
                rows, write_row, self.images[ti], *q)
            if ti != (this_range[-1]):
                if abs(ti - last_ti) >= self.mem_freq:
                    m_front += 1
                    self.bank.num_slots = m_front
                    last_ti = ti
                    prev_in_mem = True
                else:
                    prev_in_mem = False
            self.prob[ti] = agg

    def interact_mask(self, mask, idx: int, left_limit: int,
                      right_limit: int) -> np.ndarray:
        """mask: (K, h, w, 1) hard GT masks on the raw grid. Returns
        (K+1, T, h, w) float probabilities over [left, right]
        (reference fusion_generator.py:82-101)."""
        mask = jnp.asarray(mask)
        mask, _ = pad_divide_by(mask, 16)
        bg = jnp.clip(1.0 - mask.sum(axis=0, keepdims=True), 0.0, 1.0)
        self.prob[idx] = jnp.concatenate([bg, mask], axis=0)

        self._do_pass(idx, right_limit, forward=True)
        self._do_pass(idx, left_limit, forward=False)

        lw, uw, lh, uh = self.pad
        out = np.zeros((self.k + 1, self.t, self.h, self.w), np.float32)
        touched = [ti for ti in range(self.t) if self.prob[ti] is not None]
        stacked = np.asarray(jnp.stack([self.prob[ti] for ti in touched]))
        stacked = stacked[..., 0][:, :, lh:self.nh - uh, lw:self.nw - uw]
        for i, ti in enumerate(touched):
            out[:, ti] = stacked[i]
        return out
