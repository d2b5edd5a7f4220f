"""STM-style propagation network (reference: model/propagation/prop_net.py).

Functional, NHWC, flax.linen. The object axis K is a leading batch axis
throughout — the reference's per-object Python loop with batched=1
sub-batching (prop_net.py:172-176) becomes plain batching, which keeps
the MXU fed with one large matmul instead of K small ones.

API surface (exposed as linen methods, selected via `method=`):
  memorize(frame, masks)              -> (mem_k, mem_v)   per-object K/V
  get_query_values(frame)             -> (f16, f8, f4, k16, v16)
  segment_with_query(mem_k, mem_v, valid, f16, f8, f4, k16, v16) -> masks
  get_attention(mk16, pos_mask, neg_mask, qk16) -> 2-ch attention map
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mivos_tpu.models.layers import KeyValue, ResBlock, UpsampleBlock, conv3x3
from mivos_tpu.models.resnet import ResNet50
from mivos_tpu.ops.memory_read import (full_softmax_affinity,
                                       memory_read as _memory_read)
from mivos_tpu.ops.resize import area_downsample, bilinear_resize, upsample2x

KEY_DIM = 128
VAL_DIM = 512


class Decoder(nn.Module):
    """Refinement decoder: 1/16 -> 1/4 with skip connections, then 4x
    bilinear to full resolution (reference: prop_net.py:14-31).

    `width` scales every internal channel count (conv FLOPs scale with
    width^2). 1.0 is the reference architecture (required to load the
    published .pth checkpoints); 0.5 is an opt-in fast variant for nets
    trained from scratch — the decoder is ~60% of per-frame propagation
    FLOPs (PERF.md MFU table), so halving its channels is the single
    largest step-speed lever left on TPU."""

    dtype: Optional[str] = None
    width: float = 1.0

    @staticmethod
    def chan(n: int, width: float) -> int:
        """Width-scaled channel count (shared with the session's
        query-cache sizing, core/inference.py)."""
        return max(16, int(round(n * width)))

    def setup(self):
        c = lambda n: self.chan(n, self.width)  # noqa: E731
        self.compress = ResBlock(c(512), dtype=self.dtype)
        self.up_16_8 = UpsampleBlock(c(512), c(256), dtype=self.dtype)
        self.up_8_4 = UpsampleBlock(c(256), c(256), dtype=self.dtype)
        self.pred = conv3x3(1, dtype=self.dtype)

    def skips(self, f8: jax.Array, f4: jax.Array):
        """Object-independent skip towers, runnable once per frame (and
        batched over frames in the query pre-encode): the K-batched
        decode then calls __call__(..., preskip=True) with these.
        Exactly the same parameters/math as the inline path — a
        scheduling choice, not an architecture change."""
        return self.up_16_8.skip(f8), self.up_8_4.skip(f4)

    def __call__(self, f16: jax.Array, f8: jax.Array, f4: jax.Array,
                 preskip: bool = False) -> jax.Array:
        """f8/f4: encoder skip features — or, with preskip=True, the
        precomputed `skips(f8, f4)` outputs."""
        x = self.compress(f16)
        x = self.up_16_8(f8, x, preskip=preskip)
        x = self.up_8_4(f4, x, preskip=preskip)
        x = self.pred(nn.relu(x))
        x = x.astype(jnp.float32)
        h, w = x.shape[-3], x.shape[-2]
        return bilinear_resize(x, (h * 4, w * 4))


def compute_others(masks: jax.Array) -> jax.Array:
    """Sum of all *other* objects' masks (reference: prop_net.py:150-157).

    masks: (K, H, W, 1). For K==1 this is all zeros, matching the
    reference's explicit zero branch.
    """
    total = jnp.sum(masks, axis=0, keepdims=True)
    return total - masks


class PropagationNetwork(nn.Module):
    top_k: Optional[int] = 50
    km: Optional[float] = None
    # Memory-read backend: 'auto' = fused Pallas kernel on TPU,
    # approx_max_k XLA elsewhere; 'xla_exact' = sort-based exact top-k
    # (the parity oracle used in tests). See ops/memory_read.py.
    read_backend: str = "auto"
    # Pallas-backend exact-count threshold-refine passes (safety knob;
    # ops/pallas/memory_read.py). With the top-2-per-bin phase A the
    # bisected threshold already lands at the k-th affinity on real
    # encoder banks (mean readout err 2.2e-5, unchanged by refine —
    # scripts/refine_sweep.py), so the default is 0; each pass costs
    # ~0.9 ms at M~21k and exists for adversarial spectra where
    # 3+-bin-collisions leave residual slack. Ignored by the XLA
    # backends and the sharded-bank path.
    read_refine: int = 0
    # Compute dtype for the conv towers ('bfloat16' for production TPU
    # inference; params and the affinity softmax stay fp32). The memory
    # bank inherits this dtype, halving its HBM traffic.
    dtype: Optional[str] = None
    # Decoder channel-width multiplier. 1.0 = the reference decoder
    # (prop_net.py:14-31; REQUIRED for loading the published .pth
    # weights via checkpoint/convert.py). <1.0 is an opt-in fast
    # variant for from-scratch training: the decoder is the largest
    # per-frame FLOP consumer (~60%, PERF.md), and conv cost scales
    # with dec_width^2.
    dec_width: float = 1.0
    # Distributed bank (SURVEY.md section 5.7): when set, mem_k/mem_v
    # arrive with their position axis sharded over `bank_axis` of this
    # mesh and the read runs as the exact O(query)-communication
    # shard_map (parallel/sharded_memory.py) instead of `read_backend`.
    # Static module attributes: jax.sharding.Mesh is hashable, so jitted
    # step caches stay keyed per configuration.
    bank_mesh: Optional[object] = None
    bank_axis: str = "data"
    # Object-parallel inference (MemoryConfig.object_sharded): when set,
    # sharding constraints pin the K-batched heavy tensors (memorize
    # encoder input, read output, decoder input) to `object_axis` of
    # this mesh, so GSPMD keeps each chip on its own objects through the
    # per-frame step and only the O(K x H x W) aggregate/argmax reduces
    # cross objects. The memory read runs as a per-object shard_map
    # (parallel/sharded_memory.object_sharded_memory_read) so the fused
    # Pallas kernel stays usable per shard — GSPMD alone would
    # all-gather around the unpartitionable custom call.
    object_mesh: Optional[object] = None
    object_axis: str = "object"

    @property
    def bank_object_axis(self):
        """Object axis of the sharded-bank shard_maps when the 2D
        (object x position) layout is active — i.e. when bank_mesh and
        object_mesh are both set (they are then the same Mesh)."""
        if self.bank_mesh is not None and self.object_mesh is not None:
            return self.object_axis
        return None

    def _obj(self, x: jax.Array) -> jax.Array:
        """Constrain a K-leading tensor to the object axis (identity
        when object_mesh is unset)."""
        if self.object_mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.object_axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.object_mesh, spec))

    def setup(self):
        # 5-channel (RGB + this mask + others mask) memory encoder; the
        # mod_resnet flavor uses biased convs (mod_resnet.py:119).
        self.mask_rgb_encoder = ResNet50(in_chans=5, num_stages=3,
                                         conv_bias=True, dtype=self.dtype,
                                         name="mask_rgb_encoder")
        self.rgb_encoder = ResNet50(in_chans=3, num_stages=3, conv_bias=False,
                                    dtype=self.dtype, name="rgb_encoder")
        self.kv_m_f16 = KeyValue(KEY_DIM, VAL_DIM, dtype=self.dtype,
                                 name="kv_m_f16")
        self.kv_q_f16 = KeyValue(KEY_DIM, VAL_DIM, dtype=self.dtype,
                                 name="kv_q_f16")
        self.decoder = Decoder(dtype=self.dtype, width=self.dec_width,
                               name="decoder")

    def memorize(self, frame: jax.Array, masks: jax.Array):
        """frame: (H, W, 3); masks: (K, H, W, 1) soft per-object masks.

        Returns flattened (K, N, CK) keys and (K, N, CV) values with
        N = H/16 * W/16 — bank-ready layout (reference returns
        K x C x 1 x H/16 x W/16, prop_net.py:144-162).
        """
        k = masks.shape[0]
        frames = jnp.broadcast_to(frame[None], (k,) + frame.shape)
        others = compute_others(masks)
        x = jnp.concatenate([frames, masks, others], axis=-1)  # (K, H, W, 5)
        x = self._obj(x)  # keep the 5-ch tower object-parallel
        f16, _, _ = self.mask_rgb_encoder(x)
        k16, v16 = self.kv_m_f16(f16)
        n = k16.shape[1] * k16.shape[2]
        return (self._obj(k16.reshape(k, n, KEY_DIM)),
                self._obj(v16.reshape(k, n, VAL_DIM)))

    def get_query_values(self, frame: jax.Array):
        """frame: (H, W, 3) -> pyramid + query key/value (all batch-1)."""
        f16, f8, f4 = self.rgb_encoder(frame[None])
        k16, v16 = self.kv_q_f16(f16)
        return f16, f8, f4, k16, v16

    def get_query_values_batched(self, frames: jax.Array):
        """frames: (B, H, W, 3) -> (skip8, skip4, k16, v16) query-cache
        features for B frames at once. Query frames are independent, so
        their conv towers run at batch B — far better MXU utilization
        than B batch-1 calls inside the propagation scan (reference
        buffers the raw features per frame, prop_net.py:164-168).

        The cache holds the decoder's PRE-COMPUTED skip towers
        (decoder.skips) rather than raw f8/f4: those towers are
        object-independent (~122 GFLOP/frame at 480p), so running them
        here moves them from batch-1 inside the scan body to this
        batch-B dispatch — same parameters, same math, same cache bytes
        at width 1.0 (skip8/f8 are both 512-ch, skip4/f4 both 256-ch);
        the scan then decodes with preskip=True."""
        f16, f8, f4 = self.rgb_encoder(frames)
        k16, v16 = self.kv_q_f16(f16)
        skip8, skip4 = self.decoder.skips(f8, f4)
        return skip8, skip4, k16, v16

    def query_skips(self, f8: jax.Array, f4: jax.Array):
        """Decoder skip towers over raw encoder features — the batch-1
        counterpart of what get_query_values_batched caches (used by
        parity tests and any path that staged raw f8/f4)."""
        return self.decoder.skips(f8, f4)

    def segment_with_query(self, mem_k, mem_v, valid, f16, f8, f4, k16,
                           v16, preskip: bool = False):
        """Memory read + decode (reference: prop_net.py:164-181).

        mem_k/mem_v: (K, M, C) bucketed bank; valid: (M,) bool.
        k16/v16/f8/f4: batch-1 query tensors from get_query_values —
        with preskip=True, f8/f4 are instead the precomputed decoder
        skip towers (skip8/skip4 from get_query_values_batched).
        Returns (K, H, W, 1) per-object sigmoid probabilities.
        """
        return jax.nn.sigmoid(self.segment_logits(mem_k, mem_v, valid, f16,
                                                  f8, f4, k16, v16,
                                                  preskip=preskip))

    def segment_logits(self, mem_k, mem_v, valid, f16, f8, f4, k16, v16,
                       preskip: bool = False):
        """segment_with_query before the sigmoid — the numerically-stable
        target for training losses (synthetic pretraining, train/pretrain.py;
        the reference trains its propagation net in a sibling repo)."""
        k = mem_k.shape[0]
        _, h16, w16, _ = k16.shape
        qk = k16.reshape(h16 * w16, KEY_DIM)
        if self.bank_mesh is not None:
            from mivos_tpu.parallel.sharded_memory import sharded_memory_read

            assert self.km is None, "km unsupported with a sharded bank"
            readout = sharded_memory_read(
                self.bank_mesh, mem_k, mem_v, qk,
                top_k=self.top_k if self.top_k is not None
                else mem_k.shape[1],
                valid=valid, axis=self.bank_axis,
                object_axis=self.bank_object_axis)
        elif self.object_mesh is not None:
            # Per-object manual read: shard_map keeps the fused Pallas
            # kernel usable per shard (GSPMD would all-gather around the
            # unpartitionable custom call). Zero collectives — reads are
            # object-independent.
            from mivos_tpu.parallel.sharded_memory import (
                object_sharded_memory_read)

            readout = object_sharded_memory_read(
                self.object_mesh, mem_k, mem_v, qk, top_k=self.top_k,
                valid=valid, axis=self.object_axis, km=self.km,
                query_hw=(h16, w16), backend=self.read_backend,
                n_refine=self.read_refine)
        else:
            readout = _memory_read(self._obj(mem_k), self._obj(mem_v), qk,
                                   top_k=self.top_k,
                                   valid=valid, km=self.km,
                                   query_hw=(h16, w16),
                                   backend=self.read_backend,
                                   n_refine=self.read_refine)
        readout = self._obj(readout.reshape(k, h16, w16, VAL_DIM))
        qv = jnp.broadcast_to(v16, (k,) + v16.shape[1:])
        m4 = self._obj(jnp.concatenate([readout, qv], axis=-1))
        # f8/f4 stay batch-1: the decoder's skip towers are
        # object-independent, so they run ONCE and broadcast at the
        # residual add (the reference recomputes them per object via its
        # batched=1 loop, prop_net.py:172-176 — ~2x decoder FLOPs saved
        # at K=3). With preskip=True they were already computed in the
        # batched query pre-encode and f8/f4 are the tower outputs.
        return self.decoder(m4, f8, f4, preskip=preskip)

    def get_attention(self, mk16, pos_mask, neg_mask, qk16):
        """Difference-aware attention read (reference: prop_net.py:183-200).

        mk16: (K, N, CK) memory keys of the interacted frame (T=1).
        pos_mask/neg_mask: (K, H, W, 1) mask-change maps.
        qk16: (1, h16, w16, CK) query key of the current frame.
        Returns (K, H, W, 2) upsampled [pos, neg] attention maps.
        """
        k, h, w, _ = pos_mask.shape
        h16, w16 = h // 16, w // 16
        qk = qk16.reshape(h16 * w16, KEY_DIM)
        aff = full_softmax_affinity(self._obj(mk16), qk)  # (K, M, N) softmax over M
        pos = area_downsample(pos_mask, 16).reshape(k, 1, h16 * w16)
        neg = area_downsample(neg_mask, 16).reshape(k, 1, h16 * w16)
        pos_map = jnp.einsum("kom,kmn->kon", pos, aff,
                             preferred_element_type=jnp.float32)
        neg_map = jnp.einsum("kom,kmn->kon", neg, aff,
                             preferred_element_type=jnp.float32)
        attn = jnp.concatenate([pos_map, neg_map], axis=1)  # (K, 2, N)
        attn = attn.reshape(k, 2, h16, w16).transpose(0, 2, 3, 1)
        return bilinear_resize(attn, (h, w))

    def __call__(self, frame, masks, query_frame):
        """Combined one-step path used for init and the graft entry:
        memorize `frame`+`masks`, then segment `query_frame` against it."""
        mem_k, mem_v = self.memorize(frame, masks)
        valid = jnp.ones((mem_k.shape[1],), dtype=bool)
        f16, f8, f4, k16, v16 = self.get_query_values(query_frame)
        out = self.segment_with_query(mem_k, mem_v, valid, f16, f8, f4, k16, v16)
        # Touch the attention branch so a single init() creates all params.
        attn = self.get_attention(mem_k, masks, masks, k16)
        return out, attn
