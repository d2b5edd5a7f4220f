"""Interactive inference session: interact -> bidirectional propagate -> fuse.

TPU-native rework of the reference InferenceCore (inference_core.py).
The per-frame loop stays in Python (it is ~100 iterations of jitted
steps; the mem_freq commit logic is host-side integer math), while all
tensor work happens in three jitted functions shared process-wide per
(network, shape-bucket):

  query_fn       frame -> (f16, f8, f4, k16, v16)          [cached per frame]
  propagate_step bank + query -> aggregated probs + bank write (donated)
  fuse_step      difference-aware fusion of old vs new probabilities

State layout differences from the reference (by design, not translation):
  * memory bank is a bucketed fixed-capacity array + scalar liveness
    (see core/memory_bank.py) instead of exact-size torch.empty;
  * per-frame probabilities are a host list of (K+1, H, W, 1) device
    arrays instead of one (K+1, T, 1, H, W) tensor — no O(T) copy per
    frame write, and host-offload (mem_profile) becomes a device_get of
    list entries;
  * the object axis K is batched through the whole step (the reference
    loops objects one at a time, prop_net.py:172-176).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.memory_bank import MemoryBank
from mivos_tpu.ops.label_codec import (decode_chunk, decode_frame,
                                       default_cap, encode_blocks,
                                       pack_labels as _pack_labels,
                                       unpack_labels as _unpack_labels)
from mivos_tpu.models.fusion import FusionNet
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.ops.aggregate import aggregate_wbg
from mivos_tpu.utils.tensor import (cast_params_bf16, dev_f32_pair, dev_i32,
                                    dev_i32_seq, next_bucket, pad_divide_by,
                                    time_buckets)

Query = Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]


def _label_bits(num_classes: int) -> int:
    """Bit-width for packed label downloads: the host link runs at tens
    of MB/s, so labels ship at the information rate of the class count —
    1 bit for K=1, 2 bits for K<=3, 4 bits for K<=15 (0 = unpackable).
    Padded widths are /16 so every 8//bits pixels-per-byte split fits."""
    if num_classes <= 2:
        return 1
    if num_classes <= 4:
        return 2
    if num_classes <= 16:
        return 4
    return 0


def _normalize_frames_impl(x: jax.Array) -> jax.Array:
    """uint8 RGB -> ImageNet-normalized float32, ON DEVICE. Sessions
    accept raw uint8 frames so the host->device upload ships 1 byte per
    channel instead of 4, and device-resident videos STAY uint8 in HBM
    (4x less frame memory than fp32) — the scan body normalizes each
    gathered frame in-flight (the decoded-frame preprocessing fuses
    into the device pipeline; the reference normalizes in PIL/cv2 on
    host)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    return (x.astype(jnp.float32) / 255.0 - mean) / std


_normalize_frames = jax.jit(_normalize_frames_impl)
_norm_masked = jax.jit(lambda x, m: _normalize_frames_impl(x) * m)


@functools.lru_cache(maxsize=8)
def build_step_fns(prop_net: PropagationNetwork, fuse_net: Optional[FusionNet]):
    """Jitted step functions, cached per network config so the XLA
    compile cache is shared across videos/sessions."""

    query_fn = jax.jit(
        lambda p, image: prop_net.apply(p, image, method="get_query_values"))

    memorize_fn = jax.jit(
        lambda p, image, masks: prop_net.apply(p, image, masks,
                                               method="memorize"))

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def propagate_step(p, bank_k, bank_v, num_valid_rows, write_row,
                       image, f16, f8, f4, k16, v16):
        valid = jnp.arange(bank_k.shape[1]) < num_valid_rows
        out = prop_net.apply(p, bank_k, bank_v, valid, f16, f8, f4, k16, v16,
                             method="segment_with_query")
        agg = aggregate_wbg(out, keep_bg=True)  # (K+1, H, W, 1)
        mk, mv = prop_net.apply(p, image, agg[1:], method="memorize")
        if prop_net.bank_mesh is not None:
            from mivos_tpu.parallel.sharded_memory import sharded_bank_write

            bank_k = sharded_bank_write(prop_net.bank_mesh, bank_k, mk,
                                        write_row, prop_net.bank_axis,
                                        prop_net.bank_object_axis)
            bank_v = sharded_bank_write(prop_net.bank_mesh, bank_v, mv,
                                        write_row, prop_net.bank_axis,
                                        prop_net.bank_object_axis)
        else:
            bank_k = jax.lax.dynamic_update_slice(bank_k, mk,
                                                  (0, write_row, 0))
            bank_v = jax.lax.dynamic_update_slice(bank_v, mv,
                                                  (0, write_row, 0))
        return agg, bank_k, bank_v

    fuse_step = None
    if fuse_net is not None:
        @jax.jit
        def fuse_step(p, fp, image, prev_prob, curr_prob, mk16_int,
                      pos_diff, neg_diff, qk16, dist):
            """Difference-aware fusion of one frame
            (reference inference_core.py:202-217), batched over objects."""
            k = prev_prob.shape[0] - 1
            attn = prop_net.apply(p, mk16_int, pos_diff, neg_diff, qk16,
                                  method="get_attention")
            im = jnp.broadcast_to(image[None], (k,) + image.shape)
            logits = fuse_net.apply(fp, im, prev_prob[1:], curr_prob[1:],
                                    attn, dist)
            w = jax.nn.sigmoid(logits)
            return aggregate_wbg(w, keep_bg=True)

    # Fused gather + batch-encode + cache-write: ONE dispatch per
    # window (dispatch latency through the tunnel is on par with the
    # encoder compute it schedules, so take/encode/write as separate
    # calls eat the batching win). Batch-B conv towers vs the scan's
    # batch-1: measured ~2.1s of a 4.0s 299-frame compute round is
    # query encoding. The window is always a FULL B consecutive frames
    # starting at `start` (the caller aligns it, re-encoding up to B-1
    # already-cached neighbours rather than specializing on a tail
    # length — a static tail length would recompile the whole conv
    # tower per distinct value), so one executable serves every pass.
    @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def query_encode_write_fn(p, c0, c1, c2, c3, images_full, fidx,
                              start, pad_mask):
        frames = jnp.take(images_full, fidx, axis=0)
        if frames.dtype == jnp.uint8:
            frames = _normalize_frames_impl(frames) * pad_mask
        qs = prop_net.apply(p, frames,
                            method="get_query_values_batched")

        def upd(cache, q):
            return jax.lax.dynamic_update_slice(
                cache, q[:, None], (start, 0, 0, 0, 0))

        return tuple(upd(c, q) for c, q in zip((c0, c1, c2, c3), qs))

    argmax_fn = jax.jit(lambda prob: jnp.argmax(prob[..., 0], axis=0)
                        .astype(jnp.uint8))

    # Batched over frames: (F, K+1, H, W, 1) -> (F, H, W). One dispatch +
    # one host transfer per interaction round instead of one per frame —
    # per-transfer latency dominates wall time on remote-attached TPUs.
    argmax_batch_fn = jax.jit(lambda probs: jnp.argmax(probs[..., 0], axis=1)
                              .astype(jnp.uint8))

    # Adaptive-width label packing (1/2/4 bits by class count — the
    # label fetch is a first-order cost of every interaction round, see
    # _label_bits). Class count is static under jit, so the width bakes
    # into the executable.
    @jax.jit
    def argmax_pack_fn(probs):
        lab = jnp.argmax(probs[..., 0], axis=1).astype(jnp.uint8)
        return _pack_labels(lab, _label_bits(probs.shape[1]))

    return (query_fn, memorize_fn, propagate_step, fuse_step, argmax_fn,
            argmax_batch_fn, argmax_pack_fn, query_encode_write_fn)


@functools.lru_cache(maxsize=8)
def build_scan_pass(prop_net: PropagationNetwork,
                    fuse_net: Optional[FusionNet]):
    """Whole-pass propagation as ONE jitted lax.scan.

    The per-frame Python loop costs 3-4 dispatches/frame; on
    remote-attached TPUs dispatch+transfer latency dominates the actual
    compute several-fold. The mem_freq commit schedule
    (reference inference_core.py:166-186) is deterministic given the
    pass range, so it is precomputed host-side into per-step row
    arrays and the entire pass — query encode, memory read, decode,
    aggregate, (optional) difference-aware fusion, memorize, bank
    write — compiles into one XLA while-loop. Pass lengths are bucketed
    (padded steps write to a scratch slot) and frame inputs are gathered
    from the full time-bucketed device stacks by per-step index, so the
    executable is keyed by (chunk bucket, time bucket, qmode, fuse) and
    reused across videos and rounds with zero per-chunk staging
    dispatches.
    """

    def body_fn(params, fuse_params, key_k, pos_diff, neg_diff, do_fuse,
                qmode, img_gather, images_full, q_full, pad_mask, carry, xs):
        bank_k, bank_v = carry
        rows, wrow = xs["rows"], xs["wrow"]
        # Frame inputs are GATHERED from the full device-resident stacks
        # by per-step index — host-side per-chunk slicing costs ~a dozen
        # dispatches per chunk through the tunnel, which measured 2.7x
        # slower than recomputing the features (long_video_bench).
        if img_gather:
            image = jax.lax.dynamic_index_in_dim(
                images_full, xs["fidx"], 0, keepdims=False)
        else:
            image = xs["image"]     # host-offloaded video: staged chunk
        if image.dtype == jnp.uint8:
            # Normalize in-flight; the pad mask re-zeroes the /16
            # padding band (float videos pad AFTER normalization, so
            # their pad is 0.0 — normalize(0) is not).
            image = _normalize_frames_impl(image) * pad_mask
        valid = jnp.arange(bank_k.shape[1]) < rows
        if qmode == "cached":
            # The cache holds the decoder's PRECOMPUTED skip towers
            # (batch-B in the pre-encode) in the f8/f4 slots; the decode
            # runs with preskip=True.
            f8, f4, k16, v16 = (jax.lax.dynamic_index_in_dim(
                q, xs["fidx"], 0, keepdims=False) for q in q_full)
            f16 = k16  # unused by segment_with_query
        else:
            f16, f8, f4, k16, v16 = prop_net.apply(
                params, image, method="get_query_values")
        out = prop_net.apply(params, bank_k, bank_v, valid, f16, f8, f4,
                             k16, v16, preskip=(qmode == "cached"),
                             method="segment_with_query")
        agg = aggregate_wbg(out, keep_bg=True)
        # Memorize the PRE-fusion aggregate: the reference commits memory
        # before fuse_one_frame runs (inference_core.py:178 vs :190-194),
        # and the per-frame path above does the same (propagate_step
        # memorizes inside the step; fusion is applied after). Fusion only
        # affects the emitted probabilities, never the bank contents.
        mk, mv = prop_net.apply(params, image, agg[1:], method="memorize")
        if prop_net.bank_mesh is not None:
            from mivos_tpu.parallel.sharded_memory import sharded_bank_write

            bank_k = sharded_bank_write(prop_net.bank_mesh, bank_k, mk,
                                        wrow, prop_net.bank_axis,
                                        prop_net.bank_object_axis)
            bank_v = sharded_bank_write(prop_net.bank_mesh, bank_v, mv,
                                        wrow, prop_net.bank_axis,
                                        prop_net.bank_object_axis)
        else:
            bank_k = jax.lax.dynamic_update_slice(bank_k, mk, (0, wrow, 0))
            bank_v = jax.lax.dynamic_update_slice(bank_v, mv, (0, wrow, 0))
        if do_fuse:
            k = agg.shape[0] - 1
            attn = prop_net.apply(params, key_k, pos_diff, neg_diff, k16,
                                  method="get_attention")
            im = jnp.broadcast_to(image[None], (k,) + image.shape)
            logits = fuse_net.apply(fuse_params, im, xs["prev_prob"][1:],
                                    agg[1:], attn, xs["dist"])
            agg = aggregate_wbg(jax.nn.sigmoid(logits), keep_bg=True)
        return (bank_k, bank_v), agg

    @functools.partial(jax.jit,
                       static_argnames=("do_fuse", "qmode", "img_gather",
                                        "codec", "block_cap"),
                       donate_argnums=(2, 3))
    def scan_pass(params, fuse_params, bank_k, bank_v, images_f, fidx_f,
                  rows_f, wrow_f, prev_probs_f, dist_f, key_k, pos_diff,
                  neg_diff, queries_f, pad_mask_f, do_fuse: bool,
                  qmode: str = "compute", img_gather: bool = True,
                  codec: str = "packed", block_cap: int = 0):
        """images_f: the FULL (T_bucket, ...) device video when
        img_gather (indexed per step via fidx_f), else a staged
        (chunk, ...) stack. queries_f: full (T_bucket, ...) query-cache
        arrays when qmode == 'cached'."""
        xs = {"fidx": fidx_f, "rows": rows_f, "wrow": wrow_f}
        if not img_gather:
            xs["image"] = images_f
        if do_fuse:
            xs["prev_prob"] = prev_probs_f
            xs["dist"] = dist_f
        body = functools.partial(body_fn, params, fuse_params, key_k,
                                 pos_diff, neg_diff, do_fuse, qmode,
                                 img_gather,
                                 images_f if img_gather else None,
                                 queries_f if qmode == "cached" else None,
                                 pad_mask_f)
        (bank_k, bank_v), probs = jax.lax.scan(
            body, (bank_k, bank_v), xs)
        # Label maps ship back to the host per chunk so the download
        # overlaps the next chunk's compute — block-sparse by default
        # (ops/label_codec.py, ~7-12x fewer bytes on segmentation
        # content), dense 1/2/4-bit adaptive packing otherwise.
        lab = jnp.argmax(probs[..., 0], axis=1).astype(jnp.uint8)
        bits = _label_bits(probs.shape[1])
        if codec == "block" and bits:
            packed = encode_blocks(lab, bits, block_cap)
        elif bits:
            packed = _pack_labels(lab, bits)
        else:
            packed = lab
        return bank_k, bank_v, probs, packed

    return scan_pass


class InferenceCore:
    """One interactive session over one video.

    images: (T, H, W, 3) float32, ImageNet-normalized, UNPADDED (numpy or
    jax array).
    """

    def __init__(self, prop_net: PropagationNetwork, prop_params,
                 fuse_net: Optional[FusionNet], fuse_params,
                 images, num_objects: int,
                 mem: MemoryConfig = MemoryConfig(), mesh=None):
        """mesh: jax.sharding.Mesh, required when mem.bank_sharded (the
        session keeps the memory bank's position axis sharded over
        mem.bank_axis — exact sequence-parallel reads, SURVEY.md §5.7)
        or when mem.object_sharded (the object axis K is sharded over
        mem.object_axis — per-frame latency scaling, see MemoryConfig)."""
        # MemoryConfig is the single source of truth for the read knobs:
        # top_k and km on the network are cloned to match, so callers
        # configure the memory read in exactly one place (the params are
        # read-time-only attributes — cloning never touches weights).
        if mem.bank_sharded:
            if mesh is None:
                raise ValueError("bank_sharded=True requires a mesh")
            if mem.bank_axis not in mesh.axis_names:
                raise ValueError(
                    f"bank_sharded needs axis {mem.bank_axis!r} in the "
                    f"mesh (axes: {mesh.axis_names}); combining with "
                    f"object_sharded takes a 2D mesh with both axes")
            if mem.mem_profile != 0:
                raise ValueError("bank_sharded requires mem_profile=0 "
                                 "(device-resident scan path)")
        if mem.object_sharded:
            if mesh is None:
                raise ValueError("object_sharded=True requires a mesh")
            if mem.object_axis not in mesh.axis_names:
                raise ValueError(
                    f"object_sharded needs axis {mem.object_axis!r} in the "
                    f"mesh (axes: {mesh.axis_names}); combining with "
                    f"bank_sharded takes a 2D mesh with both axes")
            if num_objects % mesh.shape[mem.object_axis] != 0:
                raise ValueError(
                    f"object_sharded needs num_objects divisible by the "
                    f"'{mem.object_axis}' axis size "
                    f"({num_objects} % {mesh.shape[mem.object_axis]} != 0) "
                    f"— size the object mesh axis to a divisor of K")
        bank_mesh = mesh if mem.bank_sharded else None
        obj_mesh = mesh if mem.object_sharded else None
        desired = (mem.top_k, mem.km, bank_mesh,
                   mem.bank_axis if mem.bank_sharded else prop_net.bank_axis,
                   obj_mesh,
                   mem.object_axis if mem.object_sharded
                   else prop_net.object_axis)
        if desired != (prop_net.top_k, prop_net.km, prop_net.bank_mesh,
                       prop_net.bank_axis, prop_net.object_mesh,
                       prop_net.object_axis):
            prop_net = prop_net.clone(top_k=mem.top_k, km=mem.km,
                                      bank_mesh=bank_mesh,
                                      bank_axis=desired[3],
                                      object_mesh=obj_mesh,
                                      object_axis=desired[5])
        if prop_net.dtype == "bfloat16":
            prop_params = cast_params_bf16(prop_params)
            if fuse_params is not None and fuse_net is not None and \
                    fuse_net.dtype == "bfloat16":
                fuse_params = cast_params_bf16(fuse_params)
        self.prop_net, self.prop_params = prop_net, prop_params
        self.fuse_net, self.fuse_params = fuse_net, fuse_params
        self.mem = mem
        (self.query_fn, self.memorize_fn, self.propagate_step,
         self.fuse_step, self.argmax_fn, self.argmax_batch_fn,
         self.argmax_pack_fn, self.query_encode_write_fn) = \
            build_step_fns(prop_net, fuse_net)
        self.scan_pass = build_scan_pass(prop_net, fuse_net)

        if images.dtype == np.uint8 and mem.mem_profile == 0:
            # Raw frames: upload the uint8 bytes and KEEP them uint8 in
            # HBM (4x less memory than fp32; frees headroom for the
            # query cache on long videos). The scan body and get_image
            # normalize per gathered frame — pointwise, so padding
            # before or after normalization is equivalent.
            images = jax.device_put(images)
        elif images.dtype == np.uint8:
            from mivos_tpu.data.transforms import im_normalize

            images = im_normalize(np.asarray(images, np.float32) / 255.0)
        images = jnp.asarray(images)
        self.t = images.shape[0]
        self.h, self.w = images.shape[1:3]
        self.k = num_objects

        padded, self.pad = pad_divide_by(images, 16)
        self.nh, self.nw = padded.shape[1:3]
        self.n16 = (self.nh // 16) * (self.nw // 16)

        self.on_device_data = mem.mem_profile == 0
        self.on_device_results = mem.mem_profile <= 1
        # Time axis padded to a bucket: the scan GATHERS frames (and
        # cached query features) from the full device stack by index,
        # so the executable is keyed by the bucket, not the video
        # length (one compile per bucket across videos).
        self.t_bucket = next_bucket(self.t, time_buckets())
        if mem.mem_profile == 0:
            if self.t_bucket > self.t:
                padded = jnp.concatenate(
                    [padded, jnp.broadcast_to(
                        padded[-1:],
                        (self.t_bucket - self.t,) + padded.shape[1:])], 0)
            self.images = jax.device_put(padded)
        else:
            self.images = np.asarray(padded)  # host copy; slices staged in

        # 1 inside the original frame, 0 in the /16 padding band — used
        # to re-zero the pad after in-scan normalization of uint8 video.
        lw, uw, lh, uh = self.pad
        pm = np.zeros((self.nh, self.nw, 1), np.float32)
        pm[lh: self.nh - uh, lw: self.nw - uw] = 1.0
        self._pad_mask = jnp.asarray(pm)

        # Per-frame (K+1, nh, nw, 1) probabilities; None = untouched frame
        # (background). Host numpy when offloaded, device arrays otherwise.
        self.prob: List[Optional[object]] = [None] * self.t
        self.np_masks = np.zeros((self.t, self.h, self.w), np.uint8)
        # Download width for packed label maps (0 = K too large to pack).
        self._pack_bits = _label_bits(self.k + 1)
        # Label-download codec (config doc): block-sparse needs a
        # packable class count; "auto" prefers it whenever usable.
        self._codec = mem.label_codec
        if self._codec == "auto" or not self._pack_bits:
            self._codec = "block" if self._pack_bits else "packed"
        self._block_cap = default_cap(
            self.nh, self.nw, frac=mem.label_block_cap_frac)

        self.query_buf: Dict[int, Query] = {}
        self.image_buf: Dict[int, jax.Array] = {}
        self.interacted: set = set()
        # ti -> (device packed-label chunk, row) prefetched by the scan
        # passes; consumed (and de-staled by set_prob) in _render_masks.
        self._label_cache: Dict[int, tuple] = {}

        # Device query-feature cache for multi-round sessions (config
        # cache_queries): (skip8, skip4, qk16, qv16) arrays of shape
        # (T, 1, h/s, w/s, C) in the compute dtype, populated from the
        # first pass (qcache_eager) or lazily from the second.
        qd = 2 if prop_net.dtype == "bfloat16" else 4
        per_frame = qd * sum((self.nh // s) * (self.nw // s) * c
                             for s, c in self._QDIMS)
        self._qcache = None
        self._qcache_enabled = (
            mem.cache_queries and mem.mem_profile == 0
            and self.t_bucket * per_frame <= mem.query_cache_bytes)
        self._qcached = np.zeros(self.t, bool)
        self._pass_count = 0

        self.certain_k: Optional[jax.Array] = None  # (K, s*n, CK)
        self.certain_v: Optional[jax.Array] = None
        self.pos_diff: Optional[jax.Array] = None   # (K, nh, nw, 1)
        self.neg_diff: Optional[jax.Array] = None

        # Bank storage follows the network compute dtype (bf16 banks
        # halve the memory-read HBM traffic; memorize emits that dtype).
        bank_dtype = jnp.bfloat16 if prop_net.dtype == "bfloat16" \
            else jnp.float32
        if mem.bank_sharded:
            from mivos_tpu.parallel.sharded_memory import bank_sharding

            # 2D (object x position) layout when object_sharded too.
            bank_sh = bank_sharding(
                mesh, mem.bank_axis,
                mem.object_axis if mem.object_sharded else None)
            min_cap = mesh.shape[mem.bank_axis]
        elif mem.object_sharded:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # Seed GSPMD from the carry: each chip owns its objects'
            # bank rows end-to-end.
            bank_sh, min_cap = NamedSharding(
                mesh, P(mem.object_axis, None, None)), 1
        else:
            bank_sh, min_cap = None, 1
        self.bank = MemoryBank(self.k, self.n16,
                               cap_frames=mem.bank_cap_frames,
                               dtype=bank_dtype, sharding=bank_sh,
                               min_cap=min_cap)

    # ----- buffered getters (reference inference_core.py:96-120) -----

    def get_image(self, idx: int) -> jax.Array:
        if self.mem.mem_profile == 0:
            if self.images.dtype == jnp.uint8:
                return _norm_masked(self.images[idx], self._pad_mask)
            return self.images[idx]
        if idx not in self.image_buf:
            if len(self.image_buf) > self.mem.image_buf_size:
                self.image_buf = {}
            self.image_buf[idx] = jax.device_put(jnp.asarray(self.images[idx]))
        return self.image_buf[idx]

    def get_query(self, idx: int) -> Query:
        if idx not in self.query_buf:
            if len(self.query_buf) > self.mem.query_buf_size:
                self.query_buf = {}
            self.query_buf[idx] = self.query_fn(self.prop_params,
                                                self.get_image(idx))
        return self.query_buf[idx]

    # ----- probability storage -----

    def _default_prob(self) -> jax.Array:
        p = jnp.zeros((self.k + 1, self.nh, self.nw, 1))
        return p.at[0].set(1e-7)  # reference inference_core.py:82

    def get_prob(self, ti: int) -> jax.Array:
        if self.prob[ti] is None:
            return self._default_prob()
        p = self.prob[ti]
        return jnp.asarray(p) if isinstance(p, np.ndarray) else p

    def set_prob(self, ti: int, prob: jax.Array) -> None:
        self._label_cache.pop(ti, None)
        self.prob[ti] = np.asarray(prob) if not self.on_device_results else prob

    # ----- core passes -----

    def do_pass(self, key_k, key_v, idx: int, forward: bool,
                step_cb: Optional[Callable] = None,
                chunk_cb: Optional[Callable] = None) -> int:
        """Propagate from interacted frame idx until the closest other
        interacted frame (reference inference_core.py:122-200).
        key_k/key_v: (K, n, C) memory of the interacted frame (already in
        certain memory; passed for the fusion attention read)."""
        num_certain = self.certain_k.shape[1] // self.n16
        m_front = num_certain

        if forward:
            closest_ti = min([ti for ti in self.interacted if ti > idx]
                             + [self.t])
            this_range = range(idx + 1, closest_ti)
            end = closest_ti - 1
        else:
            closest_ti = max([ti for ti in self.interacted if ti < idx]
                             + [-1])
            this_range = range(idx - 1, closest_ti, -1)
            end = closest_ti + 1
        use_scan = step_cb is None and self.mem.mem_profile == 0
        mem_freq = self._effective_mem_freq(len(this_range), num_certain,
                                            scan=use_scan)
        total_m = ((len(this_range) - 1) // mem_freq + 1 + num_certain
                   if len(this_range) else num_certain)

        do_fuse = (closest_ti != self.t) and (closest_ti != -1) and \
            (self.fuse_step is not None)

        # Whole-pass scan path: one dispatch for the entire direction.
        # Requires on-device images and no per-frame progress callback.
        if use_scan and len(this_range) > 0:
            self._do_pass_scan(key_k, idx, forward, closest_ti,
                               list(this_range), total_m, num_certain,
                               do_fuse, chunk_cb=chunk_cb,
                               mem_freq=mem_freq)
            return closest_ti

        self.bank.reset(total_m, self.certain_k, self.certain_v)
        prev_in_mem = True
        last_ti = idx

        for ti in this_range:
            rows = self.bank.valid_rows(include_transient=not prev_in_mem)
            write_row = dev_i32(m_front * self.n16)
            f16, f8, f4, k16, v16 = self.get_query(ti)
            agg, self.bank.keys, self.bank.values = self.propagate_step(
                self.prop_params, self.bank.keys, self.bank.values,
                rows, write_row, self.get_image(ti), f16, f8, f4, k16, v16)

            if ti != end:
                if abs(ti - last_ti) >= mem_freq:
                    m_front += 1
                    self.bank.num_slots = m_front
                    last_ti = ti
                    prev_in_mem = True
                else:
                    prev_in_mem = False

            if do_fuse:
                dist = self._time_coef(closest_ti, idx, ti)
                agg = self.fuse_step(self.prop_params, self.fuse_params,
                                     self.get_image(ti), self.get_prob(ti),
                                     agg, key_k, self.pos_diff,
                                     self.neg_diff, k16, dist)
            self.set_prob(ti, agg)

            if step_cb is not None:
                step_cb()
        return closest_ti

    SCAN_CHUNK = 16
    SCAN_TAIL_CHUNK = 4

    def _chunk_sizes(self, n: int) -> List[int]:
        """Big chunks first, small tail chunks last: the final chunk's
        label download cannot hide under later compute, so keeping it
        small minimizes the unoverlapped tail. Only two executable
        sizes ever compile."""
        big, small = self.SCAN_CHUNK, self.SCAN_TAIL_CHUNK
        sizes = [big] * (n // big)
        rem = n % big
        if rem:
            sizes += [small] * (-(-rem // small))
        # If everything fit in big chunks, split the last big one so the
        # tail is still small (when there is more than one chunk).
        elif len(sizes) > 1:
            sizes[-1:] = [small] * (big // small)
        return sizes

    def _effective_mem_freq(self, pass_len: int, num_certain: int,
                            scan: bool = True) -> int:
        """Commit interval for one pass, thinned when the mem_freq
        schedule would not fit the bank's frame capacity.

        The reference sizes its buffer exactly per pass
        (inference_core.py:136-151) and OOMs past device memory on long
        videos; here bank_cap_frames is the hard frame budget and a pass
        whose (pass_len-1)//mem_freq+1 commits would cross it commits at
        the smallest coarser interval that fits — bounded memory, full
        pass coverage, graceful quality degradation instead of a crash."""
        if pass_len <= 0:
            return self.mem.mem_freq  # nothing to propagate or commit
        cap = self.mem.bank_cap_frames
        # Bank slots this pass can commit: the capacity minus the
        # certain-memory seed, the transient slot, and (scan path only)
        # the scratch slot padded steps write to.
        avail = cap - num_certain - (2 if scan else 1)
        if avail < 1:
            raise ValueError(
                f"certain memory ({num_certain} frames) leaves no bank "
                f"capacity (bank_cap_frames={cap}); raise bank_cap_frames "
                f"or reduce the number of interacted frames")
        freq = self.mem.mem_freq
        if (pass_len - 1) // freq + 1 > avail:
            freq = max(freq, (pass_len - 1) // avail + 1)
        return freq

    def _do_pass_scan(self, key_k, idx: int, forward: bool,
                      closest_ti: int, frames: List[int], total_m: int,
                      num_certain: int, do_fuse: bool,
                      chunk_cb: Optional[Callable] = None,
                      mem_freq: Optional[int] = None) -> None:
        """Chunked scan propagation (see build_scan_pass). The mem_freq
        commit schedule is mirrored into per-step row arrays; padded
        steps write to a scratch slot beyond every committed row. The
        pass runs as fixed-size scan chunks (one executable for every
        pass length) with the bank carried across chunks, and each
        chunk's packed label map starts an async host copy immediately —
        the download of chunk i rides under chunk i+1's compute.

        chunk_cb(frame_indices, labels): progressive-streaming hook
        (serve/server.py's /progress + partial masks; the reference GUI
        gets the same via per-frame callbacks, interactive_gui.py:530).
        Called with each chunk's decoded UNPADDED (len, h, w) uint8
        labels, pipelined one chunk behind the dispatches so the
        blocking host fetch rides under the next chunk's compute."""
        n = len(frames)
        if mem_freq is None:
            mem_freq = self._effective_mem_freq(n, num_certain)
        sizes = self._chunk_sizes(n)
        n_pad_total = sum(sizes)
        # +1 scratch slot for padded steps, beyond the +1 transient.
        self.bank.reset(total_m + 1, self.certain_k, self.certain_v)
        scratch_row = (self.bank.cap - 1) * self.n16

        end = frames[-1]
        m_front, last_ti, prev_in_mem = num_certain, idx, True
        rows, wrows = [], []
        for ti in frames:
            rows.append((m_front + (0 if prev_in_mem else 1)) * self.n16)
            wrows.append(m_front * self.n16)
            if ti != end:
                if abs(ti - last_ti) >= mem_freq:
                    m_front += 1
                    last_ti = ti
                    prev_in_mem = True
                else:
                    prev_in_mem = False
        n_pad = n_pad_total
        rows += [rows[-1]] * (n_pad - n)
        wrows += [scratch_row] * (n_pad - n)

        if do_fuse:
            denom = abs(closest_ti - idx)
            dist_np = np.zeros((n_pad, self.k, 2), np.float32)
            for j, ti in enumerate(frames):
                dist_np[j, :, 0] = abs(closest_ti - ti) / denom
                dist_np[j, :, 1] = abs(idx - ti) / denom
            # One upload per pass (bytes, unlike the GB-scale stacks the
            # chunk loop slices); chunks slice it on device.
            dist_all = jnp.asarray(dist_np)
            pos_diff, neg_diff = self.pos_diff, self.neg_diff
        else:
            dist_all = None
            key_k = jnp.zeros((1,))
            pos_diff = neg_diff = jnp.zeros((1,))
        dummy = jnp.zeros((1,))

        def chunk_frames(c0: int, c1: int) -> List[int]:
            """This chunk's frame indices, padded by repeating the last
            valid frame (padded steps write to the scratch bank row)."""
            tis = frames[c0:min(c1, n)]
            return tis + [tis[-1]] * ((c1 - c0) - len(tis))

        def chunk_prev(c0: int, c1: int) -> jax.Array:
            tis = frames[c0:min(c1, n)]
            prev = jnp.stack([self.get_prob(ti) for ti in tis])
            pad_n = (c1 - c0) - len(tis)
            if pad_n > 0:
                padp = jnp.zeros((pad_n,) + prev.shape[1:], prev.dtype)
                prev = jnp.concatenate([prev, padp], axis=0)
            return prev

        # Query-cache mode: with qcache_eager (default) any pass over
        # uncached frames first PRE-ENCODES their query features in
        # batched windows (batch-B conv towers, query_encode_write_fn)
        # and the scan then runs fully 'cached' — including round 1,
        # whose in-scan batch-1 encodes this replaces. The legacy lazy
        # policy (qcache_eager=False) keeps round 1 encode-in-scan at
        # the cost of a round-2 pre-encode.
        if self._qcache_enabled and (self.mem.qcache_eager
                                     or self._pass_count >= 1):
            # Pre-encode happens PER CHUNK inside the loop below, so
            # chunk i+1's batched encode pipelines behind chunk i's
            # scan and label download instead of serializing in front
            # of the whole pass.
            qmode = "cached"
        else:
            qmode = "compute"
        self._pass_count += 1

        # Frames enter the scan as per-step GATHER indices into the full
        # device-resident stacks — no per-chunk slice/flip/concat
        # dispatches (whole-pass stacking OOMed 300-frame backward
        # passes; per-chunk device slicing measured 2.7x slower than
        # recompute from dispatch latency alone). Host-offloaded videos
        # (mem_profile >= 1) stage each chunk's frames with one upload.
        img_gather = self.on_device_data
        queries_f = dummy   # rebuilt per chunk in cached mode (the
        # fused cache write donates the previous buffers)
        bank_k, bank_v = self.bank.keys, self.bank.values
        chunk_probs, chunk_packed, offsets = [], [], []
        pending = None  # previous chunk's (valid frames, packed) to stream
        c0 = 0
        for size in sizes:
            c1 = c0 + size
            tis = chunk_frames(c0, c1)
            if qmode == "cached":
                self._precompute_queries(tis)
                queries_f = tuple(self._qcache)
            images_f = (self.images if img_gather
                        else jnp.asarray(self.images[np.asarray(tis)]))
            bank_k, bank_v, probs, packed = self.scan_pass(
                self.prop_params, self.fuse_params, bank_k, bank_v,
                images_f, dev_i32_seq(tuple(tis)),
                dev_i32_seq(tuple(rows[c0:c1])),
                dev_i32_seq(tuple(wrows[c0:c1])),
                chunk_prev(c0, c1) if do_fuse else dummy,
                dist_all[c0:c1] if do_fuse else dummy,
                key_k, pos_diff, neg_diff, queries_f, self._pad_mask,
                do_fuse, qmode, img_gather, self._codec, self._block_cap)
            try:
                packed.copy_to_host_async()
            except Exception:
                pass  # backends without async host copies
            chunk_probs.append(probs)
            chunk_packed.append(packed)
            offsets.append(c0)
            if chunk_cb is not None:
                if pending is not None:
                    self._emit_chunk(chunk_cb, *pending)
                pending = (frames[c0:min(c1, n)], packed, probs)
            c0 = c1
        if chunk_cb is not None and pending is not None:
            self._emit_chunk(chunk_cb, *pending)
        self.bank.keys, self.bank.values = bank_k, bank_v
        self.bank.num_slots = m_front  # final commit count (observability)

        ci = 0
        for j, ti in enumerate(frames):
            while j >= offsets[ci] + sizes[ci]:
                ci += 1
            row = j - offsets[ci]
            self.set_prob(ti, chunk_probs[ci][row])
            if self._pack_bits:  # packable class count (K+1 <= 16)
                self._label_cache[ti] = (chunk_packed[ci], row)

    def _emit_chunk(self, cb: Callable, tis: List[int],
                    packed: jax.Array, probs: jax.Array) -> None:
        """Decode one scan chunk's shipped label blob and stream it to
        `cb(frame_indices, (len, h, w) uint8 labels)`. Runs one chunk
        behind the dispatch loop, so the blocking fetch here waits on a
        host copy that already overlapped the next chunk's compute.
        Block-sparse frames that overflowed the mixed-block cap fall
        back to an on-device argmax of that chunk's probs (one small
        extra dispatch, exception path only) so the stream always
        covers every frame of the chunk."""
        arr = np.asarray(packed)[:len(tis)]  # drop padded scratch steps
        if self._codec == "block":
            labs, bad = decode_chunk(arr, self.nh, self.nw,
                                     self._pack_bits, self._block_cap)
        elif self._pack_bits:
            labs = _unpack_labels(arr, self._pack_bits)
            bad = np.zeros(len(tis), bool)
        else:
            labs, bad = arr, np.zeros(len(tis), bool)
        if bad.any():  # dense fallback for overflowed frames
            rows = np.nonzero(bad)[0]
            labs[rows] = np.asarray(
                self.argmax_batch_fn(probs[jnp.asarray(rows)]))
        lw, uw, lh, uh = self.pad
        cb(list(tis), labs[:, lh: self.nh - uh, lw: self.nw - uw])

    # ----- device query cache (multi-round reuse) -----

    @property
    def _QDIMS(self):
        """(stride, channels) of the cached per-frame query tensors:
        decoder skip towers skip8/skip4 (channel counts follow
        dec_width; at width 1.0 they equal raw f8/f4's 512/256) plus
        the query key/value projections."""
        from mivos_tpu.models.propagation import Decoder

        cw = lambda n: Decoder.chan(n, self.prop_net.dec_width)  # noqa: E731
        return ((8, cw(512)), (4, cw(256)), (16, 128), (16, 512))

    def _qcache_alloc(self) -> None:
        if self._qcache is not None:
            return
        dt = jnp.bfloat16 if self.prop_net.dtype == "bfloat16" \
            else jnp.float32
        self._qcache = [
            jnp.zeros((self.t_bucket, 1, self.nh // s, self.nw // s, c), dt)
            for s, c in self._QDIMS]

    _QC_BATCH = 16

    def _precompute_queries(self, frames: List[int]) -> None:
        """Encode every not-yet-cached frame of the pass into the query
        cache: ONE fused dispatch per full-B window (gather + batch-B
        conv towers + donated cache write) instead of B batch-1 encodes
        inside the scan. Windows are always exactly B consecutive
        frames — a short run is served by sliding its window left over
        already-cached neighbours (their rows are rewritten with the
        same deterministic batch-B values), so the executable never
        specializes on a run length."""
        todo = sorted(ti for ti in set(frames) if not self._qcached[ti])
        if not todo:
            return
        self._qcache_alloc()
        b = min(self._QC_BATCH, self.t_bucket)
        i = 0
        while i < len(todo):
            j = i + 1
            while (j < len(todo) and j - i < b
                   and todo[j] == todo[j - 1] + 1):
                j += 1
            tis = todo[i:j]
            # Slide left just enough that the full-b window both covers
            # the run and stays inside the bucket.
            w0 = min(tis[0], self.t_bucket - b)
            window = tuple(range(w0, w0 + b))
            self._qcache = list(self.query_encode_write_fn(
                self.prop_params, *self._qcache, self.images,
                dev_i32_seq(window), dev_i32(w0), self._pad_mask))
            self._qcached[tis] = True
            i = j

    def _time_coef(self, tc: int, tr: int, ti: int) -> jax.Array:
        nc = abs(tc - ti) / abs(tc - tr)
        nr = abs(tr - ti) / abs(tc - tr)
        return jnp.broadcast_to(dev_f32_pair(nc, nr), (self.k, 2))

    def interact(self, mask, idx: int,
                 total_cb: Optional[Callable] = None,
                 step_cb: Optional[Callable] = None,
                 chunk_cb: Optional[Callable] = None) -> np.ndarray:
        """mask: (K+1, h, w, 1) probabilities (bg included) on the RAW
        (unpadded) grid. Returns (T, h, w) uint8 label maps
        (reference inference_core.py:219-271).

        chunk_cb(frame_indices, (n, h, w) uint8 labels): progressive
        streaming — called with each scan chunk's decoded labels as the
        pass runs (scan path only; see _do_pass_scan). The final return
        value is still the complete, authoritative label map."""
        self.interacted.add(idx)
        mask = jnp.asarray(mask)
        mask, _ = pad_divide_by(mask, 16)

        diff = mask - self.get_prob(idx)
        self.pos_diff = jnp.clip(diff, 0, 1)[1:]
        self.neg_diff = jnp.clip(-diff, 0, 1)[1:]

        self.set_prob(idx, mask)
        key_k, key_v = self.memorize_fn(self.prop_params,
                                        self.get_image(idx), mask[1:])
        if self.certain_k is None:
            self.certain_k, self.certain_v = key_k, key_v
        else:
            self.certain_k = jnp.concatenate([self.certain_k, key_k], axis=1)
            self.certain_v = jnp.concatenate([self.certain_v, key_v], axis=1)

        if total_cb is not None:
            front = min([ti for ti in self.interacted if ti > idx] + [self.t])
            back = max([ti for ti in self.interacted if ti < idx] + [-1])
            total = front - back - 2
            if total > 0:
                total_cb(total)

        self.do_pass(key_k, key_v, idx, True, step_cb=step_cb,
                     chunk_cb=chunk_cb)
        self.do_pass(key_k, key_v, idx, False, step_cb=step_cb,
                     chunk_cb=chunk_cb)
        return self._render_masks()

    def update_mask_only(self, prob_mask, idx: int) -> np.ndarray:
        """Store an interaction without propagating
        (reference inference_core.py:273-292)."""
        mask = jnp.asarray(prob_mask)
        mask, _ = pad_divide_by(mask, 16)
        self.set_prob(idx, mask)
        self.np_masks[idx] = self._mask_np(idx)
        return self.np_masks

    def _mask_np(self, ti: int) -> np.ndarray:
        lab = np.asarray(self.argmax_fn(self.get_prob(ti)))
        lw, uw, lh, uh = self.pad
        return lab[lh: self.nh - uh, lw: self.nw - uw]

    def _render_masks(self) -> np.ndarray:
        touched = [ti for ti in range(self.t) if self.prob[ti] is not None]
        if not touched:
            return self.np_masks
        lw, uw, lh, uh = self.pad
        crop = (slice(lh, self.nh - uh), slice(lw, self.nw - uw))

        # Frames whose labels the scan passes already shipped to host.
        rest = []
        fetched: Dict[int, np.ndarray] = {}
        for ti in touched:
            entry = self._label_cache.get(ti)
            if entry is None:
                rest.append(ti)
                continue
            arr, row = entry
            key = id(arr)
            if key not in fetched:
                fetched[key] = np.asarray(arr)  # async copy already done
            if self._codec == "block":
                lab = decode_frame(fetched[key][row], self.nh, self.nw,
                                   self._pack_bits, self._block_cap)
                if lab is None:  # mixed-block overflow: refetch densely
                    rest.append(ti)
                    continue
                self.np_masks[ti] = lab[crop]
            else:
                self.np_masks[ti] = _unpack_labels(fetched[key][row],
                                                   self._pack_bits)[crop]
        if not rest:
            return self.np_masks

        if self.on_device_results:
            stacked = jnp.stack([self.prob[ti] for ti in rest])
            if self._pack_bits and self.nw % (8 // self._pack_bits) == 0:
                labs = _unpack_labels(np.asarray(self.argmax_pack_fn(stacked)),
                                      self._pack_bits)
            else:
                labs = np.asarray(self.argmax_batch_fn(stacked))
        else:
            stacked = np.stack([self.prob[ti] for ti in rest])
            labs = np.argmax(stacked[..., 0], axis=1).astype(np.uint8)
        labs = labs[:, crop[0], crop[1]]
        for i, ti in enumerate(rest):
            self.np_masks[ti] = labs[i]
        return self.np_masks
