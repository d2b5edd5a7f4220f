"""Synthetic pretraining of the propagation and S2M networks.

The reference ships trained checkpoints (download_model.py) and trains
propagation in a sibling repo; this sandbox has neither the data nor
the weights, so the accuracy proxy chain needs weights whose
predictions are PEAKED (untrained weights leave most pixels near-tied,
which is exactly where fast-vs-exact label comparisons are least
informative — see PERF.md "accuracy envelope"). These trainers fit the
nets on generation/synthetic.py moving-blob video until masks are
confident; the artifacts feed scripts/accuracy_envelope.py and
scripts/full_protocol_tpu.py.

Gradients flow through the exact top-k memory read (jax.lax.top_k has
a subgradient); the fused Pallas read is inference-only, so training
nets must use read_backend='xla_exact'.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mivos_tpu.data.transforms import im_normalize
from mivos_tpu.generation.synthetic import (fbrs_example, prop_clip,
                                            s2m_example)
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.models.s2m import S2MNetwork
from mivos_tpu.ops.aggregate import aggregate_wbg


def _bce_logits(logits: jax.Array, y: jax.Array) -> jax.Array:
    return optax.sigmoid_binary_cross_entropy(logits, y).mean()


def _soft_iou(p: jax.Array, y: jax.Array) -> jax.Array:
    hard = (p > 0.5).astype(jnp.float32)
    i = jnp.sum(hard * y, axis=(1, 2, 3))
    u = jnp.sum(jnp.maximum(hard, y), axis=(1, 2, 3))
    return jnp.mean((i + 1.0) / (u + 1.0))


class PropPretrainer:
    """Adam on memorize -> top-k read -> decode over a `chain_steps`-long
    propagated clip. Step 1 memorizes the GT mask; every later step
    segments from the accumulated bank and memorizes the net's OWN
    aggregated prediction (full BPTT through the chain) — the
    reference's main-training recipe (its STM trainer reads frame t
    from memory of its own frame t-1 output). chain_steps=1 is the
    plain single-pair STM signal; chain_steps>=2 additionally trains
    against exposure bias, the mid-sequence drift mode the accuracy
    envelope exposed (PERF.md: low-margin pixels peak ~15 frames from
    the interactions, where the bank is all self-predictions).

    `chain_mix` (e.g. (1, 3)) interleaves chain lengths round-robin by
    step seed — the scheduled-sampling middle ground: the round-5
    all-chain curriculum fixed exposure bias (flat IoU over a pass) but
    traded away GT-seeded confidence, dropping the S2M-seeded protocol
    composition (PERF.md round-5 'confidence is not quality'). Mixing
    keeps the GT-pair signal in every other step. One jitted step per
    distinct length; params/opt state shared."""

    def __init__(self, net: Optional[PropagationNetwork] = None,
                 params: Optional[Dict] = None, lr: float = 2e-4,
                 hw: Tuple[int, int] = (192, 192), num_objects: int = 2,
                 seed: int = 0, chain_steps: int = 1,
                 chain_mix: Optional[Tuple[int, ...]] = None):
        self.net = net or PropagationNetwork(top_k=50,
                                             read_backend="xla_exact")
        assert self.net.read_backend == "xla_exact", (
            "training must differentiate through the exact top-k read")
        self.mix = tuple(chain_mix) if chain_mix else (chain_steps,)
        assert all(n >= 1 for n in self.mix), self.mix
        self.hw, self.k, self.chain = hw, num_objects, max(self.mix)
        h, w = hw
        if params is None:
            f0 = jnp.zeros((h, w, 3))
            params = self.net.init(jax.random.PRNGKey(seed), f0,
                                   jnp.zeros((num_objects, h, w, 1)), f0)
        self.params = params
        self.tx = optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adam(lr))
        self.opt_state = self.tx.init(self.params)

        net_ref = self.net

        def make_step(n_chain: int):
            def loss_fn(p, imgs, gts):
                # imgs: (S+1, H, W, 3); gts: (S+1, K, H, W, 1)
                mem_k, mem_v = net_ref.apply(p, imgs[0], gts[0],
                                             method="memorize")
                total = 0.0
                for s in range(1, n_chain + 1):
                    valid = jnp.ones((mem_k.shape[1],), bool)
                    f16, f8, f4, k16, v16 = net_ref.apply(
                        p, imgs[s], method="get_query_values")
                    # Loss on LOGITS (segment_logits): BCE from the
                    # sigmoid output saturates in fp32 and its clip
                    # zeroes gradients.
                    logits = net_ref.apply(p, mem_k, mem_v, valid, f16,
                                           f8, f4, k16, v16,
                                           method="segment_logits")
                    total = total + _bce_logits(logits, gts[s])
                    prob = jax.nn.sigmoid(logits)
                    if s < n_chain:
                        # Memorize the aggregated self-prediction,
                        # exactly what the session commits
                        # (core/inference.py:226).
                        agg = aggregate_wbg(prob, keep_bg=True)[1:]
                        nk, nv = net_ref.apply(p, imgs[s], agg,
                                               method="memorize")
                        mem_k = jnp.concatenate([mem_k, nk], axis=1)
                        mem_v = jnp.concatenate([mem_v, nv], axis=1)
                # iou reported for the LAST (hardest) step of the chain
                return total / n_chain, _soft_iou(prob, gts[n_chain])

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step(p, opt_state, imgs, gts):
                (loss, iou), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, imgs, gts)
                updates, opt_state = self.tx.update(grads, opt_state, p)
                return (optax.apply_updates(p, updates), opt_state,
                        loss, iou)

            return step

        self._steps = {n: make_step(n) for n in set(self.mix)}
        self._step = self._steps[self.mix[0]]  # single-length compat

    def pick_chain(self, seed: int) -> int:
        """Deterministic round-robin over the mix by step seed, so a
        resumed run replays the identical schedule."""
        return self.mix[seed % len(self.mix)]

    def make_batch(self, seed: int, n_chain: Optional[int] = None):
        h, w = self.hw
        n = n_chain if n_chain is not None else self.chain
        # Gaps 1-5: session propagation is frame-to-frame with mem_freq 5
        # commits, so the read rarely spans a larger temporal gap.
        imgs, gts = prop_clip(seed, n, h, w, num_objects=self.k,
                              max_gap=5)
        return im_normalize(imgs), gts

    def step(self, seed: int) -> Tuple[float, float]:
        n = self.pick_chain(seed)
        batch = self.make_batch(seed, n)
        self.params, self.opt_state, loss, iou = self._steps[n](
            self.params, self.opt_state, *batch)
        return float(loss), float(iou)


class S2MPretrainer:
    """Adam on the 6-channel scribble-to-mask DeepLabV3+
    (reference model/s2m/s2m_network.py:56-64 input contract)."""

    def __init__(self, net: Optional[S2MNetwork] = None,
                 params: Optional[Dict] = None, lr: float = 2e-4,
                 hw: Tuple[int, int] = (192, 192), num_objects: int = 2,
                 seed: int = 0):
        self.net = net or S2MNetwork()
        self.hw, self.k = hw, num_objects
        h, w = hw
        if params is None:
            params = self.net.init(jax.random.PRNGKey(seed + 1),
                                   jnp.zeros((num_objects, h, w, 6)))
        self.params = params
        self.tx = optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adam(lr))
        self.opt_state = self.tx.init(self.params)
        net_ref = self.net

        def loss_fn(p, x, gt):
            logits = net_ref.apply(p, x)
            return (_bce_logits(logits, gt),
                    _soft_iou(jax.nn.sigmoid(logits), gt))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, opt_state, x, gt):
            (loss, iou), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, x, gt)
            updates, opt_state = self.tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss, iou

        self._step = step

    def make_batch(self, seed: int):
        h, w = self.hw
        x, gt, _ = s2m_example(seed, h, w, self.k)
        x = np.concatenate([im_normalize(x[..., :3]), x[..., 3:]], axis=-1)
        return x, gt

    def step(self, seed: int) -> Tuple[float, float]:
        x, gt = self.make_batch(seed)
        self.params, self.opt_state, loss, iou = self._step(
            self.params, self.opt_state, x, gt)
        return float(loss), float(iou)


class FBRSPretrainer:
    """Adam on the full f-BRS click model (DistMaps -> rgb_conv ->
    DeepLabV3+ -> SepConvHead, models/fbrs.py) with the reference's
    normalized focal loss (fbrs/model/losses.py:9, train/fbrs_losses.py)
    . Synthetic single-object click samples from
    generation/synthetic.fbrs_example; the artifact feeds the NoC
    accuracy-trajectory harness (eval/noc.py via the FULL
    FeatureBRSPredictor stack — scripts/noc_synthetic.py).

    FROM-SCRATCH TRAINABILITY (all of this measured, round 5): the
    reference trains its click models with LIVE BatchNorm
    (fbrs/model/modeling/resnetv1b.py norm_layer); our model defs keep
    FrozenBatchNorm because every shipped checkpoint freezes BN at
    inference. Through frozen (0, 1) stats, the BASIC-block resnet34
    tower stacks residual variance until stage-4 activations reach ~1e4
    and one Adam step saturates every logit (at 192^2: logits
    [-0.17,-0.01] -> [-95,-3.4] after a single 5e-4 step, then loss pins
    at -log(1e-3) with zero gradient — for gluon AND flax-default
    inits). The BOTTLENECK resnet50 tower trains fine through the same
    frozen stats (exactly like the working S2MPretrainer), so the
    default pretrain arch here is resnet50. `calibrate_bn=True`
    additionally writes measured input statistics into the frozen
    (mean, var) (models/initializer.calibrate_frozen_bn) — it
    un-explodes resnet34 but the collapsed relus stay dead (constant
    logits), so it is opt-in, not a fix for basic-block towers.

    init_flavor: None (flax lecun defaults) or 'gluon' (the reference's
    from-scratch distribution, models/initializer.py)."""

    def __init__(self, net=None, params: Optional[Dict] = None,
                 lr: float = 2e-4, hw: Tuple[int, int] = (192, 192),
                 num_objects: int = 1,  # single-object task (API parity
                 seed: int = 0,         # with the other pretrainers)
                 n_points: int = 8, batch: int = 4,
                 init_flavor: Optional[str] = None,
                 calibrate_bn: bool = False):
        from mivos_tpu.models.fbrs import FBRSDeepLabModel, init_params
        from mivos_tpu.train.fbrs_losses import normalized_focal_loss

        self.net = net or FBRSDeepLabModel(arch="resnet50", ch=128)
        self.hw, self.p, self.batch = hw, n_points, batch
        h, w = hw
        if params is None:
            params = init_params(
                self.net, jax.random.PRNGKey(seed),
                np.zeros((1, h, w, 3), np.float32),
                np.full((1, 2 * n_points, 2), -1.0, np.float32),
                init_flavor=init_flavor or "default")
            if calibrate_bn:
                from mivos_tpu.models.initializer import calibrate_frozen_bn

                imgs, pts, _ = self.make_batch(seed)
                params = calibrate_frozen_bn(self.net, params,
                                             (imgs, pts), iters=10)
        self.params = params
        self.tx = optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adam(lr))
        self.opt_state = self.tx.init(self.params)
        net_ref = self.net

        def loss_fn(p, imgs, pts, gts):
            logits = net_ref.apply(p, imgs, pts)          # (B, H, W, 1)
            nfl = normalized_focal_loss(logits, gts).mean()
            return nfl, _soft_iou(jax.nn.sigmoid(logits), gts)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, opt_state, imgs, pts, gts):
            (loss, iou), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, imgs, pts, gts)
            updates, opt_state = self.tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss, iou

        self._step = step

    def make_batch(self, seed: int):
        h, w = self.hw
        imgs, gts, pts = [], [], []
        for b in range(self.batch):
            im, gt, pt = fbrs_example(seed * self.batch + b, h, w,
                                      n_points=self.p)
            imgs.append(im_normalize(im))
            gts.append(gt[..., None])
            pts.append(pt)
        return (np.stack(imgs), np.stack(pts),
                np.stack(gts).astype(np.float32))

    def step(self, seed: int) -> Tuple[float, float]:
        imgs, pts, gts = self.make_batch(seed)
        self.params, self.opt_state, loss, iou = self._step(
            self.params, self.opt_state, imgs, pts, gts)
        return float(loss), float(iou)
