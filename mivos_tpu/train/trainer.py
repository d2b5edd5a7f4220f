"""Fusion-module trainer: data-parallel over a jax.sharding.Mesh.

Replaces the reference FusionModel (model/fusion_model.py) + train.py
NCCL/DDP stack. One jitted train step carries forward, loss, backward and
the optimizer update; the batch is sharded over the mesh's data axis and
XLA inserts the gradient all-reduce (no DDP wrapper, no DistributedSampler
— the data loader shards by slicing the global batch).

Frozen-BN semantics preserved: AttentionReadNetwork params never receive
gradients (stop_gradient inside the module + they simply aren't in the
trainable tree); FusionNet has no BN at all (reference fusion_model.py:199).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mivos_tpu.config import TrainConfig
from mivos_tpu.models.fusion import AttentionReadNetwork, FusionNet
from mivos_tpu.ops.aggregate import aggregate_wbg_last
from mivos_tpu.train.losses import compute_fusion_losses


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam(lr, weight_decay=1e-7) + MultiStepLR(steps, gamma)
    (reference fusion_model.py:43-45). torch's Adam weight_decay adds
    wd*p to the gradient BEFORE the moment update, hence
    add_decayed_weights first in the chain."""
    schedule = optax.piecewise_constant_schedule(
        init_value=cfg.lr,
        boundaries_and_scales={s: cfg.gamma for s in cfg.resolved_steps()},
    )
    return optax.chain(
        optax.add_decayed_weights(1e-7),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def fusion_forward(fuse_net: FusionNet, attn_net: AttentionReadNetwork,
                   fuse_params, attn_params,
                   batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Forward pass of one training batch
    (reference fusion_model.py:54-92). All tensors NHWC, class-last."""
    attn1, attn2 = attn_net.apply(
        attn_params, batch["src2_ref_im"], batch["src2_ref"],
        batch["src2_ref_gt"], batch["src2_ref2"], batch["src2_ref_gt2"],
        batch["rgb"])
    prob1 = jax.nn.sigmoid(fuse_net.apply(
        fuse_params, batch["rgb"], batch["seg1"], batch["seg2"],
        attn1, batch["dist"]))
    prob2 = jax.nn.sigmoid(fuse_net.apply(
        fuse_params, batch["rgb"], batch["seg12"], batch["seg22"],
        attn2, batch["dist"]))
    prob = jnp.concatenate([prob1, prob2], axis=-1)  # (B, H, W, 2)
    prob = prob * batch["selector"][:, None, None, :]
    logits, mask = aggregate_wbg_last(prob, keep_bg=True)
    return {"logits": logits, "mask": mask, "attn1": attn1, "attn2": attn2}


@dataclasses.dataclass
class FusionTrainer:
    """Owns params/opt_state with explicit shardings over `mesh`."""

    cfg: TrainConfig
    mesh: Mesh

    def __post_init__(self):
        self.fuse_net = FusionNet()
        self.attn_net = AttentionReadNetwork()
        self.tx = make_optimizer(self.cfg)
        iters = self.cfg.resolved_iterations()
        self.start_warm = int(iters * 0.2)   # reference losses.py:48
        self.end_warm = int(iters * 0.5)
        self.repl = NamedSharding(self.mesh, P())
        self.data_sh = NamedSharding(self.mesh, P(self.cfg.data_axis))
        self._train_step = self._build_train_step()
        self._val_step = self._build_val_step()
        self.fuse_params = None
        self.attn_params = None
        self.opt_state = None
        self.it = 0

    # ----- initialization -----

    def init(self, sample_batch: Dict[str, jax.Array],
             attn_params=None) -> None:
        """Initialize trainable params (and attention params unless
        provided from a converted propagation checkpoint)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(self.cfg.seed))
        b = {k: v[:1] for k, v in sample_batch.items()}
        self.fuse_params = FusionNet().init(
            k1, b["rgb"], b["seg1"], b["seg2"],
            jnp.zeros(b["seg1"].shape[:-1] + (2,)), b["dist"])
        if attn_params is None:
            attn_params = AttentionReadNetwork().init(
                k2, b["src2_ref_im"], b["src2_ref"], b["src2_ref_gt"],
                b["src2_ref2"], b["src2_ref_gt2"], b["rgb"])
        self.attn_params = attn_params
        self.opt_state = self.tx.init(self.fuse_params)
        # Replicate across the mesh.
        self.fuse_params = jax.device_put(self.fuse_params, self.repl)
        self.attn_params = jax.device_put(self.attn_params, self.repl)
        self.opt_state = jax.device_put(self.opt_state, self.repl)

    # ----- steps -----

    def _build_train_step(self):
        fuse_net, attn_net = self.fuse_net, self.attn_net
        tx, start_warm, end_warm = self.tx, self.start_warm, self.end_warm

        @functools.partial(jax.jit, donate_argnums=(0, 2))
        def train_step(fuse_params, attn_params, opt_state, batch, it):
            def loss_fn(fp):
                out = fusion_forward(fuse_net, attn_net, fp, attn_params,
                                     batch)
                losses = compute_fusion_losses(out, batch, it,
                                               start_warm, end_warm)
                return losses["total_loss"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(fuse_params)
            updates, opt_state = tx.update(grads, opt_state, fuse_params)
            fuse_params = optax.apply_updates(fuse_params, updates)
            return fuse_params, opt_state, losses

        return train_step

    def _build_val_step(self):
        fuse_net, attn_net = self.fuse_net, self.attn_net
        start_warm, end_warm = self.start_warm, self.end_warm

        @jax.jit
        def val_step(fuse_params, attn_params, batch, it):
            out = fusion_forward(fuse_net, attn_net, fuse_params,
                                 attn_params, batch)
            return compute_fusion_losses(out, batch, it, start_warm, end_warm)

        return val_step

    def shard_batch(self, batch: Dict) -> Dict:
        return {k: jax.device_put(jnp.asarray(v), self.data_sh)
                for k, v in batch.items()}

    def train_step(self, batch: Dict) -> Dict[str, jax.Array]:
        batch = self.shard_batch(batch)
        self.fuse_params, self.opt_state, losses = self._train_step(
            self.fuse_params, self.attn_params, self.opt_state, batch,
            jnp.int32(self.it))
        self.it += 1
        return losses

    def val_step(self, batch: Dict) -> Dict[str, jax.Array]:
        batch = self.shard_batch(batch)
        return self._val_step(self.fuse_params, self.attn_params, batch,
                              jnp.int32(self.it))

    def debug_outputs(self, batch: Dict) -> Dict:
        """Forward outputs (mask/attn) as host numpy for the pool_fusion
        training montage (reference fusion_model.py:101-112)."""
        import numpy as np

        batch = self.shard_batch(batch)
        out = jax.jit(fusion_forward, static_argnums=(0, 1))(
            self.fuse_net, self.attn_net, self.fuse_params,
            self.attn_params, batch)
        return {k: np.asarray(v) for k, v in out.items()}

    # ----- checkpoint state (orbax-ready pytree) -----

    def state_dict(self) -> Dict:
        return {"it": self.it, "params": self.fuse_params,
                "opt_state": self.opt_state}

    def load_state_dict(self, state: Dict) -> None:
        self.it = int(state["it"])
        self.fuse_params = jax.device_put(state["params"], self.repl)
        self.opt_state = jax.device_put(state["opt_state"], self.repl)
