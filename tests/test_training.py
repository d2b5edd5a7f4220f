"""Fusion training: loss semantics vs torch reference, DP train step on an
8-device CPU mesh, syncbn parity."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from jax.sharding import PartitionSpec as P

from mivos_tpu.config import TrainConfig
from mivos_tpu.ops.syncbn import sync_batch_norm
from mivos_tpu.parallel.mesh import make_mesh
from mivos_tpu.train.losses import bootstrapped_ce, fusion_loss
from mivos_tpu.train.trainer import FusionTrainer

B, H, W = 8, 48, 48


def make_batch(rng, b=B, h=H, w=W):
    m = lambda: rng.rand(b, h, w, 1).astype(np.float32)
    batch = {
        "rgb": rng.randn(b, h, w, 3).astype(np.float32),
        "cls_gt": rng.randint(0, 3, (b, h, w)).astype(np.int32),
        "gt": (m() > 0.5).astype(np.float32),
        "seg1": m(), "seg2": m(),
        "src2_ref": m(), "src2_ref_gt": (m() > 0.5).astype(np.float32),
        "gt2": (m() > 0.5).astype(np.float32),
        "seg12": m(), "seg22": m(),
        "src2_ref2": m(), "src2_ref_gt2": (m() > 0.5).astype(np.float32),
        "src2_ref_im": rng.randn(b, h, w, 3).astype(np.float32),
        "dist": rng.rand(b, 2).astype(np.float32),
        "selector": np.stack([np.ones(b), (rng.rand(b) > 0.3)], 1)
                      .astype(np.float32),
    }
    return batch


class TestBootstrappedCE:
    def _torch_ref(self, logits, gt, it, start, end, top_p=0.15):
        """Reference semantics (losses.py:29-41), per sample then mean."""
        tl = torch.from_numpy(logits).permute(0, 3, 1, 2)
        tg = torch.from_numpy(gt).long()
        b = tl.shape[0]
        tot = 0.0
        for j in range(b):
            if it < start:
                tot += F.cross_entropy(tl[j:j+1], tg[j:j+1]).item()
                continue
            raw = F.cross_entropy(tl[j:j+1], tg[j:j+1],
                                  reduction="none").view(-1)
            p = top_p if it > end else top_p + (1-top_p)*((end-it)/(end-start))
            k = int(raw.numel() * p)
            tot += torch.topk(raw, k)[0].mean().item()
        return tot / b

    @pytest.mark.parametrize("it", [0, 30, 60])
    def test_matches_torch_topk(self, rng, it):
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        gt = rng.randint(0, 3, (2, 8, 8)).astype(np.int32)
        got, p = bootstrapped_ce(jnp.asarray(logits), jnp.asarray(gt),
                                 jnp.int32(it), 20, 50)
        ref = self._torch_ref(logits, gt, it, 20, 50)
        # quantile-threshold vs exact topk can differ by boundary pixels
        np.testing.assert_allclose(float(got), ref, rtol=1e-4)

    def test_warmup_is_plain_ce(self, rng):
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        gt = rng.randint(0, 3, (2, 8, 8)).astype(np.int32)
        got, p = bootstrapped_ce(jnp.asarray(logits), jnp.asarray(gt),
                                 jnp.int32(0), 20, 50)
        tl = torch.from_numpy(logits).permute(0, 3, 1, 2)
        ref = F.cross_entropy(tl, torch.from_numpy(gt).long()).item()
        assert float(p) == 1.0
        np.testing.assert_allclose(float(got), ref, rtol=1e-4)

    def test_selector_masks_second_object(self, rng):
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        gt = rng.randint(0, 2, (2, 8, 8)).astype(np.int32)  # only bg/obj1
        sel_off = jnp.asarray([[1., 0.], [1., 0.]])
        got, _ = fusion_loss(jnp.asarray(logits), jnp.asarray(gt), sel_off,
                             jnp.int32(0), 20, 50)
        # reference slices logits[:, :2]
        tl = torch.from_numpy(logits[..., :2]).permute(0, 3, 1, 2)
        ref = F.cross_entropy(tl, torch.from_numpy(gt).long()).item()
        np.testing.assert_allclose(float(got), ref, rtol=1e-4)


class TestTrainStep:
    def test_dp_train_step_runs_and_learns(self, rng):
        mesh = make_mesh(8)
        cfg = TrainConfig(iterations=100, steps=(80,), batch_size=B)
        tr = FusionTrainer(cfg, mesh)
        batch = make_batch(rng)
        tr.init(batch)
        p0 = jax.tree.map(lambda x: np.asarray(x), tr.fuse_params)
        l0 = tr.train_step(batch)
        l1 = tr.train_step(batch)
        assert np.isfinite(float(l0["total_loss"]))
        assert np.isfinite(float(l1["total_loss"]))
        # params actually moved
        moved = jax.tree.map(
            lambda a, b: float(np.abs(a - np.asarray(b)).max()),
            p0, tr.fuse_params)
        assert max(jax.tree.leaves(moved)) > 0
        # metric dict has the IoU integrands
        assert "hide_iou/i" in l0 and "hide_iou/sec_i" in l0
        assert tr.it == 2

    def test_dp_matches_single_device(self, rng):
        """Gradient all-reduce through sharding == single-device step."""
        batch = make_batch(rng)
        cfg = TrainConfig(iterations=100, steps=(80,), batch_size=B)
        tr8 = FusionTrainer(cfg, make_mesh(8))
        tr1 = FusionTrainer(cfg, make_mesh(1))
        tr8.init(batch)
        tr1.init(batch)
        l8 = tr8.train_step(batch)
        l1 = tr1.train_step(batch)
        np.testing.assert_allclose(float(l8["total_loss"]),
                                   float(l1["total_loss"]), rtol=1e-5)
        d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a)
                                                   - np.asarray(b)).max()),
                         tr8.fuse_params, tr1.fuse_params)
        assert max(jax.tree.leaves(d)) < 1e-5

    def test_val_step(self, rng):
        mesh = make_mesh(8)
        cfg = TrainConfig(iterations=100, steps=(80,), batch_size=B)
        tr = FusionTrainer(cfg, mesh)
        batch = make_batch(rng)
        tr.init(batch)
        losses = tr.val_step(batch)
        assert np.isfinite(float(losses["total_loss"]))
        assert tr.it == 0


class TestSyncBN:
    def test_matches_full_batch_bn(self, rng):
        """BN stats psum'd across 8 shards == BN over the full batch
        (replaces the reference's CUDA SyncBN correctness contract)."""
        from jax import shard_map

        mesh = make_mesh(8)
        x = rng.randn(16, 4, 4, 6).astype(np.float32)
        scale = rng.rand(6).astype(np.float32) + 0.5
        bias = rng.randn(6).astype(np.float32)

        def local(xs, sc, bi):
            y, (m, v) = sync_batch_norm(xs, sc, bi, axis_name="data")
            return y

        f = shard_map(local, mesh=mesh,
                      in_specs=(P("data"), P(), P()), out_specs=P("data"))
        got = np.asarray(f(jnp.asarray(x), jnp.asarray(scale),
                           jnp.asarray(bias)))
        # full-batch reference
        mean = x.mean((0, 1, 2))
        var = x.var((0, 1, 2))
        ref = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_matches_torch_batchnorm(self, rng):
        x = rng.randn(4, 5, 5, 3).astype(np.float32)
        scale = rng.rand(3).astype(np.float32)
        bias = rng.randn(3).astype(np.float32)
        y, (m, v) = sync_batch_norm(jnp.asarray(x), jnp.asarray(scale),
                                    jnp.asarray(bias))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.batch_norm(tx, None, None, torch.from_numpy(scale),
                           torch.from_numpy(bias), training=True)
        np.testing.assert_allclose(np.asarray(y),
                                   ref.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_debug_outputs_for_montage(rng):
    """debug_outputs feeds pool_fusion (reference fusion_model.py
    logging path)."""
    import jax as _jax
    from mivos_tpu.config import TrainConfig
    from mivos_tpu.parallel.mesh import make_mesh
    from mivos_tpu.train.trainer import FusionTrainer
    from mivos_tpu.utils.image_saver import pool_fusion

    b, h, w = 2, 32, 32
    m = lambda: rng.rand(b, h, w, 1).astype(np.float32)
    batch = {
        "rgb": rng.randn(b, h, w, 3).astype(np.float32),
        "cls_gt": rng.randint(0, 3, (b, h, w)).astype(np.int32),
        "gt": (m() > 0.5).astype(np.float32),
        "seg1": m(), "seg2": m(),
        "src2_ref": m(), "src2_ref_gt": (m() > 0.5).astype(np.float32),
        "gt2": (m() > 0.5).astype(np.float32),
        "seg12": m(), "seg22": m(),
        "src2_ref2": m(), "src2_ref_gt2": (m() > 0.5).astype(np.float32),
        "src2_ref_im": rng.randn(b, h, w, 3).astype(np.float32),
        "dist": rng.rand(b, 2).astype(np.float32),
        "selector": np.ones((b, 2), np.float32),
    }
    trainer = FusionTrainer(TrainConfig(iterations=10, steps=(8,),
                                        batch_size=b), make_mesh(1))
    trainer.init(batch)
    out = trainer.debug_outputs(batch)
    assert out["mask"].shape == (b, h, w, 3)
    grid = pool_fusion(dict(batch, mask=out["mask"], attn1=out["attn1"],
                            attn2=out["attn2"]), size=(48, 48))
    assert grid.dtype == np.uint8 and grid.ndim == 3


def test_syncbn_module_sharded_matches_full_batch(rng):
    """The SyncBatchNorm nn-module (the op's first-class consumer):
    training mode under shard_map over 8 shards == full-batch BN,
    running stats updated; eval mode uses the running averages."""
    from jax import shard_map

    from mivos_tpu.models.layers import SyncBatchNorm

    mesh = make_mesh(8)
    x = rng.randn(16, 4, 4, 6).astype(np.float32)
    bn = SyncBatchNorm(6, axis_name="data", momentum=0.5)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))

    def local(v, xs):
        y, upd = bn.apply(v, xs, train=True,
                          mutable=["batch_stats"])
        return y, upd["batch_stats"]

    f = shard_map(local, mesh=mesh, in_specs=(P(), P("data")),
                  out_specs=(P("data"), P()))
    got, stats = f(variables, jnp.asarray(x))

    mean = x.mean((0, 1, 2))
    var = x.var((0, 1, 2))
    ref = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               0.5 * mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               0.5 + 0.5 * var, atol=1e-4)

    # eval mode consumes the running averages
    v2 = {"params": variables["params"], "batch_stats": stats}
    y_eval = bn.apply(v2, jnp.asarray(x), train=False)
    ref_eval = (x - 0.5 * mean) / np.sqrt(0.5 + 0.5 * var + 1e-5)
    np.testing.assert_allclose(np.asarray(y_eval), ref_eval, atol=1e-4)


def test_attention_read_from_prop_shares_trained_towers():
    """The frozen attention reader must load the PROPAGATION weights
    (reference fusion_model.py:185-188 loads propagation.pth with
    strict=False); attention_read_from_prop extracts the shared
    encoder/KV towers from a flax propagation tree and the reader runs
    with them directly."""
    from mivos_tpu.checkpoint import attention_read_from_prop
    from mivos_tpu.models.fusion import AttentionReadNetwork
    from mivos_tpu.models.propagation import PropagationNetwork

    prop = PropagationNetwork(top_k=5)
    f0 = jnp.zeros((32, 32, 3))
    pp = prop.init(jax.random.PRNGKey(0), f0, jnp.zeros((2, 32, 32, 1)), f0)
    ap = attention_read_from_prop(pp)

    rng = np.random.RandomState(0)
    im = rng.randn(1, 32, 32, 3).astype(np.float32)
    m = lambda: rng.rand(1, 32, 32, 1).astype(np.float32)
    attn1, attn2 = AttentionReadNetwork().apply(
        ap, im, m(), m(), m(), m(), im)
    assert attn1.shape == (1, 32, 32, 2) and attn2.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(attn1)).all()
    # Extraction really shares the propagation tensors (same arrays).
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(ap["params"]["kv_m_f16"])[0]),
        np.asarray(jax.tree_util.tree_leaves(
            pp["params"]["kv_m_f16"])[0]))
    with pytest.raises(KeyError):
        attention_read_from_prop({"params": {"rgb_encoder": {}}})
