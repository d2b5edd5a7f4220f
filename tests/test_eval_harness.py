"""Eval harnesses: NoC clicker protocol, FusionGenerator, orbax
checkpoint manager, and entry-point importability."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mivos_tpu.core.fusion_generator import FusionGenerator
from mivos_tpu.checkpoint.manager import (CheckpointManager, load_params,
                                          save_params)
from mivos_tpu.eval.noc import (compute_noc_metric, evaluate_sample,
                                get_iou)
from mivos_tpu.models.propagation import PropagationNetwork


class TestNoC:
    def test_get_iou(self):
        gt = np.zeros((10, 10), np.int32)
        gt[2:6, 2:6] = 1
        pred = np.zeros((10, 10), bool)
        pred[2:6, 2:8] = True
        assert abs(get_iou(gt, pred) - 16.0 / 24.0) < 1e-6

    def test_noc_metric(self):
        ious = [np.asarray([0.5, 0.92]), np.asarray([0.3, 0.4, 0.5])]
        noc, over = compute_noc_metric(ious, [0.9], max_clicks=20)
        assert noc[0] == (2 + 20) / 2.0
        assert over[0] == 1

    def test_evaluate_sample_with_oracle_predictor(self):
        """A perfect 'predictor' converges in one click: validates the
        clicker protocol loop (reference evaluation.py:35-56)."""
        gt = np.zeros((32, 32), np.int32)
        gt[8:20, 8:20] = 1

        class Oracle:
            def set_input_image(self, image):
                pass

            def get_prediction(self, clicker):
                return gt.astype(np.float32)

        clicks, ious, probs = evaluate_sample(
            np.zeros((32, 32, 3), np.float32), gt, Oracle(),
            max_iou_thr=0.9)
        assert len(clicks) == 1 and clicks[0].is_positive
        y, x = clicks[0].coords
        assert gt[int(y), int(x)] == 1  # clicked inside the FN region
        assert ious[-1] == 1.0


class TestFusionGenerator:
    def test_propagates_window_and_writes_probs(self, rng):
        t, h, w, k = 6, 48, 64, 2
        net = PropagationNetwork(top_k=10)
        images = rng.rand(t, h, w, 3).astype(np.float32)
        f0 = jnp.zeros((h, w, 3))
        params = net.init(jax.random.PRNGKey(0), f0,
                          jnp.zeros((k, h, w, 1)), f0)
        gen = FusionGenerator(net, params, images, mem_freq=2)
        gen.reset(k)
        labels = rng.randint(0, k + 1, (h, w))
        mask = np.stack([(labels == i + 1) for i in range(k)]
                        ).astype(np.float32)[..., None]
        probs = gen.interact_mask(mask, 2, 1, 4)
        assert probs.shape == (k + 1, t, h, w)
        # untouched frames (outside [1, 4]) stay zero
        assert probs[:, 0].sum() == 0 and probs[:, 5].sum() == 0
        # touched frames are probability distributions
        for ti in range(1, 5):
            s = probs[:, ti].sum(0)
            np.testing.assert_allclose(s, np.ones_like(s), atol=1e-3)

    def test_bf16_net_matches_bank_dtype(self, rng):
        """generate_fusion --dtype bfloat16 path: the generator's bank
        must follow the compute dtype (memorize emits bf16; a float32
        bank made the dynamic_update_slice write fail)."""
        t, h, w, k = 4, 48, 64, 2
        net32 = PropagationNetwork(top_k=10)
        net = PropagationNetwork(top_k=10, dtype="bfloat16")
        images = rng.rand(t, h, w, 3).astype(np.float32)
        f0 = jnp.zeros((h, w, 3))
        params = net32.init(jax.random.PRNGKey(0), f0,
                            jnp.zeros((k, h, w, 1)), f0)
        gen = FusionGenerator(net, params, images, mem_freq=2)
        gen.reset(k)
        assert gen.bank.dtype == jnp.bfloat16
        labels = rng.randint(0, k + 1, (h, w))
        mask = np.stack([(labels == i + 1) for i in range(k)]
                        ).astype(np.float32)[..., None]
        probs = gen.interact_mask(mask, 1, 0, 3)
        s = probs[:, 2].sum(0)
        np.testing.assert_allclose(s, np.ones_like(s), atol=2e-2)
        assert np.isfinite(probs).all()


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path, rng):
        state = {"it": 7,
                 "params": {"w": jnp.asarray(rng.rand(4, 4), jnp.float32)},
                 "opt_state": {"m": jnp.zeros((4, 4))}}
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(7, state)
        assert mgr.latest_step() == 7
        back = mgr.restore(template=state)
        assert int(back["it"]) == 7
        np.testing.assert_allclose(np.asarray(back["params"]["w"]),
                                   np.asarray(state["params"]["w"]))

    def test_params_only_roundtrip(self, tmp_path, rng):
        params = {"a": jnp.asarray(rng.rand(3), jnp.float32)}
        save_params(str(tmp_path / "p"), params)
        back = load_params(str(tmp_path / "p"), params)
        np.testing.assert_allclose(np.asarray(back["a"]),
                                   np.asarray(params["a"]))


class TestEntryPoints:
    def test_cli_modules_import(self):
        """Entry scripts must be importable without optional deps or
        checkpoints (heavy work only happens under main())."""
        import importlib.util
        import sys
        from os import path

        root = path.dirname(path.dirname(__file__))
        for script in ["train.py", "eval_interactive_davis.py",
                       "generate_fusion.py", "bench.py"]:
            spec = importlib.util.spec_from_file_location(
                "entry_" + script[:-3], path.join(root, script))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            assert hasattr(mod, "main")
