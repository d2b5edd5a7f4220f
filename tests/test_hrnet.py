"""HRNet-OCR f-BRS backbone: shapes, OCR attention, model wrapper."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.models.hrnet import (FBRSHRNetModel, HighResolutionNet,
                                    spatial_gather)


class TestSpatialGather:
    def test_context_is_softmax_weighted_average(self, rng):
        b, h, w, c, k = 1, 4, 4, 8, 1
        feats = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        probs = jnp.asarray(rng.randn(b, h, w, k).astype(np.float32))
        ctx = spatial_gather(feats, probs)
        assert ctx.shape == (b, k, c)
        p = jax.nn.softmax(probs.reshape(b, h * w, k), axis=1)
        ref = jnp.einsum("bnk,bnc->bkc", p, feats.reshape(b, h * w, c))
        np.testing.assert_allclose(np.asarray(ctx), np.asarray(ref),
                                   atol=1e-5)


class TestHighResolutionNet:
    def test_small_w18_shapes(self, rng):
        net = HighResolutionNet(width=18, ocr_width=64, small=True)
        x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        out, aux = net.apply(params, x)
        # stride-4 binary logits
        assert out.shape == (1, 16, 24, 1)
        assert aux.shape == (1, 16, 24, 1)

    def test_param_tree_structure(self, rng):
        net = HighResolutionNet(width=18, ocr_width=64, small=True)
        x = jnp.zeros((1, 64, 64, 3))
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        for key in ["conv1", "bn1", "layer1_block0", "transition1_0_conv",
                    "stage2_m0", "stage3_m0", "stage4_m0", "aux_head_conv2",
                    "conv3x3_ocr_conv", "ocr_distri_head", "cls_head"]:
            assert key in params, sorted(params)[:20]
        # stage4 fuses 4 branches: downsample chain 3_0 has 3 convs
        m = params["stage4_m0"]
        assert "fuse3_0_conv0" in m and "fuse3_0_conv2" in m
        assert "fuse0_3_conv" in m


class TestFBRSHRNetModel:
    def test_full_resolution_logits(self, rng):
        net = FBRSHRNetModel(width=18, ocr_width=64, small=True)
        img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        pts = jnp.asarray([[[10, 12], [-1, -1], [30, 40], [-1, -1]]],
                          jnp.float32)
        params = net.init(jax.random.PRNGKey(0), img, pts)
        out = net.apply(params, img, pts)
        assert out.shape == (1, 64, 96, 1)
        out2, aux2 = net.apply(params, img, pts, with_aux=True)
        assert aux2.shape == (1, 64, 96, 1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_click_sensitivity(self, rng):
        """Moving the positive click must change the prediction (the
        dist-map channels feed the rgb_conv)."""
        net = FBRSHRNetModel(width=18, ocr_width=64, small=True)
        img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        p1 = jnp.asarray([[[10, 10], [-1, -1], [-1, -1], [-1, -1]]],
                         jnp.float32)
        p2 = jnp.asarray([[[50, 50], [-1, -1], [-1, -1], [-1, -1]]],
                         jnp.float32)
        params = net.init(jax.random.PRNGKey(0), img, p1)
        o1 = net.apply(params, img, p1)
        o2 = net.apply(params, img, p2)
        assert float(jnp.abs(o1 - o2).max()) > 1e-4


class TestHRNetReferenceParity:
    def test_converted_weights_match_reference_forward(self, rng):
        """Randomized reference HRNet-OCR (imported as a black box) vs
        this implementation under convert_fbrs_hrnet weights."""
        import sys
        from os import path
        sys.path.insert(0, path.dirname(__file__))
        from torch_oracle import (install_reference_stubs, nchw, nhwc,
                                  randomize_, to_numpy_sd)
        install_reference_stubs()
        import torch
        if not hasattr(np, "int"):  # reference uses the removed np.int
            np.int = int
        from fbrs.model.modeling.hrnet_ocr import HighResolutionNet as RefNet

        from mivos_tpu.checkpoint.convert import convert_fbrs_hrnet

        ref = RefNet(width=18, num_classes=1, ocr_width=64, small=True)
        randomize_(ref, seed=3)
        ref.eval()

        x = rng.rand(1, 64, 96, 3).astype(np.float32)
        with torch.no_grad():
            ref_out, ref_aux = ref(nchw(x))

        sd = {"feature_extractor." + k: v
              for k, v in to_numpy_sd(ref).items()}
        params = convert_fbrs_hrnet(sd)["params"]["feature_extractor"]

        net = HighResolutionNet(width=18, ocr_width=64, small=True)
        tmpl = net.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        from mivos_tpu.checkpoint.convert import assert_tree_matches
        assert_tree_matches(params, jax.tree.map(np.asarray, tmpl))

        out, aux = net.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(aux), nhwc(ref_aux),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out), nhwc(ref_out),
                                   atol=2e-3)


class TestHRNetBRSInterface:
    def test_head_input_replay_matches_full(self, rng):
        """head_input -> head_replay must reproduce __call__ exactly
        (the f-BRS optimizer replays only the head)."""
        net = FBRSHRNetModel(width=18, ocr_width=64, small=True)
        img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        pts = jnp.asarray([[[10, 12], [-1, -1], [30, 40], [-1, -1]]],
                          jnp.float32)
        params = net.init(jax.random.PRNGKey(0), img, pts)
        full = net.apply(params, img, pts)
        feats = net.apply(params, img, pts, method="head_input")
        assert feats.shape == (1, 16, 24, 15 * 18)
        replay = net.apply(params, feats, (64, 96), method="head_replay")
        np.testing.assert_allclose(np.asarray(replay), np.asarray(full),
                                   atol=1e-5)

    def test_works_with_fbrs_predictor(self, rng):
        """The generic FeatureBRSPredictor drives the HRNet variant via
        the same head_input/head_replay contract."""
        from mivos_tpu.interactive.clicker import Click, Clicker
        from mivos_tpu.interactive.fbrs_predictor import FeatureBRSPredictor

        net = FBRSHRNetModel(width=18, ocr_width=64, small=True)
        img = jnp.zeros((1, 64, 96, 3))
        pts = jnp.zeros((1, 2, 2))
        params = net.init(jax.random.PRNGKey(0), img, pts)
        pred = FeatureBRSPredictor(net, params, zoom_in=None, maxiter=2)
        pred.set_input_image(jnp.asarray(
            rng.rand(64, 96, 3).astype(np.float32)))
        clicker = Clicker()
        clicker.add_click(Click(True, (30, 40)))
        p1 = np.asarray(pred.get_prediction(clicker))
        assert p1.shape == (64, 96)
        assert np.isfinite(p1).all() and 0 <= p1.min() and p1.max() <= 1
        clicker.add_click(Click(False, (10, 80)))
        p2 = np.asarray(pred.get_prediction(clicker))  # BRS path
        assert np.isfinite(p2).all()
