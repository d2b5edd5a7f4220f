"""f-BRS subsystem: distmaps/resize parity, L-BFGS, model parity vs the
reference fbrs torch implementation, end-to-end click loop."""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mivos_tpu.checkpoint import convert as C
from mivos_tpu.interactive.clicker import Click, Clicker
from mivos_tpu.interactive.fbrs_controller import FBRSController
from mivos_tpu.interactive.fbrs_predictor import FeatureBRSPredictor, ZoomIn
from mivos_tpu.models.fbrs import FBRSDeepLabModel
from mivos_tpu.ops.distmaps import dist_maps, pad_points
from mivos_tpu.ops.lbfgs import lbfgs_minimize
from mivos_tpu.ops.resize import bilinear_resize_align_corners

from torch_oracle import install_reference_stubs, nchw, nhwc, randomize_, to_numpy_sd

pytestmark = pytest.mark.skipif(not os.path.exists("/root/reference"),
                                reason="reference checkout not mounted")
install_reference_stubs()


class TestResizeAlignCorners:
    @pytest.mark.parametrize("shape,out", [((5, 7), (15, 21)),
                                           ((1, 1), (8, 8)),
                                           ((4, 4), (3, 9))])
    def test_matches_torch(self, rng, shape, out):
        x = rng.rand(2, *shape, 3).astype(np.float32)
        got = np.asarray(bilinear_resize_align_corners(jnp.asarray(x), out))
        ref = torch.nn.functional.interpolate(
            nchw(x), size=out, mode="bilinear", align_corners=True)
        np.testing.assert_allclose(got, nhwc(ref), atol=1e-5)


class TestDistMaps:
    def test_matches_reference_gpu_path(self, rng):
        from fbrs.model.ops import DistMaps as RefDistMaps

        h, w, p = 24, 30, 3
        ref_op = RefDistMaps(norm_radius=26.0, spatial_scale=1.0,
                             cpu_mode=False)
        pts = rng.rand(1, 2 * p, 2).astype(np.float32) * 20
        pts[0, 1] = (-1, -1)   # padded positive slot
        pts[0, 5] = (-1, -1)   # padded negative slot
        ref = ref_op.get_coord_features(torch.from_numpy(pts), 1, h, w)
        got = dist_maps(jnp.asarray(pts), h, w, norm_radius=26.0)
        np.testing.assert_allclose(np.asarray(got), nhwc(ref), atol=1e-5)

    def test_pad_points(self):
        pts = pad_points([(1, 2)], [(3, 4), (5, 6)], 4)
        assert pts.shape == (1, 8, 2)
        np.testing.assert_array_equal(np.asarray(pts[0, 0]), (1, 2))
        np.testing.assert_array_equal(np.asarray(pts[0, 4]), (3, 4))
        assert float(pts[0, 1].max()) == -1.0


class TestLBFGS:
    def test_quadratic(self):
        a = jnp.asarray(np.diag([1.0, 4.0, 9.0]).astype(np.float32))
        b = jnp.asarray([1.0, -2.0, 3.0])

        def fun(x):
            return 0.5 * x @ a @ x - b @ x, ()

        x, info = lbfgs_minimize(fun, jnp.zeros(3), maxiter=50)
        expected = np.linalg.solve(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(x), expected, atol=1e-4)

    def test_early_stop(self):
        calls = []

        def fun(x):
            return jnp.sum(x ** 2), jnp.sum(x ** 2)

        def stop_fn(aux, state):
            return jnp.asarray(True), state  # stop immediately

        x, info = lbfgs_minimize(fun, jnp.ones(4), maxiter=50,
                                 stop_fn=stop_fn, stop_state0=jnp.int32(0))
        assert int(info["iters"]) == 1


@pytest.fixture(scope="module")
def ref_fbrs():
    from fbrs.model.is_deeplab_model import get_deeplab_model

    net = get_deeplab_model(backbone="resnet50", norm_radius=26).eval()
    randomize_(net, seed=13)
    return net


@pytest.fixture(scope="module")
def flax_fbrs(ref_fbrs):
    net = FBRSDeepLabModel(norm_radius=26.0)
    params = C.convert_fbrs(to_numpy_sd(ref_fbrs))
    return net, params


class TestBackboneVariants:
    """ResNetV1b depth/width family (reference resnetv1b.py:227-266) +
    state-dict auto-detection (reference utils.py:67-88)."""

    @pytest.mark.parametrize("backbone,ch", [("resnet34", 128),
                                             ("resnet101", 256)])
    def test_forward_parity_and_detection(self, rng, backbone, ch):
        from fbrs.model.is_deeplab_model import get_deeplab_model

        ref = get_deeplab_model(backbone=backbone, deeplab_ch=ch,
                                norm_radius=26).eval()
        randomize_(ref, seed=17)
        sd = to_numpy_sd(ref)

        info = C.detect_fbrs_model(sd)
        assert info == {"kind": "deeplab", "backbone": backbone, "ch": ch}

        from mivos_tpu.models import build_fbrs_from_state_dict

        auto_net, params = build_fbrs_from_state_dict(sd)
        assert auto_net.arch == backbone and auto_net.ch == ch

        net = FBRSDeepLabModel(arch=backbone, ch=ch, norm_radius=26.0)
        h, w = 48, 64
        img = rng.rand(1, h, w, 3).astype(np.float32)
        pts = np.asarray([[[10.0, 12.0], [-1, -1], [30.0, 40.0], [-1, -1]]],
                         np.float32)
        with torch.no_grad():
            ref_out = ref(nchw(img), torch.from_numpy(pts))["instances"]
        got = net.apply(params, jnp.asarray(img), jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(got), nhwc(ref_out), atol=3e-4)

    def test_resnet152_constructs_and_detects(self, rng):
        """152 is constructible in the reference (resnetv1b.py:266) but
        its loader cannot auto-detect it (utils.py:80 raises); here the
        param-count ladder extends to it."""
        from mivos_tpu.models.fbrs import RESNETV1B_ARCHS, ResNetV1b

        net = ResNetV1b(**RESNETV1B_ARCHS["resnet152"])
        x = jnp.zeros((1, 32, 32, 3))
        params = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x))
        n_leaves = len(jax.tree_util.tree_leaves(params))
        # 3-deep stem + (3+8+36+3) bottlenecks: far past the 101 ladder.
        assert n_leaves > 531

        fake = {f"feature_extractor.backbone.p{i}.weight": np.zeros((1,))
                for i in range(600)}
        fake["feature_extractor.aspp.project.0.weight"] = np.zeros(
            (256, 1280, 1, 1), np.float32)
        info = C.detect_fbrs_model(fake)
        assert info["backbone"] == "resnet152"


class TestFBRSModelParity:
    def test_full_forward(self, ref_fbrs, flax_fbrs, rng):
        h, w = 64, 96
        net, params = flax_fbrs
        img = rng.rand(1, h, w, 3).astype(np.float32)
        pts = np.asarray([[[10.0, 12.0], [-1, -1], [30.0, 40.0], [-1, -1]]],
                         np.float32)
        with torch.no_grad():
            ref_out = ref_fbrs(nchw(img), torch.from_numpy(pts))["instances"]
        got = net.apply(params, jnp.asarray(img), jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(got), nhwc(ref_out), atol=3e-4)

    def test_head_input_shape(self, flax_fbrs, rng):
        net, params = flax_fbrs
        img = rng.rand(2, 64, 96, 3).astype(np.float32)
        pts = np.full((2, 4, 2), -1, np.float32)
        pts[:, 0] = (5, 5)
        feats = net.apply(params, jnp.asarray(img), jnp.asarray(pts),
                          method="head_input")
        assert feats.shape == (2, 16, 24, 288)


class TestClicker:
    def test_places_click_in_error_region(self):
        gt = np.zeros((40, 40), np.uint8)
        gt[10:30, 10:30] = 1
        clicker = Clicker(gt_mask=gt)
        pred = np.zeros((40, 40), bool)   # everything missed -> FN click
        clicker.make_next_click(pred)
        c = clicker.get_clicks()[0]
        assert c.is_positive
        y, x = int(c.coords[0]), int(c.coords[1])
        assert gt[y, x] == 1
        # now over-segment everything -> negative click outside gt
        pred = np.ones((40, 40), bool)
        clicker.make_next_click(pred)
        c2 = clicker.get_clicks()[1]
        assert not c2.is_positive
        assert gt[int(c2.coords[0]), int(c2.coords[1])] == 0


class TestEndToEndClicks:
    def test_click_loop_runs_and_improves(self, flax_fbrs, rng):
        """3 simulated clicks through the full predictor (zoom, flip,
        on-device L-BFGS). Random weights: just require valid probability
        maps, state continuity, undo support."""
        net, params = flax_fbrs
        h, w = 64, 96
        image = rng.rand(h, w, 3).astype(np.float32)
        gt = np.zeros((h, w), np.uint8)
        gt[20:50, 30:70] = 1
        ctrl = FBRSController(net, params)
        clicker = Clicker(gt_mask=gt)
        pred = np.zeros((h, w), bool)
        for i in range(3):
            clicker._get_next_click(pred)
            click = clicker._get_next_click(pred)
            clicker.add_click(click)
            out = ctrl.interact(image, click.coords[1], click.coords[0],
                                click.is_positive)
            assert out.shape == (h, w)
            assert set(np.unique(out)).issubset({0.0, 1.0})
            pred = out > 0.5
        assert len(ctrl.controller.probs_history) == 3
        undone = ctrl.undo()
        assert undone is not None and len(ctrl.controller.probs_history) == 2


class TestLimitLongestSide:
    def test_oversize_input_resized_and_inverted(self, rng):
        """max_size caps the network input; clicks are rescaled and the
        output comes back at the original resolution (reference
        transforms/limit_longest_side.py)."""
        import jax
        import jax.numpy as jnp

        from mivos_tpu.interactive.clicker import Click, Clicker
        from mivos_tpu.interactive.fbrs_predictor import FeatureBRSPredictor
        from mivos_tpu.models.fbrs import FBRSDeepLabModel

        net = FBRSDeepLabModel()
        img0 = jnp.zeros((1, 64, 96, 3))
        pts0 = jnp.zeros((1, 2, 2))
        params = net.init(jax.random.PRNGKey(0), img0, pts0)
        pred = FeatureBRSPredictor(net, params, zoom_in=None, maxiter=2,
                                   max_size=96)
        big = jnp.asarray(rng.rand(96, 192, 3).astype(np.float32))
        pred.set_input_image(big)
        assert pred.original_image.shape[1:3] == (48, 96)  # halved
        clicker = Clicker()
        clicker.add_click(Click(True, (48, 100)))
        prob = np.asarray(pred.get_prediction(clicker))
        assert prob.shape == (96, 192)  # back at original resolution
        assert np.isfinite(prob).all()


class TestPredictorDispatch:
    def _setup(self, rng):
        import jax
        import jax.numpy as jnp

        from mivos_tpu.models.fbrs import FBRSDeepLabModel

        net = FBRSDeepLabModel()
        img0 = jnp.zeros((1, 48, 64, 3))
        pts0 = jnp.zeros((1, 2, 2))
        params = net.init(jax.random.PRNGKey(0), img0, pts0)
        image = jnp.asarray(rng.rand(48, 64, 3).astype(np.float32))
        return net, params, image

    def test_get_predictor_modes(self, rng):
        from mivos_tpu.interactive.fbrs_predictor import (
            FeatureBRSPredictor, InputBRSPredictor, get_predictor)

        net, params, _ = self._setup(rng)
        assert isinstance(get_predictor(net, params, "NoBRS"),
                          FeatureBRSPredictor)
        p = get_predictor(net, params, "f-BRS-B")
        assert isinstance(p, FeatureBRSPredictor)
        p = get_predictor(net, params, "RGB-BRS")
        assert isinstance(p, InputBRSPredictor) and p.target == "rgb"
        p = get_predictor(net, params, "DistMap-BRS")
        assert p.target == "dist"
        with pytest.raises(ValueError):
            get_predictor(net, params, "nope")

    def test_input_brs_prediction(self, rng):
        """RGB-BRS runs the full-network input-bias optimization on
        device and returns a valid probability map."""
        from mivos_tpu.interactive.clicker import Click, Clicker
        from mivos_tpu.interactive.fbrs_predictor import get_predictor

        net, params, image = self._setup(rng)
        pred = get_predictor(net, params, "RGB-BRS",
                             predictor_params={"maxiter": 2})
        pred.set_input_image(image)
        clicker = Clicker()
        clicker.add_click(Click(True, (24, 30)))
        p1 = np.asarray(pred.get_prediction(clicker))  # no opt yet
        assert p1.shape == (48, 64)
        clicker.add_click(Click(False, (5, 60)))
        p2 = np.asarray(pred.get_prediction(clicker))  # optimized
        assert np.isfinite(p2).all() and 0 <= p2.min() and p2.max() <= 1
        assert pred.opt_data is not None and pred.opt_data.shape[-1] == 3


class TestInsertionModes:
    """f-BRS-A/B/C insertion points (reference brs.py:54-140 for DeepLab,
    :143-225 for HRNet; dispatch predictors/__init__.py:48-63)."""

    @pytest.fixture(scope="class")
    def deeplab(self, class_rng):
        net = FBRSDeepLabModel()
        img0 = jnp.zeros((1, 48, 64, 3))
        pts0 = jnp.zeros((1, 2, 2))
        params = net.init(jax.random.PRNGKey(0), img0, pts0)
        img = jnp.asarray(class_rng.rand(2, 48, 64, 3).astype(np.float32))
        pts = jnp.asarray([[[10, 12], [30, 40]], [[11, 13], [31, 41]]],
                          jnp.float32)
        return net, params, img, pts

    def test_after_c4_replay_matches_full(self, deeplab):
        net, params, img, pts = deeplab
        full = net.apply(params, img, pts)
        c4, c1 = net.apply(params, img, pts, method="head_input_c4")
        assert c4.shape[-1] == 2048    # aspp_in_channels
        assert c1.shape[-1] == 32      # skip projection
        replay = net.apply(params, c4, c1, (48, 64),
                           method="head_replay_c4")
        np.testing.assert_allclose(np.asarray(replay), np.asarray(full),
                                   atol=1e-5)

    def test_after_deeplab_replay_matches_full(self, deeplab):
        net, params, img, pts = deeplab
        full = net.apply(params, img, pts)
        feats = net.apply(params, img, pts, method="head_input_deeplab")
        assert feats.shape[-1] == 256  # feature_extractor.ch
        replay = net.apply(params, feats, (48, 64),
                           method="head_replay_deeplab")
        np.testing.assert_allclose(np.asarray(replay), np.asarray(full),
                                   atol=1e-5)

    @pytest.mark.parametrize("mode,channels", [
        ("f-BRS-A", 2048), ("f-BRS-B", 256 + 32), ("f-BRS-C", 256)])
    def test_lbfgs_converges_per_mode(self, deeplab, mode, channels):
        """Each insertion mode runs the on-device L-BFGS and the click
        constraint moves the prediction toward the click."""
        from mivos_tpu.interactive.clicker import Click, Clicker
        from mivos_tpu.interactive.fbrs_predictor import get_predictor

        net, params, img, _ = deeplab
        pred = get_predictor(net, params, mode,
                             predictor_params={"maxiter": 4})
        assert pred.insertion_mode == {
            "f-BRS-A": "after_c4", "f-BRS-B": "after_aspp",
            "f-BRS-C": "after_deeplab"}[mode]
        base = get_predictor(net, params, "NoBRS")
        clicker = Clicker()
        clicker.add_click(Click(True, (24, 30)))
        clicker.add_click(Click(False, (5, 60)))
        for p in (pred, base):
            p.set_input_image(img[0])
        p2 = np.asarray(pred.get_prediction(clicker))       # optimized
        p0 = np.asarray(base.get_prediction(clicker))       # raw net
        assert pred.opt_data.shape == (2 * channels,)
        assert np.isfinite(p2).all() and p2.shape == (48, 64)

        # L-BFGS keeps the best iterate (x0=0 reproduces the raw net:
        # scale=1, bias=0), so the BRS click loss can only improve.
        def click_loss(p):
            return (1.0 - p[24, 30]) ** 2 + p[5, 60] ** 2

        assert click_loss(p2) <= click_loss(p0) + 1e-5

    def test_hrnet_mode_c_replay_matches_full(self, class_rng):
        from mivos_tpu.models.hrnet import FBRSHRNetModel

        net = FBRSHRNetModel(width=18, ocr_width=64, small=True)
        img = jnp.asarray(class_rng.rand(1, 64, 96, 3).astype(np.float32))
        pts = jnp.asarray([[[10, 12], [-1, -1], [30, 40], [-1, -1]]],
                          jnp.float32)
        params = net.init(jax.random.PRNGKey(0), img, pts)
        full = net.apply(params, img, pts)
        feats = net.apply(params, img, pts, method="head_input_ocr")
        assert feats.shape[-1] == 2 * 64    # 2 * ocr_width
        replay = net.apply(params, feats, (64, 96),
                           method="head_replay_cls")
        np.testing.assert_allclose(np.asarray(replay), np.asarray(full),
                                   atol=1e-5)

    def test_hrnet_dispatch_and_lbfgs(self, class_rng):
        """get_predictor maps f-BRS-A/B -> HRNet 'A', f-BRS-C -> 'C'
        (reference predictors/__init__.py:61-63) and mode C optimizes."""
        from mivos_tpu.interactive.clicker import Click, Clicker
        from mivos_tpu.interactive.fbrs_predictor import get_predictor
        from mivos_tpu.models.hrnet import FBRSHRNetModel

        net = FBRSHRNetModel(width=18, ocr_width=64, small=True)
        img0 = jnp.zeros((1, 64, 96, 3))
        pts0 = jnp.zeros((1, 2, 2))
        params = net.init(jax.random.PRNGKey(0), img0, pts0)
        assert get_predictor(net, params, "f-BRS-A").insertion_mode == "A"
        assert get_predictor(net, params, "f-BRS-B").insertion_mode == "A"
        pred = get_predictor(net, params, "f-BRS-C",
                             predictor_params={"maxiter": 2})
        assert pred.insertion_mode == "C"
        img = jnp.asarray(class_rng.rand(64, 96, 3).astype(np.float32))
        pred.set_input_image(img)
        clicker = Clicker()
        clicker.add_click(Click(True, (32, 48)))
        clicker.add_click(Click(False, (5, 90)))
        p = np.asarray(pred.get_prediction(clicker))
        assert pred.opt_data.shape == (2 * 2 * 64,)
        assert np.isfinite(p).all() and p.shape == (64, 96)
