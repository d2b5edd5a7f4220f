"""From-scratch init parity (VERDICT r4 item 7): the `init_flavor=
'gluon'` path of models/fbrs.py and models/hrnet.py must reproduce the
reference's from-scratch init distribution — XavierGluon kernels
(fbrs/model/initializer.py:79-105), zero biases/BN betas, unit BN
gammas (:11-44) — validated statistically against the REFERENCE
initializer applied to torch modules of the same shapes (black-box
oracle import, never copied)."""
import math

import jax
import numpy as np
import pytest

from tests.torch_oracle import install_reference_stubs

install_reference_stubs()

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
from fbrs.model import initializer as ref_init  # noqa: E402

from mivos_tpu.models.fbrs import FBRSDeepLabModel  # noqa: E402
from mivos_tpu.models.fbrs import init_params as fbrs_init  # noqa: E402
from mivos_tpu.models.initializer import apply_initializer  # noqa: E402


def _kernel_leaves(params):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [p.key for p in path if hasattr(p, "key")]
        out.append(("/".join(names), np.asarray(leaf)))
    return out


@pytest.fixture(scope="module")
def gluon_params():
    model = FBRSDeepLabModel(arch="resnet34", ch=128)
    img = np.zeros((1, 32, 32, 3), np.float32)
    pts = np.full((1, 2, 2), -1.0, np.float32)
    return fbrs_init(model, jax.random.PRNGKey(0), img, pts,
                     init_flavor="gluon")


class TestGluonFlavor:
    def test_kernels_match_reference_distribution(self, gluon_params):
        """Every conv/dense kernel is U(-s, s) with the reference's
        scale s = sqrt(3 / ((fan_in + fan_out)/2)): bounded by s, and
        (for kernels with enough elements) empirical std ~ s/sqrt(3)
        and mean ~ 0."""
        checked = 0
        for name, w in _kernel_leaves(gluon_params):
            if not name.endswith("kernel"):
                continue
            if w.ndim == 4:
                rf = w.shape[0] * w.shape[1]
                fan_in, fan_out = w.shape[2] * rf, w.shape[3] * rf
            else:
                fan_in, fan_out = w.shape[0], w.shape[1]
            s = math.sqrt(3.0 / ((fan_in + fan_out) / 2.0))
            assert np.abs(w).max() <= s * (1 + 1e-6), name
            if w.size >= 2000:
                std = w.std()
                assert abs(std - s / math.sqrt(3)) < 0.1 * s, \
                    (name, std, s)
                assert abs(w.mean()) < 0.05 * s, name
                checked += 1
        assert checked >= 10  # the stat assertions actually ran

    def test_scale_matches_torch_oracle(self, gluon_params):
        """Cross-check OUR fan/scale computation against the REFERENCE
        XavierGluon applied to torch convs of the same shapes: the
        empirical max-abs of both draws must approach the same bound."""
        torch.manual_seed(0)
        for name, w in _kernel_leaves(gluon_params):
            if not name.endswith("kernel") or w.ndim != 4 \
                    or w.size < 20000:
                continue
            kh, kw, cin, cout = w.shape
            conv = nn.Conv2d(cin, cout, (kh, kw), bias=False)
            conv.apply(ref_init.XavierGluon())  # uniform/avg/3 defaults
            ref_w = conv.weight.detach().numpy()
            # Large-sample max-abs of U(-s, s) sits within ~2% of s.
            assert abs(np.abs(w).max() - np.abs(ref_w).max()) \
                < 0.04 * np.abs(ref_w).max(), name
            assert abs(w.std() - ref_w.std()) < 0.05 * ref_w.std(), name

    def test_biases_and_bn_affine(self, gluon_params):
        """Reference Initializer.__call__ (:11-44): biases/BN betas 0,
        BN gammas 1, running stats untouched (mean 0 / var 1 defaults)."""
        for name, leaf in _kernel_leaves(gluon_params):
            if name.endswith("bias"):
                assert not leaf.any(), name
            elif name.endswith("scale"):
                assert (leaf == 1).all(), name
            elif name.endswith("mean"):
                assert not leaf.any(), name
            elif name.endswith("var"):
                assert (leaf == 1).all(), name

    def test_deterministic_and_distinct_per_layer(self, gluon_params):
        model = FBRSDeepLabModel(arch="resnet34", ch=128)
        img = np.zeros((1, 32, 32, 3), np.float32)
        pts = np.full((1, 2, 2), -1.0, np.float32)
        again = fbrs_init(model, jax.random.PRNGKey(0), img, pts,
                          init_flavor="gluon")
        a = jax.tree_util.tree_leaves(gluon_params)
        b = jax.tree_util.tree_leaves(again)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # Same-shape kernels in different layers get distinct draws
        # (per-kernel key folding).
        kers = [w for n, w in _kernel_leaves(gluon_params)
                if n.endswith("kernel")]
        shapes = {}
        found_pair = False
        for w in kers:
            if w.shape in shapes:
                assert not np.array_equal(w, shapes[w.shape])
                found_pair = True
            shapes[w.shape] = w
        assert found_pair

    def test_default_flavor_is_flax_init(self):
        model = FBRSDeepLabModel(arch="resnet34", ch=128)
        img = np.zeros((1, 32, 32, 3), np.float32)
        pts = np.full((1, 2, 2), -1.0, np.float32)
        d = fbrs_init(model, jax.random.PRNGKey(0), img, pts)
        plain = model.init(jax.random.PRNGKey(0), img, pts)
        for x, y in zip(jax.tree_util.tree_leaves(d),
                        jax.tree_util.tree_leaves(plain)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestHRNetFlavor:
    def test_hrnet_gluon_init(self):
        from mivos_tpu.models.hrnet import FBRSHRNetModel
        from mivos_tpu.models.hrnet import init_params as hrnet_init

        model = FBRSHRNetModel(width=18, ocr_width=32, small=True)
        img = np.zeros((1, 32, 32, 3), np.float32)
        pts = np.full((1, 2, 2), -1.0, np.float32)
        p = hrnet_init(model, jax.random.PRNGKey(1), img, pts,
                       init_flavor="gluon")
        for name, leaf in _kernel_leaves(p):
            if name.endswith("kernel") and leaf.ndim == 4:
                rf = leaf.shape[0] * leaf.shape[1]
                s = math.sqrt(3.0 / ((leaf.shape[2] * rf
                                      + leaf.shape[3] * rf) / 2.0))
                assert np.abs(leaf).max() <= s * (1 + 1e-6), name
            elif name.endswith("bias"):
                assert not leaf.any(), name
            elif name.endswith("scale"):
                assert (leaf == 1).all(), name


class TestApplyInitializerUnit:
    def test_tree_rewrite_semantics(self):
        params = {"params": {
            "conv": {"kernel": np.full((3, 3, 4, 8), 9.0, np.float32),
                     "bias": np.full((8,), 9.0, np.float32)},
            "some_bn": {"scale": np.full((8,), 9.0, np.float32),
                        "bias": np.full((8,), 9.0, np.float32),
                        "mean": np.full((8,), 7.0, np.float32),
                        "var": np.full((8,), 5.0, np.float32)}}}
        out = apply_initializer(params, jax.random.PRNGKey(0))
        p = out["params"]
        rf = 9
        s = math.sqrt(3.0 / ((4 * rf + 8 * rf) / 2.0))
        k = np.asarray(p["conv"]["kernel"])
        assert np.abs(k).max() <= s and np.abs(k).max() > 0
        assert not np.asarray(p["conv"]["bias"]).any()
        assert (np.asarray(p["some_bn"]["scale"]) == 1).all()
        assert not np.asarray(p["some_bn"]["bias"]).any()
        # Running stats untouched.
        assert (np.asarray(p["some_bn"]["mean"]) == 7).all()
        assert (np.asarray(p["some_bn"]["var"]) == 5).all()


class TestFrozenBNCalibration:
    def test_calibration_normalizes_toy_tower(self):
        """calibrate_frozen_bn writes measured input stats into frozen
        (mean, var): after calibration the last BN's output is ~N(0,1)
        even through a deliberately mis-scaled middle layer."""
        import flax.linen as nn
        import jax
        import numpy as np

        from mivos_tpu.models.initializer import calibrate_frozen_bn
        from mivos_tpu.models.layers import FrozenBatchNorm, conv3x3

        class Toy(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = conv3x3(8, name="c1")(x)
                x = FrozenBatchNorm(8, name="b1")(x)
                x = nn.relu(x) * 7.0 + 3.0
                x = FrozenBatchNorm(8, name="b2")(x)
                return x

        net = Toy()
        x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y0 = np.asarray(net.apply(params, x))
        assert abs(float(y0.std()) - 1) > 0.5  # uncalibrated: mis-scaled
        cal = calibrate_frozen_bn(net, params, (x,))
        y = np.asarray(net.apply(cal, x))
        assert abs(float(y.mean())) < 0.05
        assert abs(float(y.std()) - 1) < 0.1
        # kernels untouched — calibration only rewrites BN stats
        np.testing.assert_array_equal(
            params["params"]["c1"]["kernel"], cal["params"]["c1"]["kernel"])

    def test_inference_apply_unchanged(self):
        """The bn_stats sow is inert without mutable=['bn_stats']:
        plain apply returns the same array as before the sow existed."""
        import jax
        import numpy as np

        from mivos_tpu.models.layers import FrozenBatchNorm

        net = FrozenBatchNorm(4)
        x = np.random.RandomState(1).rand(2, 5, 5, 4).astype(np.float32)
        p = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(p, x)
        expect = (x - 0.0) / np.sqrt(1.0 + 1e-5)  # init stats (0,1)
        np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)

    def test_init_has_no_bn_stats_collection(self):
        """init() must return ONLY the params collection: during init
        every collection is mutable, so an unguarded bn_stats sow would
        leak full activation tensors into every model.init() result —
        and from there into optimizer state, jitted-step dead inputs,
        and save_params_npz artifacts (regression: round-5
        weights/fbrs_synthetic.npz shipped 67 such arrays)."""
        import jax
        import numpy as np

        from mivos_tpu.models.layers import FrozenBatchNorm

        net = FrozenBatchNorm(4)
        x = np.zeros((2, 5, 5, 4), np.float32)
        p = net.init(jax.random.PRNGKey(0), x)
        assert set(p.keys()) == {"params"}, list(p.keys())
        # The measurement path still works: apply with the collection
        # marked mutable records the BN input.
        _, aux = net.apply(p, x, mutable=["bn_stats"])
        assert "bn_stats" in aux and aux["bn_stats"]
