"""Unit tests for the core tensor substrate vs torch reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mivos_tpu.ops.aggregate import aggregate_sbg, aggregate_wbg, aggregate_wbg_channel
from mivos_tpu.ops.resize import area_downsample, bilinear_resize
from mivos_tpu.utils import tensor as T


class TestPad:
    @pytest.mark.parametrize("h,w", [(480, 854), (100, 100), (16, 32), (1, 1)])
    def test_pad_divide_by_matches_torch_convention(self, h, w):
        x = np.random.RandomState(0).rand(2, h, w, 3).astype(np.float32)
        out, pad = T.pad_divide_by(jnp.asarray(x), 16)
        assert out.shape[1] % 16 == 0 and out.shape[2] % 16 == 0
        # torch convention (reference util/tensor_util.py:62-80)
        new_h = h + (16 - h % 16) % 16
        new_w = w + (16 - w % 16) % 16
        lh = (new_h - h) // 2
        lw = (new_w - w) // 2
        assert pad == (lw, new_w - w - lw, lh, new_h - h - lh)
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.pad(tx, pad).permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_unpad_roundtrip(self):
        x = jnp.arange(2 * 30 * 50 * 3, dtype=jnp.float32).reshape(2, 30, 50, 3)
        out, pad = T.pad_divide_by(x, 16)
        np.testing.assert_array_equal(np.asarray(T.unpad(out, pad)), np.asarray(x))

    def test_np_unpad_hw(self):
        x = np.zeros((5, 32, 64), np.uint8)
        assert T.np_unpad_hw(x, (2, 3, 1, 1)).shape == (5, 30, 59)


class TestOneHot:
    def test_one_hot_mask(self):
        labels = jnp.array([[0, 1], [2, 1]])
        oh = T.one_hot_mask(labels, 2)
        assert oh.shape == (2, 2, 2, 1)
        np.testing.assert_array_equal(
            np.asarray(oh[..., 0]),
            np.array([[[0, 1], [0, 1]], [[0, 0], [1, 0]]], np.float32),
        )


class TestAggregate:
    def _torch_wbg(self, prob, keep_bg=False, hard=False):
        p = torch.from_numpy(prob)
        new_prob = torch.cat(
            [torch.prod(1 - p, dim=0, keepdim=True), p], 0
        ).clamp(1e-7, 1 - 1e-7)
        logits = torch.log(new_prob / (1 - new_prob))
        if hard:
            logits = logits * 1000
        out = torch.softmax(logits, dim=0)
        return (out if keep_bg else out[1:]).numpy()

    @pytest.mark.parametrize("hard", [False, True])
    @pytest.mark.parametrize("keep_bg", [False, True])
    def test_wbg_matches_reference_formula(self, rng, keep_bg, hard):
        prob = rng.rand(3, 8, 8, 1).astype(np.float32)
        got = np.asarray(aggregate_wbg(jnp.asarray(prob), keep_bg, hard))
        ref = self._torch_wbg(prob, keep_bg, hard)
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_wbg_sums_to_one(self, rng):
        prob = rng.rand(4, 6, 6, 1).astype(np.float32)
        out = aggregate_wbg(jnp.asarray(prob), keep_bg=True)
        np.testing.assert_allclose(np.asarray(out.sum(0)), 1.0, atol=1e-5)

    def test_sbg_fixed_background(self, rng):
        prob = rng.rand(2, 4, 4, 1).astype(np.float32)
        p = torch.from_numpy(prob)
        ex = torch.cat([torch.full_like(p[:1], 0.5), p], 0).clamp(1e-7, 1 - 1e-7)
        ref = torch.softmax(torch.log(ex / (1 - ex)), dim=0).numpy()
        got = np.asarray(aggregate_sbg(jnp.asarray(prob), keep_bg=True))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_channel_variant(self, rng):
        prob = rng.rand(2, 3, 4, 4, 1).astype(np.float32)
        logits, soft = aggregate_wbg_channel(jnp.asarray(prob), keep_bg=True)
        assert logits.shape == (2, 4, 4, 4, 1)
        np.testing.assert_allclose(np.asarray(soft.sum(1)), 1.0, atol=1e-5)


class TestResize:
    def test_bilinear_up_matches_torch_align_corners_false(self, rng):
        x = rng.rand(2, 7, 9, 4).astype(np.float32)
        got = np.asarray(bilinear_resize(jnp.asarray(x), (14, 18)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(tx, size=(14, 18), mode="bilinear",
                            align_corners=False)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_bilinear_4x_matches_torch(self, rng):
        x = rng.rand(1, 5, 6, 2).astype(np.float32)
        got = np.asarray(bilinear_resize(jnp.asarray(x), (20, 24)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(tx, scale_factor=4, mode="bilinear",
                            align_corners=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_area_down_matches_torch(self, rng):
        x = rng.rand(3, 32, 48, 1).astype(np.float32)
        got = np.asarray(area_downsample(jnp.asarray(x), 16))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(tx, size=(2, 3), mode="area")
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-6)


class TestBuckets:
    def test_next_bucket(self):
        assert T.next_bucket(3, (1, 2, 4, 8)) == 4
        assert T.next_bucket(8, (1, 2, 4, 8)) == 8
        with pytest.raises(ValueError):
            T.next_bucket(9, (1, 2, 4, 8))

    def test_memory_buckets_monotone(self):
        b = T.memory_buckets(512)
        assert b[0] == 1 and b[-1] >= 512
        assert all(x < y for x, y in zip(b, b[1:]))


class TestCastParamsBf16:
    def test_bn_stays_fp32(self):
        import jax.numpy as jnp
        from mivos_tpu.utils.tensor import cast_params_bf16

        params = {"params": {
            "conv1": {"kernel": jnp.ones((3, 3, 4, 8)),
                      "bias": jnp.zeros((8,))},
            "bn1": {"scale": jnp.ones((8,)), "mean": jnp.zeros((8,)),
                    "var": jnp.ones((8,)), "bias": jnp.zeros((8,))},
            "transition1_0_bn": {"scale": jnp.ones((4,))},
        }}
        out = cast_params_bf16(params)
        p = out["params"]
        assert p["conv1"]["kernel"].dtype == jnp.bfloat16
        assert p["conv1"]["bias"].dtype == jnp.bfloat16
        assert p["bn1"]["scale"].dtype == jnp.float32
        assert p["bn1"]["var"].dtype == jnp.float32
        assert p["transition1_0_bn"]["scale"].dtype == jnp.float32
