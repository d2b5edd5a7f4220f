"""Numerical parity against the reference torch implementation.

Random-initialized reference networks are run in torch (CPU), their
state dicts converted with mivos_tpu.checkpoint.convert, and the JAX
rebuild must reproduce the outputs. This is the guarantee that loading
the published .pth checkpoints yields the published accuracy.
"""
import os

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mivos_tpu.checkpoint import convert as C
from mivos_tpu.models.fusion import AttentionReadNetwork, FusionNet
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.models.s2m import S2MNetwork

from torch_oracle import (install_reference_stubs, nchw, nhwc, randomize_,
                          to_numpy_sd)

pytestmark = pytest.mark.skipif(not os.path.exists("/root/reference"),
                                reason="reference checkout not mounted")

install_reference_stubs()

H, W, K = 64, 96, 2
ATOL = 2e-4


@pytest.fixture(scope="module")
def ref_prop():
    from model.propagation.prop_net import PropagationNetwork as RefProp

    net = RefProp(top_k=10).eval()
    randomize_(net, seed=3)
    return net


@pytest.fixture(scope="module")
def data(rng_mod=np.random.RandomState(7)):
    frame = rng_mod.rand(1, H, W, 3).astype(np.float32)
    qframe = rng_mod.rand(1, H, W, 3).astype(np.float32)
    masks = (rng_mod.rand(K, H, W, 1) > 0.5).astype(np.float32)
    return frame, qframe, masks


class TestPropagationParity:
    def _flax(self, ref_prop):
        net = PropagationNetwork(top_k=10, read_backend="xla_exact")
        params = C.convert_prop_net(to_numpy_sd(ref_prop))
        return net, params

    def test_memorize(self, ref_prop, data):
        frame, _, masks = data
        net, params = self._flax(ref_prop)
        mk, mv = net.apply(params, jnp.asarray(frame[0]), jnp.asarray(masks),
                           method="memorize")
        with torch.no_grad():
            tk, tv = ref_prop.memorize(
                nchw(frame), torch.from_numpy(
                    masks.transpose(0, 3, 1, 2)[:, 0])[:, None])
        # torch: (K, C, 1, h16, w16) -> (K, h16*w16, C)
        tkn = tk[:, :, 0].permute(0, 2, 3, 1).reshape(K, -1, 128).numpy()
        tvn = tv[:, :, 0].permute(0, 2, 3, 1).reshape(K, -1, 512).numpy()
        np.testing.assert_allclose(np.asarray(mk), tkn, atol=ATOL)
        np.testing.assert_allclose(np.asarray(mv), tvn, atol=ATOL)

    def test_full_segment(self, ref_prop, data):
        frame, qframe, masks = data
        net, params = self._flax(ref_prop)

        # ---- reference pipeline
        with torch.no_grad():
            tk, tv = ref_prop.memorize(
                nchw(frame), torch.from_numpy(
                    masks.transpose(0, 3, 1, 2)[:, 0])[:, None])
            tq = ref_prop.get_query_values(nchw(qframe))
            t_out = ref_prop.segment_with_query(tk, tv, *tq)

        # ---- this framework
        mk, mv = net.apply(params, jnp.asarray(frame[0]), jnp.asarray(masks),
                           method="memorize")
        query = net.apply(params, jnp.asarray(qframe[0]),
                          method="get_query_values")
        valid = jnp.ones((mk.shape[1],), bool)
        out = net.apply(params, mk, mv, valid, *query,
                        method="segment_with_query")
        np.testing.assert_allclose(
            np.asarray(out)[..., 0], t_out[:, 0].numpy(), atol=ATOL)

    def test_attention(self, ref_prop, data):
        frame, qframe, masks = data
        net, params = self._flax(ref_prop)
        pos = masks * 0.7
        neg = masks * 0.2
        with torch.no_grad():
            tk, _ = ref_prop.memorize(
                nchw(frame), torch.from_numpy(
                    masks.transpose(0, 3, 1, 2)[:, 0])[:, None])
            tq = ref_prop.get_query_values(nchw(qframe))
            t_attn = ref_prop.get_attention(
                tk, torch.from_numpy(pos.transpose(0, 3, 1, 2)),
                torch.from_numpy(neg.transpose(0, 3, 1, 2)), tq[3])
        mk, _ = net.apply(params, jnp.asarray(frame[0]), jnp.asarray(masks),
                          method="memorize")
        query = net.apply(params, jnp.asarray(qframe[0]),
                          method="get_query_values")
        attn = net.apply(params, mk, jnp.asarray(pos), jnp.asarray(neg),
                         query[3], method="get_attention")
        np.testing.assert_allclose(np.asarray(attn),
                                   t_attn.permute(0, 2, 3, 1).numpy(),
                                   atol=ATOL)


class TestFusionParity:
    def test_forward(self, data):
        from model.fusion_net import FusionNet as RefFusion

        ref = RefFusion().eval()
        randomize_(ref, seed=5)
        rng = np.random.RandomState(0)
        im = rng.rand(K, H, W, 3).astype(np.float32)
        s1 = rng.rand(K, H, W, 1).astype(np.float32)
        s2 = rng.rand(K, H, W, 1).astype(np.float32)
        attn = rng.rand(K, H, W, 2).astype(np.float32)
        dist = rng.rand(K, 2).astype(np.float32)
        with torch.no_grad():
            t_out = ref(nchw(im), nchw(s1), nchw(s2), nchw(attn),
                        torch.from_numpy(dist))
        net = FusionNet()
        params = C.convert_fusion_net(to_numpy_sd(ref))
        out = net.apply(params, jnp.asarray(im), jnp.asarray(s1),
                        jnp.asarray(s2), jnp.asarray(attn),
                        jnp.asarray(dist))
        np.testing.assert_allclose(np.asarray(out), nhwc(t_out), atol=ATOL)


class TestS2MParity:
    def test_forward(self):
        from model.s2m.s2m_network import deeplabv3plus_resnet50

        ref = deeplabv3plus_resnet50(num_classes=1, output_stride=16,
                                     pretrained_backbone=False).eval()
        randomize_(ref, seed=9)
        rng = np.random.RandomState(1)
        x = rng.rand(1, H, W, 6).astype(np.float32)
        with torch.no_grad():
            t_out = ref(nchw(x))
        net = S2MNetwork()
        params = C.convert_s2m(to_numpy_sd(ref))
        out = net.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), nhwc(t_out), atol=ATOL)


class TestAttentionReadParity:
    def test_forward(self, ref_prop):
        from model.attn_network import AttentionReadNetwork as RefAttn

        ref = RefAttn().eval()
        randomize_(ref, seed=11)
        rng = np.random.RandomState(2)
        im = rng.rand(2, H, W, 3).astype(np.float32)
        qim = rng.rand(2, H, W, 3).astype(np.float32)
        ms = [rng.rand(2, H, W, 1).astype(np.float32) for _ in range(4)]
        with torch.no_grad():
            t1, t2 = ref(nchw(im), nchw(ms[0]), nchw(ms[1]), nchw(ms[2]),
                         nchw(ms[3]), nchw(qim))
        net = AttentionReadNetwork()
        params = C.convert_prop_net(to_numpy_sd(ref))
        a1, a2 = net.apply(params, jnp.asarray(im), jnp.asarray(ms[0]),
                           jnp.asarray(ms[1]), jnp.asarray(ms[2]),
                           jnp.asarray(ms[3]), jnp.asarray(qim))
        np.testing.assert_allclose(np.asarray(a1), nhwc(t1), atol=ATOL)
        np.testing.assert_allclose(np.asarray(a2), nhwc(t2), atol=ATOL)
