"""End-to-end parity: the full InferenceCore session (interact ->
bidirectional propagate -> fuse -> argmax) against the REFERENCE
inference_core.py running the same randomized weights.

This covers everything the per-module parity tests cannot: the memory
bank commit schedule, certain-memory growth across rounds, the fusion
trigger/time-coefficient logic, aggregation chains, and padding/argmax
— the complete behavioral contract behind DAVIS AUC parity.
"""
import sys
from os import path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, path.dirname(__file__))
from torch_oracle import install_reference_stubs, randomize_, to_numpy_sd

install_reference_stubs()

import torch  # noqa: E402

from mivos_tpu.checkpoint.convert import (convert_fusion_net,  # noqa: E402
                                          convert_prop_net)
from mivos_tpu.config import MemoryConfig  # noqa: E402
from mivos_tpu.core.inference import InferenceCore  # noqa: E402
from mivos_tpu.models.fusion import FusionNet  # noqa: E402
from mivos_tpu.models.propagation import PropagationNetwork  # noqa: E402

T, H, W, K = 6, 48, 64, 2


@pytest.fixture(scope="module")
def shared():
    from inference_core import InferenceCore as RefCore
    from model.fusion_net import FusionNet as RefFusion
    from model.propagation.prop_net import PropagationNetwork as RefProp

    torch.manual_seed(0)
    ref_prop = RefProp(top_k=10)
    ref_fuse = RefFusion()
    randomize_(ref_prop, seed=1)
    randomize_(ref_fuse, seed=2)
    ref_prop.eval()
    ref_fuse.eval()

    prop_params = convert_prop_net(to_numpy_sd(ref_prop))
    fuse_params = convert_fusion_net(to_numpy_sd(ref_fuse))
    # exact read + fp32 so numerics track the oracle
    prop = PropagationNetwork(top_k=10, read_backend="xla_exact")
    fuse = FusionNet()

    rng = np.random.RandomState(3)
    images = rng.rand(T, H, W, 3).astype(np.float32)
    labels = rng.randint(0, K + 1, (H, W))
    onehot = np.stack([(labels == i) for i in range(K + 1)]
                      ).astype(np.float32)
    labels2 = np.roll(labels, 9, axis=1)
    onehot2 = np.stack([(labels2 == i) for i in range(K + 1)]
                       ).astype(np.float32)
    return (ref_prop, ref_fuse, RefCore, prop, prop_params, fuse,
            fuse_params, images, onehot, onehot2)


def _run_reference(shared):
    (ref_prop, ref_fuse, RefCore, *_rest) = shared
    images, onehot, onehot2 = shared[7], shared[8], shared[9]
    imgs_t = torch.from_numpy(
        images.transpose(0, 3, 1, 2)).unsqueeze(0)  # (1, T, 3, H, W)
    with torch.no_grad():
        core = RefCore(ref_prop, ref_fuse, imgs_t, K, mem_freq=3,
                       device="cpu")
        m1 = core.interact(
            torch.from_numpy(onehot).unsqueeze(1), 0).copy()
        m2 = core.interact(
            torch.from_numpy(onehot2).unsqueeze(1), T - 1).copy()
        # padded probabilities of a mid frame after round 2
        prob_mid = core.prob[:, T // 2, 0].numpy()
    return m1, m2, prob_mid


def _run_ours(shared, scan: bool):
    (_, _, _, prop, prop_params, fuse, fuse_params, images, onehot,
     onehot2) = shared
    core = InferenceCore(prop, prop_params, fuse, fuse_params, images, K,
                         mem=MemoryConfig(top_k=10, mem_freq=3))
    cb = None if scan else (lambda: None)
    m1 = core.interact(onehot[..., None], 0, step_cb=cb).copy()
    m2 = core.interact(onehot2[..., None], T - 1, step_cb=cb).copy()
    prob_mid = np.asarray(core.get_prob(T // 2))[..., 0]
    return m1, m2, prob_mid


class TestEndToEndParity:
    def test_two_round_session_matches_reference(self, shared):
        ref1, ref2, ref_prob = _run_reference(shared)
        for scan in (True, False):
            our1, our2, our_prob = _run_ours(shared, scan)
            agree1 = (ref1 == our1).mean()
            agree2 = (ref2 == our2).mean()
            # Identical weights, fp32, exact top-k. Random weights put
            # sigmoid outputs near 0.5 everywhere, so tiny conv/resize
            # accumulation differences flip borderline labels; the
            # probability field itself must stay close.
            assert agree1 > 0.99, (scan, agree1)
            assert agree2 > 0.95, (scan, agree2)
            prob_err = np.abs(our_prob - ref_prob)
            assert np.median(prob_err) < 0.01, (scan, np.median(prob_err))
            assert (prob_err < 0.05).mean() > 0.95, (scan,)
            # the interacted frames must match exactly
            np.testing.assert_array_equal(ref1[0], our1[0])
            np.testing.assert_array_equal(ref2[T - 1], our2[T - 1])
