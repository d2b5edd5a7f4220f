"""S2M network, scribble rasterization, S2M controller, DAVIS processor."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.davis_processor import DAVISProcessor
from mivos_tpu.interactive import scribbles as S
from mivos_tpu.interactive.s2m_controller import S2MController
from mivos_tpu.models.s2m import S2MNetwork


class TestScribbles:
    def test_rasterize_line(self):
        scr = {"scribbles": [[{"path": [[0.0, 0.0], [1.0, 0.0]],
                               "object_id": 2}], []]}
        m = S.scribbles2mask(scr, (8, 16))
        assert m.shape == (2, 8, 16)
        assert (m[0, 0] == 2).all()          # full top row drawn
        assert (m[0, 1:] == -1).all()        # everything else untouched
        assert (m[1] == -1).all()

    def test_single_point(self):
        scr = {"scribbles": [[{"path": [[0.5, 0.5]], "object_id": 1}]]}
        m = S.scribbles2mask(scr, (9, 9))
        assert m[0, 4, 4] == 1
        assert (m[0] == 1).sum() == 1

    def test_select_single_frame(self):
        scr = {"scribbles": [[], [{"path": [[0, 0]], "object_id": 1}], []]}
        red, idx = S.select_single_frame(scr)
        assert idx == 1 and len(red["scribbles"]) == 1
        assert S.annotated_frames(scr) == [1]
        assert not S.is_empty(scr)

    def test_mask_to_scribble_roundtrip(self):
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1
        scr = S.mask_to_scribble(mask, frame=0, num_frames=3)
        m = S.scribbles2mask(scr, (32, 32))
        ys, xs = np.nonzero(m[0] == 1)
        assert len(ys) > 0
        # scribble stays inside the object
        assert mask[ys, xs].all()


@pytest.fixture(scope="module")
def s2m_setup():
    net = S2MNetwork()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 64, 6)))
    return net, params


class TestS2M:
    def test_output_shape_and_upsampling(self, s2m_setup):
        net, params = s2m_setup
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(2, 48, 64, 6).astype(np.float32))
        y = net.apply(params, x)
        assert y.shape == (2, 48, 64, 1)
        assert not np.any(np.isnan(np.asarray(y)))

    def test_controller_batched(self, s2m_setup):
        net, params = s2m_setup
        rng = np.random.RandomState(1)
        K = 2
        ctrl = S2MController(net, params, K, ignore_class=255)
        image = jnp.asarray(rng.rand(48, 64, 3).astype(np.float32))
        prev = rng.randint(0, K + 1, (48, 64)).astype(np.uint8)
        scr = np.full((48, 64), 255, np.uint8)
        scr[10:12, 10:30] = 1
        scr[30:32, 10:30] = 0
        prob = ctrl.interact(image, prev, scr)
        assert prob.shape == (K, 48, 64, 1)
        agg = ctrl.interact(image, prev, scr, aggregate_hard=True)
        assert agg.shape == (K + 1, 48, 64, 1)
        a = np.asarray(agg)
        np.testing.assert_allclose(a.sum(0), 1.0, atol=1e-4)
        # hard aggregation is near one-hot
        assert (np.abs(a - np.round(a)) < 1e-3).mean() > 0.5


@pytest.fixture(scope="module")
def davis_setup(s2m_setup):
    from mivos_tpu.models.fusion import FusionNet
    from mivos_tpu.models.propagation import PropagationNetwork

    K = 2
    prop = PropagationNetwork(top_k=10)
    fuse = FusionNet()
    f = jnp.zeros((48, 64, 3))
    m = jnp.zeros((K, 48, 64, 1))
    pp = prop.init(jax.random.PRNGKey(0), f, m, f)
    fp = fuse.init(jax.random.PRNGKey(1), jnp.zeros((K, 48, 64, 3)),
                   jnp.zeros((K, 48, 64, 1)), jnp.zeros((K, 48, 64, 1)),
                   jnp.zeros((K, 48, 64, 2)), jnp.zeros((K, 2)))
    return prop, pp, fuse, fp, s2m_setup, K


class TestDAVISProcessor:
    def test_schedule_and_masks(self, davis_setup):
        prop, pp, fuse, fp, (s2m, sp), K = davis_setup
        rng = np.random.RandomState(0)
        T = 5
        images = rng.rand(T, 45, 62, 3).astype(np.float32)
        proc = DAVISProcessor(prop, pp, fuse, fp, s2m, sp, images, K,
                              mem=MemoryConfig(top_k=10, mem_freq=2))

        def round_scribble(frame):
            lines = [{"path": [[0.2, 0.2], [0.6, 0.2]], "object_id": 1},
                     {"path": [[0.2, 0.8], [0.6, 0.8]], "object_id": 2}]
            frames = [[] for _ in range(T)]
            frames[frame] = lines
            return {"scribbles": frames}

        # rounds 0,1: update only (schedule head == 2)
        masks, nxt, idx = proc.interact(round_scribble(0))
        assert nxt == [0] and idx == 0
        assert masks.shape == (T, 45, 62)
        masks, nxt, idx = proc.interact(round_scribble(0))
        assert nxt == [0]
        # round 2: propagation happens
        masks, nxt, idx = proc.interact(round_scribble(0))
        assert nxt is None
        assert all(proc.processor.prob[ti] is not None for ti in range(T))
        assert masks.max() <= K
