"""Fleet-parallel multi-device inference (eval/fleet.py): videos fanned
out across the virtual 8-device CPU mesh must reproduce the serial
single-device results exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.eval.fleet import fleet_map, propagate_videos
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.utils.tensor import one_hot_mask

T, H, W, K = 4, 48, 64, 2


@pytest.fixture(scope="module")
def net():
    prop = PropagationNetwork(top_k=10)
    f0 = jnp.zeros((H, W, 3))
    params = prop.init(jax.random.PRNGKey(0), f0,
                       jnp.zeros((K, H, W, 1)), f0)
    return prop, params


def _mk_inputs(n_videos: int):
    rng = np.random.RandomState(7)
    videos, masks = [], []
    for _ in range(n_videos):
        videos.append(rng.rand(T, H, W, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, K + 1, (H, W)))
        fg = one_hot_mask(labels, K)
        bg = 1.0 - fg.sum(0, keepdims=True)
        masks.append(np.asarray(jnp.concatenate([bg, fg], 0)))
    return videos, masks


def test_fleet_map_places_work_on_distinct_devices():
    import time

    devices = jax.local_devices()[:4]

    def place(x):
        time.sleep(0.3)   # hold every worker busy so each takes one item
        return list(jnp.asarray(x + 1.0).devices())[0]

    got = fleet_map(place, [1.0, 2.0, 3.0, 4.0], devices=devices)
    assert set(got) == set(devices)      # every device-owning lane ran
    # A worker owns ONE device: with more items than devices, placement
    # stays within the given devices (work stealing, no double-booking
    # by assignment).
    got2 = fleet_map(place, [float(i) for i in range(6)],
                     devices=devices[:2])
    assert set(got2) <= set(devices[:2])


def test_propagate_videos_matches_serial(net):
    prop, params = net
    videos, masks = _mk_inputs(3)
    mem = MemoryConfig(top_k=10, mem_freq=2)

    fleet = propagate_videos(prop, params, None, None, videos, masks,
                             mem=mem, devices=jax.local_devices()[:3])

    for v, m, got in zip(videos, masks, fleet):
        core = InferenceCore(prop, params, None, None, v, K, mem=mem)
        want = core.interact(m, 0)
        assert got.shape == (T, H, W)
        np.testing.assert_array_equal(got, want)


def test_fleet_map_workers_per_device():
    """workers_per_device > 1 adds lanes per chip; all items complete
    and placement stays within the device set."""
    devices = jax.local_devices()[:2]
    got = fleet_map(lambda x: list(jnp.asarray(x * 2.0).devices())[0],
                    [float(i) for i in range(5)], devices=devices,
                    workers_per_device=2)
    assert len(got) == 5 and set(got) <= set(devices)


def test_fleet_map_propagates_errors():
    def boom(x):
        raise ValueError("nope")

    with pytest.raises(RuntimeError, match="fleet item 0"):
        fleet_map(boom, [1], devices=jax.local_devices()[:2])
