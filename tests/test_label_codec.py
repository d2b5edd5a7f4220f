"""Block-sparse label codec (ops/label_codec.py): roundtrip, overflow
fallback, wire-size, and session-level parity with dense packing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mivos_tpu.ops.label_codec import (decode_chunk, decode_frame,
                                       default_cap, encode_blocks, layout)


def blocky_labels(rng, f, h, w, k):
    """Piecewise-constant label maps: a few random rectangles per
    frame — the segmentation-like regime the codec targets."""
    lab = np.zeros((f, h, w), np.uint8)
    for i in range(f):
        for _ in range(4):
            y0, x0 = rng.randint(0, h - 8), rng.randint(0, w - 8)
            y1 = rng.randint(y0 + 1, h + 1)
            x1 = rng.randint(x0 + 1, w + 1)
            lab[i, y0:y1, x0:x1] = rng.randint(1, k + 1)
    return lab


@pytest.mark.parametrize("bits,k", [(1, 1), (2, 3), (4, 15)])
def test_roundtrip_exact(bits, k):
    rng = np.random.RandomState(bits)
    f, h, w = 3, 64, 80
    lab = blocky_labels(rng, f, h, w, k)
    cap = default_cap(h, w) + 40  # roomy: no overflow in this test
    blob = np.asarray(jax.jit(encode_blocks, static_argnums=(1, 2))(
        jnp.asarray(lab), bits, cap))
    assert blob.dtype == np.uint8
    assert blob.shape == (f, layout(h, w, bits, cap)["frame_bytes"])
    dec, bad = decode_chunk(blob, h, w, bits, cap)
    assert not bad.any()
    np.testing.assert_array_equal(dec, lab)


def test_overflow_flags_frame():
    """Per-pixel checkerboard makes EVERY block mixed -> count > cap
    -> decode refuses (caller refetches densely)."""
    h, w = 32, 32
    yy, xx = np.mgrid[:h, :w]
    lab = ((yy + xx) % 2).astype(np.uint8)[None]
    cap = 4  # 16 blocks, all mixed
    blob = np.asarray(encode_blocks(jnp.asarray(lab), 2, cap))
    assert decode_frame(blob[0], h, w, 2, cap) is None
    dec, bad = decode_chunk(blob, h, w, 2, cap)
    assert bad[0]


def test_mixed_and_uniform_mix():
    """Half the frame uniform, half adversarial; raster-order pasting
    must land each mixed block in the right place."""
    rng = np.random.RandomState(7)
    h, w = 48, 64
    lab = np.zeros((2, h, w), np.uint8)
    lab[:, :, : w // 2] = 2
    noise = rng.randint(0, 4, (2, h, w // 4)).astype(np.uint8)
    lab[:, :, -w // 4:] = noise
    n_mixed_max = (h // 8) * (w // 8)
    blob = np.asarray(encode_blocks(jnp.asarray(lab), 2, n_mixed_max))
    dec, bad = decode_chunk(blob, h, w, 2, n_mixed_max)
    assert not bad.any()
    np.testing.assert_array_equal(dec, lab)


def test_nb_not_multiple_of_8():
    """16x24 frame -> 6 blocks; flag/value packing pads to 8."""
    rng = np.random.RandomState(3)
    lab = blocky_labels(rng, 2, 16, 24, 3)
    blob = np.asarray(encode_blocks(jnp.asarray(lab), 2, 6))
    dec, bad = decode_chunk(blob, 16, 24, 2, 6)
    np.testing.assert_array_equal(dec[~bad], lab[~bad])
    assert not bad.any()


def test_wire_size_advantage_480p():
    """At the production 480p shape the blob must be well under the
    dense 2-bit map (the codec exists to shrink the label download)."""
    h, w = 480, 864
    dense = h * w * 2 // 8
    ly = layout(h, w, 2, default_cap(h, w))
    assert ly["frame_bytes"] * 6 < dense, (ly["frame_bytes"], dense)


def test_config_rejects_unknown_codec():
    from mivos_tpu.config import MemoryConfig
    with pytest.raises(ValueError):
        MemoryConfig(label_codec="blocks")
    with pytest.raises(ValueError):
        MemoryConfig(label_block_cap_frac=0.0)


def test_session_block_codec_matches_packed():
    """InferenceCore(label_codec='block') must return the same labels
    as 'packed' — same probs, same argmax, different wire format; the
    tiny frame (cap=8) also exercises the dense overflow fallback."""
    from mivos_tpu.config import MemoryConfig
    from mivos_tpu.core.inference import InferenceCore
    from mivos_tpu.models.propagation import PropagationNetwork
    from mivos_tpu.utils.tensor import one_hot_mask

    t, rh, rw, k = 6, 45, 62, 2
    prop = PropagationNetwork(top_k=10)
    frame = jnp.zeros((48, 64, 3))
    pp = prop.init(jax.random.PRNGKey(0), frame,
                   jnp.zeros((k, 48, 64, 1)), frame)
    rng = np.random.RandomState(0)
    images = rng.rand(t, rh, rw, 3).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, k + 1, (rh, rw)))
    fg = one_hot_mask(labels, k)
    mask = jnp.concatenate([1.0 - fg.sum(0, keepdims=True), fg], 0)

    outs = {}
    for codec in ("packed", "block"):
        core = InferenceCore(prop, pp, None, None, images, k,
                             mem=MemoryConfig(top_k=10, mem_freq=2,
                                              label_codec=codec))
        assert core._codec == codec
        outs[codec] = core.interact(mask, idx=0).copy()
    np.testing.assert_array_equal(outs["packed"], outs["block"])
