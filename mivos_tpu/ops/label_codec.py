"""Block-sparse label-map codec for host downloads.

The per-round deliverable of an interactive session is a (T, H, W)
uint8 label map. Adaptive bit packing (pack_labels, used densely by
core/inference) already ships it at the information rate of the class
count, but on a remote-attached TPU the host link is tens of MB/s, so at 480p the
packed map is still ~100 KB/frame — a first-order cost of every
interaction round.

Label maps are piecewise constant: almost all 8x8 blocks are uniform
(one label), and only blocks crossed by an object boundary are mixed.
This codec exploits that with FIXED shapes (no data-dependent sizes, so
one executable serves every frame):

  encode (on device, fused into the propagation scan):
    * flags:  1 bit/block   — mixed?
    * values: `bits`/block  — the label of a uniform block
    * count:  int32         — number of mixed blocks
    * blocks: a (cap, 64*bits/8) buffer holding the packed pixels of
      the first `cap` mixed blocks in raster order

  decode (numpy, on host): paint uniform values, then paste the mixed
  blocks back by raster order. If count > cap the frame OVERFLOWED the
  buffer (boundary-heavy content) and the caller must fall back to a
  full-map fetch for that frame; `cap` defaults to 1/8 of the blocks,
  ~5-10x the boundary share of typical multi-object masks.

Everything ships as ONE flat (F, frame_bytes) uint8 blob per scan chunk
— per-transfer latency through the tunnel is ~40 ms, so one fetch per
chunk, not four.

Wire layout per frame (offsets static given (H, W, bits, cap)):
  [flags  ceil(nb/8) B][values nb*bits/8 B][count 4 B LE][blocks cap*bb B]
where nb = padded block count (multiple of 8), bb = 64*bits/8.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

BLOCK = 8


def pack_labels(x: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack values < 2**bits along the last axis (len divisible by
    8//bits) into uint8, MSB-first. The ONE home of the wire bit
    layout — core/inference.py imports both directions from here."""
    per = 8 // bits
    out = x[..., 0::per] << (8 - bits)
    for i in range(1, per):
        out = out | (x[..., i::per] << (8 - bits * (i + 1)))
    return out.astype(jnp.uint8)


def unpack_labels(packed: np.ndarray, bits: int) -> np.ndarray:
    per = 8 // bits
    m = (1 << bits) - 1
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * per,), np.uint8)
    for i in range(per):
        out[..., i::per] = (packed >> (8 - bits * (i + 1))) & m
    return out


@functools.lru_cache(maxsize=32)
def layout(h: int, w: int, bits: int, cap: int) -> dict:
    """Static wire offsets for a (h, w) frame at `bits`/px and a
    `cap`-block mixed buffer."""
    assert h % BLOCK == 0 and w % BLOCK == 0
    bh, bw = h // BLOCK, w // BLOCK
    nb = bh * bw
    nbp = -(-nb // 8) * 8          # flag/value packing wants /8
    bb = BLOCK * BLOCK * bits // 8  # bytes per raw mixed block
    o_flags = 0
    o_values = nbp // 8
    o_count = o_values + nbp * bits // 8
    o_blocks = o_count + 4
    return dict(bh=bh, bw=bw, nb=nb, nbp=nbp, bb=bb, cap=cap,
                o_flags=o_flags, o_values=o_values, o_count=o_count,
                o_blocks=o_blocks, frame_bytes=o_blocks + cap * bb)


def default_cap(h: int, w: int, frac: float = 0.125) -> int:
    """`frac` of the blocks (default 1/8) — generously above the
    boundary share of segmentation masks while keeping the buffer ~8x
    smaller than the dense map. The single home of the cap policy: cap
    determines frame_bytes and every decode offset, so sessions
    (core/inference.py) and wire-blob consumers must agree on it."""
    return max(8, int((h // BLOCK) * (w // BLOCK) * frac))


def encode_blocks(lab: jnp.ndarray, bits: int, cap: int) -> jnp.ndarray:
    """(F, H, W) uint8 labels -> (F, frame_bytes) uint8 wire blob.

    Traceable (static shapes only); meant to run inside the propagation
    scan's jit so the blob is what crosses the host link.
    """
    f, h, w = lab.shape
    ly = layout(h, w, bits, cap)
    nb, nbp, bb = ly["nb"], ly["nbp"], ly["bb"]
    blocks = lab.reshape(f, ly["bh"], BLOCK, ly["bw"], BLOCK)
    blocks = blocks.transpose(0, 1, 3, 2, 4).reshape(f, nb, BLOCK * BLOCK)

    mixed = (blocks.min(-1) != blocks.max(-1))             # (F, nb) bool
    count = mixed.sum(-1, dtype=jnp.int32)                 # (F,)

    def pad_nb(x, fill=0):
        if nbp == nb:
            return x
        return jnp.pad(x, ((0, 0), (0, nbp - nb)), constant_values=fill)

    flags = pack_labels(pad_nb(mixed).astype(jnp.uint8), 1)
    values = pack_labels(pad_nb(blocks[:, :, 0]), bits)

    # Compact the mixed blocks in raster order into a (cap+1)-row
    # buffer; non-mixed / overflow rows write to the dummy row `cap`.
    pos = jnp.cumsum(mixed, axis=-1) - 1                   # (F, nb)
    dest = jnp.where(mixed & (pos < cap), pos, cap)
    pblocks = pack_labels(blocks, bits)                # (F, nb, bb)
    buf = jnp.zeros((f, cap + 1, bb), jnp.uint8)
    buf = buf.at[jnp.arange(f)[:, None], dest].set(pblocks)

    cnt = count[:, None].astype(jnp.uint32)
    cbytes = jnp.concatenate(
        [((cnt >> (8 * i)) & 0xFF).astype(jnp.uint8) for i in range(4)],
        axis=-1)                                           # (F, 4) LE
    return jnp.concatenate(
        [flags, values, cbytes, buf[:, :cap].reshape(f, cap * bb)], axis=-1)


def decode_frame(blob_row: np.ndarray, h: int, w: int, bits: int,
                 cap: int) -> Optional[np.ndarray]:
    """One wire row -> (h, w) uint8 labels, or None on overflow
    (count > cap: the encoder dropped boundary blocks; refetch dense)."""
    ly = layout(h, w, bits, cap)
    nb, bb = ly["nb"], ly["bb"]
    count = int(np.frombuffer(
        blob_row[ly["o_count"]: ly["o_count"] + 4].tobytes(), "<u4")[0])
    if count > cap:
        return None
    flags = unpack_labels(
        blob_row[ly["o_flags"]: ly["o_values"]], 1)[:nb].astype(bool)
    values = unpack_labels(
        blob_row[ly["o_values"]: ly["o_count"]], bits)[:nb]

    out = np.repeat(values, BLOCK * BLOCK).reshape(nb, BLOCK * BLOCK)
    if count:
        raw = blob_row[ly["o_blocks"]: ly["o_blocks"] + count * bb]
        out[np.nonzero(flags)[0]] = unpack_labels(
            raw.reshape(count, bb), bits)
    out = out.reshape(ly["bh"], ly["bw"], BLOCK, BLOCK)
    return out.transpose(0, 2, 1, 3).reshape(h, w)


def decode_chunk(blob: np.ndarray, h: int, w: int, bits: int,
                 cap: int) -> Tuple[np.ndarray, np.ndarray]:
    """(F, frame_bytes) -> ((F, h, w) labels, (F,) overflow bool).
    Overflowed frames are zero-filled in the output; the caller must
    refetch them densely."""
    f = blob.shape[0]
    out = np.zeros((f, h, w), np.uint8)
    bad = np.zeros(f, bool)
    for i in range(f):
        dec = decode_frame(blob[i], h, w, bits, cap)
        if dec is None:
            bad[i] = True
        else:
            out[i] = dec
    return out, bad
