"""Junction between the DAVIS interactive protocol and InferenceCore
(reference: davis_processor.py).

Per interaction round: rasterize the round's scribbles, run S2M per
object against the current hard mask, then either propagate+fuse or just
update the frame — following the reference's [2, 5, 7] schedule
(davis_processor.py:34): rounds 0-2 stay on the same frame, the
propagation happens on the scheduled rounds.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.interactive.s2m_controller import S2MController
from mivos_tpu.interactive.scribbles import scribbles2mask, select_single_frame
from mivos_tpu.utils.tensor import compute_pad


class DAVISProcessor:
    def __init__(self, prop_net, prop_params, fuse_net, fuse_params,
                 s2m_net, s2m_params, images, num_objects: int,
                 mem: MemoryConfig = MemoryConfig(), mesh=None):
        """images: (T, h, w, 3) normalized, UNPADDED. mesh: required for
        the sharded session modes (MemoryConfig.bank_sharded /
        object_sharded), forwarded to InferenceCore."""
        self.k = num_objects
        self.t, self.h, self.w = images.shape[:3]
        self.pad = compute_pad(self.h, self.w, 16)

        self.processor = InferenceCore(prop_net, prop_params, fuse_net,
                                       fuse_params, images, num_objects,
                                       mem=mem, mesh=mesh)
        self.nh, self.nw = self.processor.nh, self.processor.nw
        # DAVIS scribbles use -1 as "no scribble" and thicken with a 3x3
        # dilation (reference davis_processor.py:53-60).
        self.s2m = S2MController(s2m_net, s2m_params, num_objects,
                                 ignore_class=-1, dilate_radius=1)

        self.interacted_count = 0
        self.davis_schedule = [2, 5, 7]  # reference davis_processor.py:34

    def to_mask(self, scribble: Dict) -> Tuple[jnp.ndarray, int]:
        """One round's scribbles -> hard-aggregated (K+1, nh, nw, 1) mask
        + interacted frame index (reference davis_processor.py:38-70)."""
        scribble, idx = select_single_frame(scribble)
        scr_mask = scribbles2mask(scribble, (self.h, self.w))[0]
        image = self.processor.get_image(idx)           # padded
        prev_hard = self._padded_hard_mask(idx)
        mask = self.s2m.interact(image, prev_hard, scr_mask,
                                 aggregate_hard=True)
        return mask, idx

    def _padded_hard_mask(self, idx: int) -> np.ndarray:
        lab = np.zeros((self.nh, self.nw), np.uint8)
        lw, uw, lh, uh = self.pad
        lab[lh: self.nh - uh, lw: self.nw - uw] = self.processor.np_masks[idx]
        return lab

    def interact(self, scribble: Dict):
        """Returns (masks (T, h, w) uint8, next_interact, frame_idx)
        (reference davis_processor.py:72-92)."""
        mask, idx = self.to_mask(scribble)
        # InferenceCore expects the RAW-grid mask; crop the padding.
        lw, uw, lh, uh = self.pad
        raw_mask = mask[:, lh: self.nh - uh, lw: self.nw - uw, :]

        if self.interacted_count == self.davis_schedule[0]:
            self.davis_schedule = self.davis_schedule[1:]
            next_interact = None
            out_masks = self.processor.interact(raw_mask, idx)
        else:
            next_interact = [idx]
            out_masks = self.processor.update_mask_only(raw_mask, idx)

        self.interacted_count += 1
        return out_masks, next_interact, idx
