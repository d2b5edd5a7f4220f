"""f-BRS-B predictor: feature-space scale/bias optimization on device.

Reference: fbrs/inference/predictors/{base,brs,brs_functors,brs_losses}.py
and transforms/{zoom_in,flip,base}.py. The pipeline per click:

  ZoomIn crop -> [image, flipped] batch -> cached after-ASPP features
  -> L-BFGS over (scale, bias) through the small head replay -> sigmoid
  -> unflip-average -> paste back into the full frame.

TPU-native rework:
  * the whole L-BFGS optimization is ONE jitted while_loop on device
    (ops/lbfgs.py) instead of scipy callbacks with host<->device copies
    per evaluation (brs_functors.py:41-77);
  * the click tensor is padded to buckets so click count never retraces;
  * ZoomIn crop sizes are bucketed to multiples of 32 so at most a few
    head shapes ever compile per session.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mivos_tpu.interactive.clicker import Click
from mivos_tpu.models.fbrs import FBRSDeepLabModel
from mivos_tpu.ops.lbfgs import lbfgs_minimize
from mivos_tpu.ops.resize import bilinear_resize_align_corners as up_ac
from mivos_tpu.utils.tensor import next_bucket

CLICK_BUCKETS = (1, 2, 4, 8, 12, 16, 24)


# ---------------------------------------------------------------------------
# jitted pieces (shared per model config via lru_cache)
# ---------------------------------------------------------------------------

# insertion mode -> (head-input method, replay method, input-is-pair).
# DeepLab modes are the reference's brs.py:54-140 insertion points;
# 'A'/'C' are the HRNet variants (brs.py:143-225). For 'after_c4' the
# cached input is a PAIR (c4, projected c1): scale/bias applies to c4,
# c1 stays constant through the optimization.
INSERTION_MODES = {
    "after_aspp": ("head_input", "head_replay", False),
    "after_c4": ("head_input_c4", "head_replay_c4", True),
    "after_deeplab": ("head_input_deeplab", "head_replay_deeplab", False),
    "A": ("head_input", "head_replay", False),
    "C": ("head_input_ocr", "head_replay_cls", False),
}


@functools.lru_cache(maxsize=16)
def _fbrs_fns(net: FBRSDeepLabModel, insertion_mode: str = "after_aspp",
              reg_weight: float = 1e-3,
              reg_bias_weight: float = 10.0, prob_thresh: float = 0.49,
              min_iou_diff: float = 0.01, maxiter: int = 20):
    in_method, replay_method, pair = INSERTION_MODES[insertion_mode]

    head_input = jax.jit(
        lambda p, image, points: net.apply(p, image, points,
                                           method=in_method))

    def _replay(p, feats, aux, out_h, out_w):
        if pair:
            return net.apply(p, feats, aux, (out_h, out_w),
                             method=replay_method)
        return net.apply(p, feats, (out_h, out_w), method=replay_method)

    @jax.jit
    def full_forward(p, image, points):
        return net.apply(p, image, points)

    @functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
    def optimize(p, feats, aux, pos_mask, neg_mask, x0, out_h, out_w):
        """feats: (B, h, w, C) cached head input (B=2 with flip); aux:
        constant side features for pair modes (0-size dummy otherwise);
        pos/neg_mask: (1, out_h, out_w, 1) click maps; x0: (2C,)
        scale/bias vector. Returns (best_x, logits_at_best)."""
        c = feats.shape[-1]

        def predict(x):
            scale = 1.0 + x[:c]
            bias = x[c:]
            scaled = feats * scale[None, None, None, :] + \
                bias[None, None, None, :]
            return _replay(p, scaled, aux, out_h, out_w)

        def loss_fn(x):
            logits = predict(x)
            result = jax.nn.sigmoid(logits)
            # flip-average (brs_functors.py:51-54)
            r = 0.5 * (result[:1] + result[1:, :, ::-1])
            pos_diff = (1.0 - r) * pos_mask
            neg_diff = r * neg_mask
            # BRSMaskLoss (brs_losses.py:11-26)
            loss = jnp.sum(pos_diff ** 2) / (jnp.sum(pos_mask) + 1e-5) + \
                jnp.sum(neg_diff ** 2) / (jnp.sum(neg_mask) + 1e-5)
            reg = reg_weight * (jnp.sum(x[:c] ** 2) +
                                reg_bias_weight * jnp.sum(x[c:] ** 2))
            f_max_pos = jnp.max(jnp.abs(pos_diff))
            f_max_neg = jnp.max(jnp.abs(neg_diff))
            mask = (r > prob_thresh)[0, ..., 0]
            return loss + reg, (f_max_pos, f_max_neg, mask)

        def stop_fn(aux, last_mask):
            f_max_pos, f_max_neg, mask = aux
            clicks_ok = jnp.logical_and(f_max_pos < (1 - prob_thresh),
                                        f_max_neg < prob_thresh)
            inter = jnp.sum(jnp.logical_and(mask, last_mask))
            union = jnp.sum(jnp.logical_or(mask, last_mask))
            iou = inter / jnp.maximum(union, 1)
            converged = iou > (1 - min_iou_diff)
            return jnp.logical_or(clicks_ok, converged), mask

        last_mask0 = jnp.zeros((out_h, out_w), bool)
        best_x, _ = lbfgs_minimize(loss_fn, x0, maxiter=maxiter,
                                   memory_size=20, stop_fn=stop_fn,
                                   stop_state0=last_mask0)
        return best_x, predict(best_x)

    @functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
    def optimize_oracle(p, feats, aux, gt, x0, out_h, out_w):
        """OracleMaskLoss BRS (reference brs_losses.py:29-58): optimize
        the scale/bias toward the GROUND-TRUTH mask via from-sigmoid BCE
        instead of the click constraints. gt: (1, out_h, out_w, 1).
        The reference's 5-step loss-plateau cutoff becomes a
        consecutive-step plateau in the jitted while_loop."""
        from mivos_tpu.train.fbrs_losses import sigmoid_bce_from_probs

        c = feats.shape[-1]

        def predict(x):
            scale = 1.0 + x[:c]
            bias = x[c:]
            scaled = feats * scale[None, None, None, :] + \
                bias[None, None, None, :]
            return _replay(p, scaled, aux, out_h, out_w)

        def loss_fn(x):
            result = jax.nn.sigmoid(predict(x))
            gt2 = jnp.concatenate([gt, gt[:, :, ::-1]], axis=0)
            loss = jnp.mean(sigmoid_bce_from_probs(result, gt2))
            reg = reg_weight * (jnp.sum(x[:c] ** 2) +
                                reg_bias_weight * jnp.sum(x[c:] ** 2))
            return loss + reg, loss

        def stop_fn(aux_loss, last_loss):
            plateau = jnp.abs(aux_loss - last_loss) < 1e-5
            return plateau, aux_loss

        best_x, _ = lbfgs_minimize(loss_fn, x0, maxiter=maxiter,
                                   memory_size=20, stop_fn=stop_fn,
                                   stop_state0=jnp.inf)
        return best_x, predict(best_x)

    return head_input, full_forward, optimize, optimize_oracle


# ---------------------------------------------------------------------------
# ZoomIn (host logic; reference transforms/zoom_in.py)
# ---------------------------------------------------------------------------

def _bbox_from_mask(mask: np.ndarray) -> Tuple[int, int, int, int]:
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return rmin, rmax, cmin, cmax


def _expand_bbox(bbox, expand_ratio, min_crop_size):
    rmin, rmax, cmin, cmax = bbox
    rcenter = 0.5 * (rmin + rmax)
    ccenter = 0.5 * (cmin + cmax)
    height = expand_ratio * (rmax - rmin + 1)
    width = expand_ratio * (cmax - cmin + 1)
    height = max(height, min_crop_size)
    width = max(width, min_crop_size)
    return (int(round(rcenter - 0.5 * height)),
            int(round(rcenter + 0.5 * height)),
            int(round(ccenter - 0.5 * width)),
            int(round(ccenter + 0.5 * width)))


def _clamp_bbox(bbox, rmin, rmax, cmin, cmax):
    return (max(rmin, bbox[0]), min(rmax, bbox[1]),
            max(cmin, bbox[2]), min(cmax, bbox[3]))


def _bbox_iou(b1, b2) -> float:
    h_i = max(min(b1[1], b2[1]) - max(b1[0], b2[0]) + 1, 0)
    w_i = max(min(b1[3], b2[3]) - max(b1[2], b2[2]) + 1, 0)
    inter = h_i * w_i
    a1 = (b1[1] - b1[0] + 1) * (b1[3] - b1[2] + 1)
    a2 = (b2[1] - b2[0] + 1) * (b2[3] - b2[2] + 1)
    return inter / max(a1 + a2 - inter, 1)


class ZoomIn:
    """Crop-to-object transform (reference zoom_in.py:8-124). Crop sizes
    are bucketed to multiples of 32 (slight aspect change, bounded by
    32/target) so XLA sees a small closed set of shapes."""

    def __init__(self, target_size: int = 480, skip_clicks: int = 1,
                 expansion_ratio: float = 1.4, min_crop_size: int = 200,
                 recompute_thresh_iou: float = 0.5, prob_thresh: float = 0.5):
        self.target_size = target_size
        self.skip_clicks = skip_clicks
        self.expansion_ratio = expansion_ratio
        self.min_crop_size = min_crop_size
        self.recompute_thresh_iou = recompute_thresh_iou
        self.prob_thresh = prob_thresh
        self.reset()

    def reset(self):
        self._input_hw = None
        self._prev_probs: Optional[np.ndarray] = None  # (1, H, W, 1)
        self._object_roi = None
        self._roi_image = None
        self.image_changed = False

    def _roi_out_size(self, height, width):
        scale = self.target_size / max(height, width)
        nh = int(round(height * scale))
        nw = int(round(width * scale))
        bucket = lambda v: max(32, int(np.ceil(v / 32) * 32))
        return bucket(nh), bucket(nw)

    def transform(self, image: jax.Array, clicks: List[Click]):
        self.image_changed = False
        if len(clicks) <= self.skip_clicks:
            return image, clicks
        self._input_hw = image.shape[1:3]

        current_roi = None
        if self._prev_probs is not None:
            pred = self._prev_probs[0, ..., 0] > self.prob_thresh
            if pred.sum() > 0:
                pred = pred.copy()
                for c in clicks:
                    if c.is_positive:
                        pred[int(c.coords[0]), int(c.coords[1])] = 1
                bbox = _expand_bbox(_bbox_from_mask(pred),
                                    self.expansion_ratio, self.min_crop_size)
                h, w = pred.shape
                current_roi = _clamp_bbox(bbox, 0, h - 1, 0, w - 1)
        if current_roi is None:
            return image, clicks

        update = (self._object_roi is None
                  or not self._clicks_inside(clicks)
                  or _bbox_iou(current_roi, self._object_roi)
                  < self.recompute_thresh_iou)
        if update:
            self._object_roi = current_roi
            rmin, rmax, cmin, cmax = current_roi
            crop = image[:, rmin:rmax + 1, cmin:cmax + 1]
            out_hw = self._roi_out_size(rmax - rmin + 1, cmax - cmin + 1)
            self._roi_image = up_ac(crop, out_hw)
            self.image_changed = True

        return self._roi_image, self._transform_clicks(clicks)

    def _clicks_inside(self, clicks) -> bool:
        r = self._object_roi
        for c in clicks:
            if c.is_positive:
                if not (r[0] <= c.coords[0] < r[1] and
                        r[2] <= c.coords[1] < r[3]):
                    return False
        return True

    def _transform_clicks(self, clicks):
        if self._object_roi is None:
            return clicks
        rmin, rmax, cmin, cmax = self._object_roi
        ch, cw = self._roi_image.shape[1:3]
        return [Click(c.is_positive,
                      (ch * (c.coords[0] - rmin) / (rmax - rmin + 1),
                       cw * (c.coords[1] - cmin) / (cmax - cmin + 1)))
                for c in clicks]

    def inv_transform(self, prob: jax.Array) -> jax.Array:
        """prob: (1, h, w, 1) sigmoid probabilities at crop resolution."""
        if self._object_roi is None:
            self._prev_probs = np.asarray(prob)
            return prob
        rmin, rmax, cmin, cmax = self._object_roi
        prob = up_ac(prob, (rmax - rmin + 1, cmax - cmin + 1))
        new = jnp.zeros((1,) + tuple(self._input_hw) + (1,), prob.dtype)
        new = new.at[:, rmin:rmax + 1, cmin:cmax + 1].set(prob)
        self._prev_probs = np.asarray(new)
        return new

    def get_state(self):
        return (self._input_hw, self._object_roi, self._prev_probs,
                self._roi_image, self.image_changed)

    def set_state(self, state):
        (self._input_hw, self._object_roi, self._prev_probs,
         self._roi_image, self.image_changed) = state


# ---------------------------------------------------------------------------
# Predictor
# ---------------------------------------------------------------------------

class FeatureBRSPredictor:
    """Feature-space BRS over a DistMapsModel (reference brs.py:54-225),
    always with_flip + flip_average. insertion_mode selects where the
    scale/bias variables insert: 'after_c4' (f-BRS-A), 'after_aspp'
    (f-BRS-B), 'after_deeplab' (f-BRS-C) for DeepLab models, 'A'/'C'
    for HRNet models."""

    def __init__(self, net: FBRSDeepLabModel, params,
                 zoom_in: Optional[ZoomIn] = None,
                 net_clicks_limit: int = 8,
                 optimize_after_n_clicks: int = 1,
                 maxiter: int = 20,
                 max_size: Optional[int] = None,
                 insertion_mode: str = "after_aspp"):
        self.net = net
        self.params = params
        self.zoom_in = zoom_in
        self.net_clicks_limit = net_clicks_limit
        self.optimize_after_n_clicks = optimize_after_n_clicks
        self.insertion_mode = insertion_mode
        self._input_is_pair = INSERTION_MODES[insertion_mode][2]
        (self._head_input, self._full_forward, self._optimize,
         self._optimize_oracle) = _fbrs_fns(net, insertion_mode,
                                            maxiter=maxiter)
        # OracleMaskLoss hook (reference brs_losses.py:29-58): when a GT
        # mask is attached, the BRS optimization targets it instead of
        # the click constraints (upper-bound experiments).
        self.oracle_gt = None
        # LimitLongestSide (reference transforms/limit_longest_side.py):
        # downscale oversize inputs before prediction, invert at the end.
        self.max_size = max_size
        self._limit_scale = 1.0
        self._orig_hw = None
        self.original_image = None
        self.opt_data = None
        self.input_data = None
        self._input_key = None

    def set_input_image(self, image: jax.Array):
        """image: (H, W, 3) normalized."""
        if self.zoom_in is not None:
            self.zoom_in.reset()
        image = jnp.asarray(image)
        self._orig_hw = image.shape[:2]
        self._limit_scale = 1.0
        if self.max_size is not None:
            longest = max(self._orig_hw)
            if longest > self.max_size:
                self._limit_scale = self.max_size / longest
                nh = int(round(self._orig_hw[0] * self._limit_scale))
                nw = int(round(self._orig_hw[1] * self._limit_scale))
                image = up_ac(image[None], (nh, nw))[0]
        self.original_image = image[None]
        self.opt_data = None
        self.input_data = None
        self._input_key = None

    def _points_nd(self, clicks: List[Click]) -> jax.Array:
        clicks = clicks[:self.net_clicks_limit]
        pos = [c.coords for c in clicks if c.is_positive]
        neg = [c.coords for c in clicks if not c.is_positive]
        p = next_bucket(max(len(pos), len(neg), 1), CLICK_BUCKETS)
        arr = np.full((1, 2 * p, 2), -1.0, np.float32)
        if pos:
            arr[0, :len(pos)] = pos
        if neg:
            arr[0, p:p + len(neg)] = neg
        return jnp.asarray(arr)

    def _clicks_maps(self, clicks: List[Click], hw, radius: int = 1):
        pos = np.zeros((1,) + tuple(hw) + (1,), np.float32)
        neg = np.zeros((1,) + tuple(hw) + (1,), np.float32)
        for c in clicks:
            y, x = int(round(c.coords[0])), int(round(c.coords[1]))
            t = pos if c.is_positive else neg
            t[0, max(0, y - radius): y + radius + 1,
              max(0, x - radius): x + radius + 1] = 1.0
        return jnp.asarray(pos), jnp.asarray(neg)

    def get_prediction(self, clicker) -> jax.Array:
        """-> (H, W) numpy-convertible probability map on the full frame."""
        clicks = clicker.get_clicks()
        if self._limit_scale != 1.0:
            s = self._limit_scale
            clicks = [Click(c.is_positive,
                            (c.coords[0] * s, c.coords[1] * s))
                      for c in clicks]
        image = self.original_image
        tclicks = clicks
        if self.zoom_in is not None:
            image, tclicks = self.zoom_in.transform(image, clicks)
        h, w = image.shape[1:3]
        num_clicks = len(tclicks)

        points = self._points_nd(tclicks)
        # with_flip: batch = [image, hflip(image)], flipped clicks
        fpoints = points.at[..., 1].set(
            jnp.where(points[..., 1] >= 0, w - 1 - points[..., 1], -1.0))
        batch = jnp.concatenate([image, image[:, :, ::-1]], axis=0)
        bpoints = jnp.concatenate([points, fpoints], axis=0)

        feats_key = (h, w, int(points.shape[1]), num_clicks)
        recompute = (self.input_data is None or self._input_key is None
                     or self._input_key[:2] != (h, w)
                     or (self.zoom_in is not None
                         and self.zoom_in.image_changed)
                     or num_clicks <= self.net_clicks_limit)
        if recompute:
            self.input_data = self._head_input(self.params, batch, bpoints)
            self._input_key = feats_key

        if self._input_is_pair:
            feats, aux = self.input_data
        else:
            feats, aux = self.input_data, jnp.zeros((0,))
        c = feats.shape[-1]
        if self.opt_data is None or self.opt_data.shape[0] != 2 * c:
            self.opt_data = jnp.zeros((2 * c,), jnp.float32)

        pos_map, neg_map = self._clicks_maps(tclicks, (h, w))
        if num_clicks > self.optimize_after_n_clicks:
            if self.oracle_gt is not None:
                gt = self._oracle_gt_for_crop((h, w))
                self.opt_data, logits = self._optimize_oracle(
                    self.params, feats, aux, gt, self.opt_data, h, w)
            else:
                self.opt_data, logits = self._optimize(
                    self.params, feats, aux, pos_map, neg_map,
                    self.opt_data, h, w)
            prob = jax.nn.sigmoid(logits)
        else:
            logits = self._full_forward(self.params, batch, bpoints)
            prob = jax.nn.sigmoid(logits)
        # flip-average back to a single map
        prob = 0.5 * (prob[:1] + prob[1:, :, ::-1])

        if self.zoom_in is not None:
            prob = self.zoom_in.inv_transform(prob)
        if self._limit_scale != 1.0:
            prob = up_ac(prob, self._orig_hw)
        return prob[0, ..., 0]

    def set_oracle_gt(self, gt_mask) -> None:
        """gt_mask: (H, W) or (1, H, W, 1) at the ORIGINAL image
        resolution, or None to return to click-constraint BRS."""
        if gt_mask is None:
            self.oracle_gt = None
            return
        gt = jnp.asarray(gt_mask, jnp.float32)
        if gt.ndim == 2:
            gt = gt[None, ..., None]
        self.oracle_gt = gt

    def _oracle_gt_for_crop(self, hw) -> jax.Array:
        """GT mask in the frame of the current network input: follow
        LimitLongestSide scaling and the ZoomIn ROI crop (reference
        brs_losses.py:44-48 crops to predictor.object_roi and resizes
        align_corners)."""
        gt = self.oracle_gt
        if self._limit_scale != 1.0:
            gt = up_ac(gt, self.original_image.shape[1:3])
        roi = self.zoom_in._object_roi if self.zoom_in is not None else None
        if roi is not None:
            r1, r2, c1, c2 = roi[:4]
            gt = gt[:, r1:r2 + 1, c1:c2 + 1]
        if gt.shape[1:3] != tuple(hw):
            gt = up_ac(gt, tuple(hw))
        return gt

    def get_states(self):
        return {
            "transform_states": (self.zoom_in.get_state()
                                 if self.zoom_in else None),
            "opt_data": self.opt_data,
            "input_data": self.input_data,
            "input_key": self._input_key,
        }

    def set_states(self, states):
        if self.zoom_in is not None and states["transform_states"] is not None:
            self.zoom_in.set_state(states["transform_states"])
        self.opt_data = states["opt_data"]
        self.input_data = states["input_data"]
        self._input_key = states["input_key"]


# ---------------------------------------------------------------------------
# Input-space BRS (RGB-BRS / DistMap-BRS)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _input_brs_fns(net, target: str, reg_weight: float = 1e-4,
                   prob_thresh: float = 0.49, maxiter: int = 20):
    """Optimize an additive input bias through the FULL network
    (reference InputBRSPredictor, brs.py:228-280). target: 'rgb' or
    'dist'. The whole L-BFGS runs on device like the feature variant."""

    @jax.jit
    def optimize(p, image, points, pos_map, neg_map, x0):
        shape = x0.shape

        def predict(xflat):
            x = xflat.reshape(shape)
            if target == "rgb":
                rgb_bias = x
                coord_bias = jnp.zeros(image.shape[:-1] + (2,))
            else:
                rgb_bias = jnp.zeros_like(image)
                coord_bias = x
            return net.apply(p, image, points, rgb_bias, coord_bias,
                             method="forward_with_input_bias")

        def loss_fn(xflat):
            r = jax.nn.sigmoid(predict(xflat))
            r = 0.5 * (r[:1] + r[1:, :, ::-1])
            pos_diff = (1.0 - r) * pos_map
            neg_diff = r * neg_map
            loss = jnp.sum(pos_diff ** 2) / (jnp.sum(pos_map) + 1e-5) + \
                jnp.sum(neg_diff ** 2) / (jnp.sum(neg_map) + 1e-5)
            reg = reg_weight * jnp.sum(xflat ** 2)
            return loss + reg, (jnp.max(jnp.abs(pos_diff)),
                                jnp.max(jnp.abs(neg_diff)),
                                (r > prob_thresh)[0, ..., 0])

        def stop_fn(aux, last_mask):
            fp_, fn_, mask = aux
            ok = jnp.logical_and(fp_ < (1 - prob_thresh),
                                 fn_ < prob_thresh)
            return ok, mask

        last0 = jnp.zeros(image.shape[1:3], bool)
        best_x, _ = lbfgs_minimize(loss_fn, x0.reshape(-1),
                                   maxiter=maxiter, memory_size=10,
                                   stop_fn=stop_fn, stop_state0=last0)
        return best_x.reshape(shape), predict(best_x)

    return optimize


class InputBRSPredictor(FeatureBRSPredictor):
    """RGB-BRS / DistMap-BRS: the optimization variable is an additive
    input bias instead of feature scale/bias. Inherits click handling,
    ZoomIn, flip averaging, and LimitLongestSide from the feature
    predictor; only the optimize step differs."""

    def __init__(self, net, params, target: str = "rgb", **kw):
        assert target in ("rgb", "dist")
        super().__init__(net, params, **kw)
        self.target = target
        self._input_optimize = _input_brs_fns(net, target,
                                              maxiter=kw.get("maxiter", 20))

    def get_prediction(self, clicker) -> jax.Array:
        clicks = clicker.get_clicks()
        if self._limit_scale != 1.0:
            s = self._limit_scale
            clicks = [Click(c.is_positive,
                            (c.coords[0] * s, c.coords[1] * s))
                      for c in clicks]
        image = self.original_image
        tclicks = clicks
        if self.zoom_in is not None:
            image, tclicks = self.zoom_in.transform(image, clicks)
        h, w = image.shape[1:3]
        points = self._points_nd(tclicks)
        fpoints = points.at[..., 1].set(
            jnp.where(points[..., 1] >= 0, w - 1 - points[..., 1], -1.0))
        batch = jnp.concatenate([image, image[:, :, ::-1]], axis=0)
        bpoints = jnp.concatenate([points, fpoints], axis=0)

        ch = 3 if self.target == "rgb" else 2
        if self.opt_data is None or self.opt_data.shape != \
                (2, h, w, ch):
            self.opt_data = jnp.zeros((2, h, w, ch), jnp.float32)

        pos_map, neg_map = self._clicks_maps(tclicks, (h, w))
        if len(tclicks) > self.optimize_after_n_clicks:
            self.opt_data, logits = self._input_optimize(
                self.params, batch, bpoints, pos_map, neg_map,
                self.opt_data)
        else:
            logits = self.net.apply(
                self.params, batch, bpoints,
                jnp.zeros_like(batch) if self.target == "rgb"
                else jnp.zeros_like(batch),
                jnp.zeros(batch.shape[:-1] + (2,)),
                method="forward_with_input_bias")
        prob = jax.nn.sigmoid(logits)
        prob = 0.5 * (prob[:1] + prob[1:, :, ::-1])
        if self.zoom_in is not None:
            prob = self.zoom_in.inv_transform(prob)
        if self._limit_scale != 1.0:
            prob = up_ac(prob, self._orig_hw)
        return prob[0, ..., 0]


def get_predictor(net, params, brs_mode: str = "f-BRS-B",
                  zoom_in_params: Optional[dict] = None,
                  predictor_params: Optional[dict] = None):
    """Predictor dispatch by BRS mode (reference
    fbrs/inference/predictors/__init__.py:8-95).

    NoBRS        -> no online optimization
    f-BRS-A      -> feature scale/bias after c4 (DeepLab) / HRNet 'A'
    f-BRS-B      -> after ASPP (DeepLab) / HRNet 'A'
    f-BRS-C      -> after the DeepLab head / HRNet 'C' (after OCR)
    RGB-BRS      -> additive bias on the RGB input
    DistMap-BRS  -> additive bias on the click distance maps
    """
    from mivos_tpu.models.hrnet import FBRSHRNetModel

    zoom_in = None
    if zoom_in_params is not None:
        zoom_in = ZoomIn(**zoom_in_params)
    kw = dict(predictor_params or {})
    kw["zoom_in"] = zoom_in
    if brs_mode == "NoBRS":
        return FeatureBRSPredictor(net, params,
                                   optimize_after_n_clicks=10 ** 9, **kw)
    if brs_mode.startswith("f-BRS"):
        insertion = {"f-BRS-A": "after_c4", "f-BRS-B": "after_aspp",
                     "f-BRS-C": "after_deeplab"}[brs_mode]
        if isinstance(net, FBRSHRNetModel):
            # HRNet maps A and B to the pre-OCR insertion, C to post-OCR
            # (reference predictors/__init__.py:61-63).
            insertion = {"after_c4": "A", "after_aspp": "A",
                         "after_deeplab": "C"}[insertion]
        return FeatureBRSPredictor(net, params, insertion_mode=insertion,
                                   **kw)
    if brs_mode == "RGB-BRS":
        kw.setdefault("net_clicks_limit", 5)
        return InputBRSPredictor(net, params, target="rgb", **kw)
    if brs_mode == "DistMap-BRS":
        kw.setdefault("net_clicks_limit", 5)
        return InputBRSPredictor(net, params, target="dist", **kw)
    raise ValueError(f"unknown BRS mode {brs_mode}")
