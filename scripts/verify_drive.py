"""End-to-end smoke drive on the REAL TPU through the public package
API — the canonical /verify recipe (see .claude/skills/verify/SKILL.md).

Covers: InferenceCore two-round 240p propagation session (bucketed bank
growth, scan path, label download) with invariants + IoU floor, then an
f-BRS click->mask through the full predictor stack (Clicker -> ZoomIn ->
cached head input -> on-device L-BFGS -> flip averaging). ~6-8 min
including cold compiles. Needs weights/prop_synthetic.npz and
weights/fbrs_synthetic.npz (regenerate via scripts/pretrain_synthetic.py
and scripts/noc_synthetic.py if absent).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/verify_drive.py
"""
import time
import numpy as np
import jax

t00 = time.time()
from mivos_tpu.checkpoint.npz import load_params_npz
from mivos_tpu.config import MemoryConfig
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.generation.synthetic import synthetic_sequence
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.utils.tensor import labels_to_probs

print("devices:", jax.devices(), flush=True)
T, H, W, K = 16, 240, 432, 2
images, labels = synthetic_sequence(424242, T, H, W, K)
net = PropagationNetwork(top_k=50, dtype="bfloat16")
params = load_params_npz("weights/prop_synthetic.npz")
core = InferenceCore(net, params, None, None, np.asarray(images), K,
                     mem=MemoryConfig(top_k=50, mem_freq=5))
m0 = np.asarray(labels_to_probs(labels[0], K))
t0 = time.time()
out1 = np.asarray(core.interact(m0, idx=0))
w1 = time.time() - t0
# invariants
assert out1.shape == (T, H, W) and out1.dtype in (np.int32, np.uint8, np.int64)
assert out1.min() >= 0 and out1.max() <= K
assert (out1[0] == np.asarray(labels[0])).mean() > 0.999  # interacted frame kept
probs = core.prob_buffer() if hasattr(core, "prob_buffer") else None
# round 2 from the other end (bucketed growth, no retrace storm)
mT = np.asarray(labels_to_probs(labels[T - 1], K))
t0 = time.time()
out2 = np.asarray(core.interact(mT, idx=T - 1))
w2 = time.time() - t0
assert out2.shape == (T, H, W) and out2.min() >= 0 and out2.max() <= K
gt = np.asarray(labels)
iou = []
for t in range(T):
    p, g = out2[t] == 1, gt[t] == 1
    u = (p | g).sum()
    iou.append((p & g).sum() / u if u else 1.0)
print(f"round1 {w1:.1f}s (cold compiles), round2 {w2:.1f}s; "
      f"mean IoU obj1 after 2 rounds: {np.mean(iou):.3f}", flush=True)
assert np.mean(iou) > 0.2, np.mean(iou)

# f-BRS click -> mask through the public predictor stack (exercises
# FrozenBatchNorm in fbrs towers + ZoomIn + on-device L-BFGS)
from mivos_tpu.checkpoint.npz import load_params_npz as _lp
from mivos_tpu.interactive.clicker import Click, Clicker
from mivos_tpu.interactive.fbrs_predictor import get_predictor
from mivos_tpu.models.fbrs import FBRSDeepLabModel
from mivos_tpu.data.transforms import im_normalize

fnet = FBRSDeepLabModel(arch="resnet50", ch=128)
fparams = _lp("weights/fbrs_synthetic.npz")
imgs2, labels2 = synthetic_sequence(777999, 1, 192, 192, 1,
                                    min_radius=0.12, max_radius=0.3)
gt2 = (np.asarray(labels2[0]) == 1)
pred = get_predictor(fnet, fparams, "f-BRS-B",
                     zoom_in_params={"target_size": 192,
                                     "expansion_ratio": 1.4},
                     predictor_params={"net_clicks_limit": 8,
                                       "maxiter": 20})
pred.set_input_image(im_normalize(np.asarray(imgs2[0])))
clicker = Clicker(gt_mask=gt2)
clicker.make_next_click(np.zeros_like(gt2))
t0 = time.time()
prob = np.asarray(pred.get_prediction(clicker))
wc = time.time() - t0
assert prob.shape == gt2.shape and np.isfinite(prob).all()
assert prob.min() >= 0 and prob.max() <= 1
ciou = ((prob > 0.5) & gt2).sum() / ((prob > 0.5) | gt2).sum()
print(f"fbrs click->mask {wc:.1f}s (cold), IoU@1click {ciou:.3f}", flush=True)
assert ciou > 0.8, ciou
print(f"VERIFY-OK total {time.time() - t00:.0f}s", flush=True)
