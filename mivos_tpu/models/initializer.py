"""Weight initializers (reference: fbrs/model/initializer.py).

flax init functions: `bilinear` reproduces the transposed-conv
upsampling kernel (initializer.py:47-76) and `xavier_gluon` the
magnitude-scaled gluon Xavier (initializer.py:79-105). Used when
training interactive-seg models from scratch; converted checkpoints
bypass them.

`apply_initializer` is the tree-level equivalent of the reference's
`model.apply(Initializer)` (initializer.py:11-44): rather than thread
kernel_init through every submodule, it rewrites a constructed params
pytree — conv/dense kernels re-drawn from the weight init, biases and
BN betas zeroed, BN gammas set to one, BN running stats untouched.
models/fbrs.py and models/hrnet.py expose it as the `init_flavor`
argument of their `init_params` helpers, so a from-scratch fbrs/hrnet
training run starts from the reference's init distribution.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_kernel(key, shape, dtype=jnp.float32) -> jax.Array:
    """HWIO transposed-conv kernel performing bilinear upsampling.
    Requires kh == kw and in == out channels (per-channel upsampling)."""
    kh, kw, cin, cout = shape
    assert kh == kw, shape
    f = math.ceil(kh / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    og = np.ogrid[:kh, :kw]
    filt = ((1 - abs(og[0] / f - c)) * (1 - abs(og[1] / f - c))) \
        .astype(np.float32)
    w = np.zeros(shape, np.float32)
    for i in range(min(cin, cout)):
        w[:, :, i, i] = filt
    return jnp.asarray(w, dtype)


def xavier_gluon(rnd_type: str = "uniform", factor_type: str = "avg",
                 magnitude: float = 3.0):
    """Gluon-style Xavier: factor from fan_in/fan_out ('avg'/'in'/'out'),
    scale sqrt(magnitude / factor)."""

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:       # HWIO conv kernel
            rf = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * rf, shape[3] * rf
        elif len(shape) == 2:     # dense
            fan_in, fan_out = shape[0], shape[1]
        else:
            fan_in = fan_out = int(np.prod(shape))
        factor = {"avg": (fan_in + fan_out) / 2.0,
                  "in": float(fan_in),
                  "out": float(fan_out)}[factor_type]
        scale = math.sqrt(magnitude / max(factor, 1.0))
        if rnd_type == "uniform":
            return jax.random.uniform(key, shape, dtype, -scale, scale)
        return jax.random.normal(key, shape, dtype) * scale

    return init


def apply_initializer(params, key, weight_init=None):
    """Re-initialize a constructed model's params the way the
    reference's `module.apply(Initializer)` traversal does
    (fbrs/model/initializer.py:11-44, XavierGluon :79-105):

      * every `kernel` leaf (conv HWIO / dense) re-drawn from
        `weight_init` (default: gluon Xavier, uniform/avg/3.0 — the
        reference class defaults)
      * every `bias` leaf zeroed (conv bias and BN beta alike, :33-44)
      * every `scale` leaf (FrozenBatchNorm gamma) set to one (:39)
      * `mean`/`var` (BN running stats) left untouched, as torch's
        Initializer only visits weight/bias

    Keys are folded per-kernel in traversal order, so the same (params,
    key) always yields the same draw. Returns a new pytree."""
    weight_init = weight_init or xavier_gluon()
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    out, n_kernel = [], 0
    for path, leaf in paths_leaves:
        name = path[-1].key if hasattr(path[-1], "key") else None
        if name == "kernel":
            out.append(weight_init(jax.random.fold_in(key, n_kernel),
                                   leaf.shape, leaf.dtype))
            n_kernel += 1
        elif name == "bias":
            out.append(jnp.zeros_like(leaf))
        elif name == "scale":
            out.append(jnp.ones_like(leaf))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def init_model_params(model, key, *inputs, init_flavor: str = "default"):
    """Construct params for a from-scratch interactive-seg model.
    Shared by models/fbrs.py and models/hrnet.py `init_params`.

    `init_flavor`:

      * 'default' — flax defaults (what converted .pth checkpoints
        overwrite anyway)
      * 'gluon'   — the reference's from-scratch init distribution:
        XavierGluon(uniform, avg, 3.0) kernels, zero biases/BN betas,
        unit BN gammas (fbrs/model/initializer.py:11-44,79-105; the
        saic-vul training recipe the vendored code descends from)
    """
    params = model.init(key, *inputs)
    if init_flavor == "default":
        return params
    assert init_flavor == "gluon", init_flavor
    return apply_initializer(params, jax.random.fold_in(key, 0x9107))


def calibrate_frozen_bn(net, params, inputs, iters: int = 3):
    """LSUV-style statistics calibration for from-scratch training
    through FrozenBatchNorm towers.

    The reference pretrains its click/segmentation models with LIVE
    BatchNorm (fbrs/model/modeling/resnetv1b.py `norm_layer`); this
    framework's model defs keep FrozenBatchNorm because every shipped
    checkpoint freezes BN at inference. A fresh init leaves the frozen
    running stats at (0, 1), so deep residual towers stack variance
    unnormalized — stage-4 activations reach ~1e4 and the first
    optimizer step saturates the head (measured in train/pretrain.py's
    FBRSPretrainer docstring). This measures each FrozenBatchNorm's
    actual input distribution on a representative batch (via the
    `bn_stats` sow in models/layers.py) and writes it into the frozen
    (mean, var) params — reproducing live BN's init-time behavior while
    keeping frozen inference semantics. Iterated because upstream
    calibration shifts downstream statistics; `iters=3` converges for
    resnet-depth towers.

    `inputs`: the positional args `net.apply(params, *inputs)` takes.
    Returns a new params pytree.

    An UNcalibrated deep tower can overflow fp32 (activations ~1e19,
    variances inf) beyond its first few stages, so early iterations can
    only measure true statistics up to the overflow depth; measured
    stats are sanitized (non-finite -> huge-but-finite var, var clamped
    away from 0 so a constant-input BN cannot re-amplify by 1/sqrt(eps))
    and each iteration pushes the calibrated frontier deeper. Depth-35
    towers (resnet34+deeplab) need iters ~= 10.
    """
    for _ in range(iters):
        _, aux = net.apply(params, *inputs, mutable=["bn_stats"])
        params = {"params": _write_bn_stats(
            dict(params["params"]), aux["bn_stats"])}
    return params


def _write_bn_stats(psub, ssub):
    out = {}
    for k, v in psub.items():
        if k in ssub and isinstance(v, dict):
            if "input" in ssub[k] and "mean" in v and "var" in v:
                x = ssub[k]["input"][-1]  # sow may record >1 entry
                x32 = jnp.asarray(x, jnp.float32)
                axes = tuple(range(x.ndim - 1))
                new = dict(v)
                new["mean"] = jnp.nan_to_num(x32.mean(axes),
                                             posinf=0.0, neginf=0.0)
                new["var"] = jnp.clip(
                    jnp.nan_to_num(x32.var(axes), nan=1.0, posinf=1e30),
                    1e-4, 1e30)
                out[k] = new
            else:
                out[k] = _write_bn_stats(dict(v), ssub[k])
        else:
            out[k] = v
    return out
