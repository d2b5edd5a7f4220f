"""PyTorch .pth -> flax params converter.

Loading the published MiVOS checkpoints (propagation_model.pth,
fusion.pth, s2m.pth — reference download_model.py) is required for
accuracy parity without retraining. This module maps the reference's
torch state-dict names onto this framework's flax trees:

  torch                             flax (this repo)
  -----                             ----------------
  layerN.M.convK.weight             layerN/blockM/convK/kernel (OIHW->HWIO)
  layerN.M.bnK.{weight,bias,        layerN/blockM/bnK/{scale,bias,
    running_mean,running_var}         mean,var}
  layerN.M.downsample.{0,1}         layerN/blockM/downsample_{conv,bn}
  rgb_encoder.res2.*                rgb_encoder/layer1/*   (the reference
                                    names torchvision layer1 "res2",
                                    modules.py:76)

No torch import at module scope: the converter accepts any mapping of
name -> numpy array (use `load_torch_state_dict` to read a .pth).
"""
from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "network" in sd and isinstance(sd["network"], dict):
        sd = sd["network"]  # full training checkpoints nest the weights
    return {k: v.numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


_BN_MAP = {"weight": "scale", "bias": "bias",
           "running_mean": "mean", "running_var": "var"}


def convert_flat(sd: Mapping[str, np.ndarray],
                 renames: Tuple[Tuple[str, str], ...] = (),
                 bn_markers: Tuple[str, ...] = ("bn", "downsample_bn"),
                 ) -> Dict:
    """Generic converter: rewrites torch dotted names to flax paths.

    renames: ordered (regex, replacement) pairs applied to each key
    first. After renaming, a key's final component selects the transform:
    `weight` on a 4D tensor -> conv kernel; BN stats by _BN_MAP when the
    parent module name contains a bn marker; 1D weight/bias pass through.
    """
    tree: Dict = {}
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        name = key
        for pat, rep in renames:
            name = re.sub(pat, rep, name)
        parts = name.split(".")
        leaf = parts[-1]
        parent = parts[-2] if len(parts) > 1 else ""
        is_bn = any(m in parent for m in bn_markers)
        if is_bn:
            leaf = _BN_MAP[leaf]
            path = "/".join(parts[:-1] + [leaf])
            _set(tree, path, np.asarray(val, np.float32))
        elif leaf == "weight" and val.ndim == 4:
            path = "/".join(parts[:-1] + ["kernel"])
            _set(tree, path, _conv_kernel(np.asarray(val, np.float32)))
        else:
            path = "/".join(parts)
            _set(tree, path, np.asarray(val, np.float32))
    return tree


# Rules shared by every ResNet tower in the reference family.
_RESNET_RULES = (
    (r"\.layer(\d)\.(\d+)\.", r".layer\1.block\2."),
    (r"\.downsample\.0\.", r".downsample_conv."),
    (r"\.downsample\.1\.", r".downsample_bn."),
)


def convert_prop_net(sd: Mapping[str, np.ndarray]) -> Dict:
    """MiVOS propagation_model.pth -> PropagationNetwork params
    (reference model/propagation/prop_net.py). The target net must use
    the reference decoder (dec_width=1.0); slimmer variants are
    from-scratch-training architectures with a different param tree."""
    rules = (
        (r"^rgb_encoder\.res2\.", "rgb_encoder.layer1."),
    ) + _RESNET_RULES
    tree = convert_flat(sd, rules)
    return {"params": tree}


def convert_attention_read(sd: Mapping[str, np.ndarray]) -> Dict:
    """The training-time AttentionReadNetwork loads the propagation
    checkpoint with strict=False (reference fusion_model.py:185-188);
    only the shared encoder/KV towers carry over."""
    keep = ("mask_rgb_encoder.", "rgb_encoder.", "kv_m_f16.", "kv_q_f16.")
    sub = {k: v for k, v in sd.items() if k.startswith(keep)}
    return convert_prop_net(sub)


def attention_read_from_prop(prop_params: Dict) -> Dict:
    """AttentionReadNetwork params straight from a FLAX propagation tree
    (e.g. the synthetic-pretrain .npz): the reader is structurally the
    propagation encoders + f16 KV heads under the SAME module names
    (models/fusion.py::AttentionReadNetwork.setup), so the frozen
    attention tower shares the trained weights exactly like the
    reference loads propagation.pth with strict=False
    (fusion_model.py:185-188)."""
    keep = ("mask_rgb_encoder", "rgb_encoder", "kv_m_f16", "kv_q_f16")
    src = prop_params["params"]
    missing = [k for k in keep if k not in src]
    if missing:
        raise KeyError(f"propagation tree lacks {missing}")
    return {"params": {k: src[k] for k in keep}}


def convert_fusion_net(sd: Mapping[str, np.ndarray]) -> Dict:
    """fusion.pth -> FusionNet params (reference model/fusion_net.py:12-30:
    sequentials conv1/conv2/conv3 hold convs at indices 0 and 2)."""
    rules = (
        (r"^conv1\.0\.", "conv1."),
        (r"^conv2\.0\.", "conv2_0."),
        (r"^conv2\.2\.", "conv2_1."),
        (r"^conv3\.0\.", "conv3_0."),
        (r"^conv3\.2\.", "conv3_1."),
    )
    return {"params": convert_flat(sd, rules)}


def convert_s2m(sd: Mapping[str, np.ndarray]) -> Dict:
    """s2m.pth -> S2MNetwork params (reference model/s2m/_deeplab.py).

    ASPP sequential indices: convs.0 = 1x1 branch, convs.1-3 = dilated,
    convs.4 = pooling branch (conv at .1, bn at .2); project at indices
    0/1; classifier convs at 0 (3x3+bn at 1) and 3 (final 1x1).
    """
    rules = _RESNET_RULES + (
        (r"^classifier\.project\.0\.", "classifier.project.conv."),
        (r"^classifier\.project\.1\.", "classifier.project.bn."),
        (r"^classifier\.aspp\.convs\.0\.0\.", "classifier.aspp.b0.conv."),
        (r"^classifier\.aspp\.convs\.0\.1\.", "classifier.aspp.b0.bn."),
        (r"^classifier\.aspp\.convs\.([123])\.0\.",
         r"classifier.aspp.b\1.conv."),
        (r"^classifier\.aspp\.convs\.([123])\.1\.",
         r"classifier.aspp.b\1.bn."),
        (r"^classifier\.aspp\.convs\.4\.1\.", "classifier.aspp.pool_conv.conv."),
        (r"^classifier\.aspp\.convs\.4\.2\.", "classifier.aspp.pool_conv.bn."),
        (r"^classifier\.aspp\.project\.0\.", "classifier.aspp.project.conv."),
        (r"^classifier\.aspp\.project\.1\.", "classifier.aspp.project.bn."),
        (r"^classifier\.classifier\.0\.", "classifier.classifier0.conv."),
        (r"^classifier\.classifier\.1\.", "classifier.classifier0.bn."),
        (r"^classifier\.classifier\.3\.", "classifier.classifier1."),
    )
    # BN markers: 'bn' substring covers bn1..bn3 and the renamed heads.
    return {"params": convert_flat(sd, rules)}


def convert_fbrs(sd: Mapping[str, np.ndarray]) -> Dict:
    """fbrs resnet50 .pth -> FBRSDeepLabModel params.

    Sequential index map (reference fbrs/model/is_deeplab_model.py:36-41,
    modeling/deeplab_v3.py, modeling/resnetv1b.py:120-133,
    modeling/basic_blocks.py:57-71): rgb_conv indices 0/2/3; deep stem
    conv1 indices 0/1/3/4/6 + bn1; skip_project 0/1; ASPP concurent
    0..4 (+pool gap 1/2) and project 0/1; _DeepLabHead block 0/1
    (separable: body 0 dw, 1 pw, 2 bn) and 2; SepConvHead layers 0/1/2.
    """
    rules = _RESNET_RULES + (
        (r"^rgb_conv\.0\.", "rgb_conv_0."),
        (r"^rgb_conv\.2\.", "rgb_conv_bn."),
        (r"^rgb_conv\.3\.", "rgb_conv_1."),
        (r"^feature_extractor\.backbone\.conv1\.0\.", "backbone.stem0."),
        (r"^feature_extractor\.backbone\.conv1\.1\.", "backbone.stem_bn0."),
        (r"^feature_extractor\.backbone\.conv1\.3\.", "backbone.stem1."),
        (r"^feature_extractor\.backbone\.conv1\.4\.", "backbone.stem_bn1."),
        (r"^feature_extractor\.backbone\.conv1\.6\.", "backbone.stem2."),
        (r"^feature_extractor\.backbone\.", "backbone."),
        (r"^feature_extractor\.skip_project\.skip_project\.0\.",
         "skip_project_conv."),
        (r"^feature_extractor\.skip_project\.skip_project\.1\.",
         "skip_project_bn."),
        (r"^feature_extractor\.aspp\.concurent\.0\.0\.", "aspp.b0_conv."),
        (r"^feature_extractor\.aspp\.concurent\.0\.1\.", "aspp.b0_bn."),
        (r"^feature_extractor\.aspp\.concurent\.([123])\.0\.",
         r"aspp.b\1_conv."),
        (r"^feature_extractor\.aspp\.concurent\.([123])\.1\.",
         r"aspp.b\1_bn."),
        (r"^feature_extractor\.aspp\.concurent\.4\.gap\.1\.",
         "aspp.pool_conv."),
        (r"^feature_extractor\.aspp\.concurent\.4\.gap\.2\.",
         "aspp.pool_bn."),
        (r"^feature_extractor\.aspp\.project\.0\.", "aspp.project_conv."),
        (r"^feature_extractor\.aspp\.project\.1\.", "aspp.project_bn."),
        (r"^feature_extractor\.head\.block\.([01])\.body\.0\.",
         r"head_sep\1.dw."),
        (r"^feature_extractor\.head\.block\.([01])\.body\.1\.",
         r"head_sep\1.pw."),
        (r"^feature_extractor\.head\.block\.([01])\.body\.2\.",
         r"head_sep\1.bn."),
        (r"^feature_extractor\.head\.block\.2\.", "head_out."),
        (r"^head\.layers\.([01])\.body\.0\.", r"sep_head\1.dw."),
        (r"^head\.layers\.([01])\.body\.1\.", r"sep_head\1.pw."),
        (r"^head\.layers\.([01])\.body\.2\.", r"sep_head\1.bn."),
        (r"^head\.layers\.2\.", "sep_head_out."),
    )
    return {"params": convert_flat(sd, rules)}


def convert_fbrs_hrnet(sd: Mapping[str, np.ndarray]) -> Dict:
    """fbrs hrnet .pth -> FBRSHRNetModel params (reference
    fbrs/model/modeling/hrnet_ocr.py naming).

    Fuse-layer keys need index-aware handling (j>i is [conv, bn]; j<i is
    a chain of [conv, bn(, relu)] sequentials), so keys are pre-mapped
    before the generic converter runs.
    """
    def premap(k: str) -> str:
        m = re.match(
            r"(.*)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.(\d+)\.(.*)", k)
        if m:  # downsample chain: j < i
            pre, i, j, step, sub, leaf = m.groups()
            kind = "conv" if sub == "0" else "bn"
            return f"{pre}.fuse{i}_{j}_{kind}{step}.{leaf}"
        m = re.match(r"(.*)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.(.*)", k)
        if m:  # 1x1 + bn: j > i
            pre, i, j, sub, leaf = m.groups()
            kind = "conv" if sub == "0" else "bn"
            return f"{pre}.fuse{i}_{j}_{kind}.{leaf}"
        return k

    sd = {premap(k): v for k, v in sd.items()}
    rules = (
        (r"^rgb_conv\.0\.", "rgb_conv_0."),
        (r"^rgb_conv\.2\.", "rgb_conv_bn."),
        (r"^rgb_conv\.3\.", "rgb_conv_1."),
        (r"\.layer1\.(\d+)\.", r".layer1_block\1."),
        (r"\.downsample\.0\.", ".downsample_conv."),
        (r"\.downsample\.1\.", ".downsample_bn."),
        (r"\.transition(\d)\.(\d)\.0\.0\.", r".transition\1_\2_conv."),
        (r"\.transition(\d)\.(\d)\.0\.1\.", r".transition\1_\2_bn."),
        (r"\.transition(\d)\.(\d)\.0\.", r".transition\1_\2_conv."),
        (r"\.transition(\d)\.(\d)\.1\.", r".transition\1_\2_bn."),
        (r"\.stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.",
         r".stage\1_m\2.branch\3_block\4."),
        (r"\.stage(\d)\.(\d+)\.fuse", r".stage\1_m\2.fuse"),
        (r"\.conv3x3_ocr\.0\.", ".conv3x3_ocr_conv."),
        (r"\.conv3x3_ocr\.1\.", ".conv3x3_ocr_bn."),
        (r"\.ocr_distri_head\.object_context_block\.", ".ocr_distri_head."),
        (r"\.f_(pixel|object|down|up)\.0\.", r".f_\1.conv0."),
        (r"\.f_(pixel|object|down|up)\.1\.0\.", r".f_\1.bn0."),
        (r"\.f_(pixel|object|down|up)\.2\.", r".f_\1.conv1."),
        (r"\.f_(pixel|object|down|up)\.3\.0\.", r".f_\1.bn1."),
        (r"\.conv_bn_dropout\.0\.", ".proj_conv."),
        (r"\.conv_bn_dropout\.1\.0\.", ".proj_bn."),
        (r"\.aux_head\.0\.", ".aux_head_conv1."),
        (r"\.aux_head\.1\.", ".aux_head_bn."),
        (r"\.aux_head\.3\.", ".aux_head_conv2."),
    )
    return {"params": convert_flat(sd, rules)}


def detect_fbrs_model(sd: Mapping[str, np.ndarray]) -> Dict:
    """Auto-detect the fbrs architecture from a state dict (reference
    fbrs/inference/utils.py:21-100). Returns constructor kwargs +
    'kind' ('deeplab' | 'hrnet')."""
    keys = sd.keys()
    if any(k.startswith("feature_extractor.backbone") for k in keys):
        # Depth from the backbone parameter count (the reference's
        # thresholds, utils.py:69-80; >531 extended to resnet152, which
        # the reference constructs but cannot auto-detect).
        n_bb = len([k for k in keys
                    if k.startswith("feature_extractor.backbone")
                    and "num_batches_tracked" not in k])
        if n_bb <= 181:
            arch = "resnet34"
        elif n_bb <= 276:
            arch = "resnet50"
        elif n_bb <= 531:
            arch = "resnet101"
        else:
            arch = "resnet152"
        # deeplab_ch from the ASPP projection width (utils.py:85-88).
        ch = int(sd["feature_extractor.aspp.project.0.weight"].shape[0])
        return {"kind": "deeplab", "backbone": arch, "ch": ch}
    if any(".stage2." in k or k.startswith("feature_extractor.stage2")
           for k in keys):
        width = int(sd["feature_extractor.transition1.0.0.weight"].shape[0])
        ocr = int(sd["feature_extractor.conv3x3_ocr.0.weight"].shape[0]) // 2
        layer1_blocks = 1 + max(
            int(re.match(r"feature_extractor\.layer1\.(\d+)\.", k).group(1))
            for k in keys
            if re.match(r"feature_extractor\.layer1\.(\d+)\.", k))
        return {"kind": "hrnet", "width": width, "ocr_width": ocr,
                "small": layer1_blocks == 2}
    raise ValueError("unrecognized fbrs checkpoint")


def assert_tree_matches(converted: Dict, target: Dict, path: str = "") -> None:
    """Structural check: every target leaf exists with the right shape."""
    for k, v in target.items():
        p = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            assert k in converted, f"missing subtree {p}"
            assert_tree_matches(converted[k], v, p)
        else:
            assert k in converted, f"missing leaf {p}"
            assert tuple(converted[k].shape) == tuple(v.shape), (
                f"shape mismatch at {p}: {converted[k].shape} vs {v.shape}")
