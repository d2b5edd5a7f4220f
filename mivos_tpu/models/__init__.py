"""Model zoo: propagation, fusion, S2M, f-BRS (DeepLab + HRNet-OCR)."""
from mivos_tpu.models.fbrs import FBRSDeepLabModel
from mivos_tpu.models.fusion import AttentionReadNetwork, FusionNet
from mivos_tpu.models.hrnet import FBRSHRNetModel, HighResolutionNet
from mivos_tpu.models.propagation import PropagationNetwork
from mivos_tpu.models.s2m import S2MNetwork


def build_fbrs_from_state_dict(sd):
    """Auto-detect the f-BRS architecture from a torch state dict and
    return (net, converted_params) — the reference's shape-sniffing
    loader (fbrs/inference/utils.py:21-100)."""
    from mivos_tpu.checkpoint.convert import (convert_fbrs,
                                              convert_fbrs_hrnet,
                                              detect_fbrs_model)

    info = detect_fbrs_model(sd)
    if info["kind"] == "deeplab":
        net = FBRSDeepLabModel(arch=info["backbone"], ch=info["ch"])
        return net, convert_fbrs(sd)
    net = FBRSHRNetModel(width=info["width"], ocr_width=info["ocr_width"],
                         small=info["small"])
    return net, convert_fbrs_hrnet(sd)


__all__ = [
    "AttentionReadNetwork", "FBRSDeepLabModel", "FBRSHRNetModel",
    "FusionNet", "HighResolutionNet", "PropagationNetwork", "S2MNetwork",
    "build_fbrs_from_state_dict",
]
