"""Checkpointing: orbax save/restore + one-time PyTorch weight import
(reference: download_model.py checkpoints, model/fusion_model.py:133-188)."""
from mivos_tpu.checkpoint.convert import (attention_read_from_prop,
                                          convert_attention_read,
                                          convert_fbrs, convert_fusion_net,
                                          convert_prop_net, convert_s2m,
                                          load_torch_state_dict)
from mivos_tpu.checkpoint.manager import (CheckpointManager, load_params,
                                          save_params)

__all__ = [
    "CheckpointManager", "attention_read_from_prop",
    "convert_attention_read", "convert_fbrs",
    "convert_fusion_net", "convert_prop_net", "convert_s2m",
    "load_params", "load_torch_state_dict", "save_params",
]
