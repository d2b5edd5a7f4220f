"""Data layer: datasets, transforms, and the host->device input
pipeline (reference: dataset/ + interact/interactive_utils.py)."""
from mivos_tpu.data.fusion_dataset import FusionDataset
from mivos_tpu.data.loader import Loader, ShardedSampler, collate
from mivos_tpu.data.transforms import (all_to_onehot, im_denormalize,
                                       im_normalize, resize_min_side)
from mivos_tpu.data.video_datasets import (BLTestDataset, DAVISTestDataset,
                                           YouTubeVOSTestDataset)

__all__ = [
    "FusionDataset", "Loader", "ShardedSampler", "collate",
    "all_to_onehot", "im_denormalize", "im_normalize", "resize_min_side",
    "BLTestDataset", "DAVISTestDataset", "YouTubeVOSTestDataset",
]
