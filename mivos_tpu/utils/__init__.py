"""Utilities: tensor helpers, palettes, logging, metrics, timing
(reference: util/ + interact/timer.py)."""
from mivos_tpu.utils.integrator import Integrator
from mivos_tpu.utils.load_subset import load_sub_davis, load_sub_yv, load_subset
from mivos_tpu.utils.logger import TensorboardLogger
from mivos_tpu.utils.palette import (davis_palette, overlay_davis,
                                     pascal_color_map, save_indexed_png)
from mivos_tpu.utils.timer import Timer

__all__ = [
    "Integrator", "TensorboardLogger", "Timer", "davis_palette",
    "load_sub_davis", "load_sub_yv", "load_subset", "overlay_davis",
    "pascal_color_map", "save_indexed_png",
]
