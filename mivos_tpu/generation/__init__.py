"""Synthetic-data generation (reference: generation/).

bl30k: BlenderProc scene-config generator for the BL30K pretraining
dataset. fusion data generation lives in core/fusion_generator.py +
generate_fusion.py.
"""
from mivos_tpu.generation.bl30k import SceneConfig, SceneGenerator

__all__ = ["SceneConfig", "SceneGenerator"]
