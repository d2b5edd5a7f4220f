"""Session orchestration: InferenceCore, memory bank, DAVIS-bot
adapter, fusion-data generator (reference: inference_core.py,
davis_processor.py, generation/fusion_generator.py)."""
from mivos_tpu.core.davis_processor import DAVISProcessor
from mivos_tpu.core.fusion_generator import FusionGenerator
from mivos_tpu.core.inference import InferenceCore
from mivos_tpu.core.memory_bank import MemoryBank

__all__ = ["DAVISProcessor", "FusionGenerator", "InferenceCore",
           "MemoryBank"]
