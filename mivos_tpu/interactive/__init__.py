"""Interaction-to-mask layer: interactions, controllers, predictors,
clicker, headless GUI session (reference: interact/, fbrs/)."""
from mivos_tpu.interactive.clicker import Click, Clicker
from mivos_tpu.interactive.crops import Crops, TiledPredictor
from mivos_tpu.interactive.fbrs_controller import (FBRSController,
                                                   InteractiveController)
from mivos_tpu.interactive.fbrs_predictor import (FeatureBRSPredictor,
                                                  ZoomIn)
from mivos_tpu.interactive.gui_session import GuiSession
from mivos_tpu.interactive.interaction import (ClickInteraction,
                                               CropperInteraction,
                                               FreeInteraction,
                                               LocalInteraction,
                                               ScribbleInteraction)
from mivos_tpu.interactive.s2m_controller import S2MController

__all__ = [
    "Click", "ClickInteraction", "Clicker", "CropperInteraction",
    "Crops", "FBRSController", "FeatureBRSPredictor", "FreeInteraction",
    "GuiSession", "InteractiveController", "LocalInteraction",
    "S2MController", "ScribbleInteraction", "TiledPredictor", "ZoomIn",
]
