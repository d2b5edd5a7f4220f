"""Training stack: fusion trainer (Mesh data-parallel), bootstrapped
CE losses, f-BRS losses/metrics (reference: model/fusion_model.py,
model/losses.py, fbrs/model/{losses,metrics}.py)."""
from mivos_tpu.train.losses import bootstrapped_ce, compute_fusion_losses
from mivos_tpu.train.trainer import FusionTrainer, make_optimizer

__all__ = ["FusionTrainer", "bootstrapped_ce", "compute_fusion_losses",
           "make_optimizer"]
