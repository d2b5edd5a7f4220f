"""Evaluation harnesses: DAVIS interactive protocol + f-BRS NoC
(reference: eval_interactive_davis.py, fbrs/inference/evaluation.py)."""
from mivos_tpu.eval.noc import (compute_noc_metric, evaluate_dataset,
                                evaluate_sample, get_iou)

__all__ = ["compute_noc_metric", "evaluate_dataset", "evaluate_sample",
           "get_iou"]
