"""Evaluation harnesses: DAVIS interactive protocol, f-BRS NoC, and the
fleet-parallel multi-device driver (reference: eval_interactive_davis.py,
fbrs/inference/evaluation.py; fleet is TPU-native, SURVEY.md section 2.8)."""
from mivos_tpu.eval.davis_metrics import (batched_jf, db_eval_boundary,
                                          db_eval_iou, sequence_jf,
                                          summarize_session)
from mivos_tpu.eval.fleet import fleet_map, propagate_videos
from mivos_tpu.eval.noc import (compute_noc_metric, evaluate_dataset,
                                evaluate_sample, get_iou)
from mivos_tpu.eval.robot import (InteractiveScribblesRobot,
                                  LocalInteractiveSession)

__all__ = ["InteractiveScribblesRobot", "LocalInteractiveSession",
           "batched_jf", "compute_noc_metric", "db_eval_boundary",
           "db_eval_iou", "evaluate_dataset", "evaluate_sample",
           "fleet_map", "get_iou", "propagate_videos", "sequence_jf",
           "summarize_session"]
