"""Evaluation harnesses: DAVIS interactive protocol, f-BRS NoC, the
hermetic robot/session + J&F metrics, and the fleet-parallel
multi-device driver (reference: eval_interactive_davis.py,
fbrs/inference/evaluation.py; fleet is TPU-native, SURVEY.md section
2.8).

Submodules import lazily: `import mivos_tpu.eval` for the lightweight
NoC metrics must not initialize the jax backend (fleet pulls in
core.inference) or load cv2 (robot/davis_metrics) — premature backend
init is an explicit failure mode of the platform-selection flows
(__graft_entry__)."""
_EXPORTS = {
    "compute_noc_metric": "noc", "evaluate_dataset": "noc",
    "evaluate_sample": "noc", "get_iou": "noc",
    "batched_jf": "davis_metrics", "db_eval_boundary": "davis_metrics",
    "db_eval_iou": "davis_metrics", "sequence_jf": "davis_metrics",
    "summarize_session": "davis_metrics",
    "fleet_map": "fleet", "propagate_videos": "fleet",
    "InteractiveScribblesRobot": "robot", "LocalInteractiveSession": "robot",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(f"mivos_tpu.eval.{_EXPORTS[name]}")
        return getattr(mod, name)
    raise AttributeError(f"module 'mivos_tpu.eval' has no attribute {name!r}")
