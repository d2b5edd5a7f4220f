"""Orbax-backed checkpointing: {step, params, opt_state} with retention.

Reference checkpoint semantics (model/fusion_model.py:133-188):
  * save_model  — weights-only snapshot every `save_every` iters
  * save_checkpoint — full {it, network, optimizer, scheduler} resume
    state (the LR schedule is a pure function of `it` here, so `it` is
    the entire scheduler state)
  * load_model / load_network — full-resume vs weights-only restore.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional


def _manager(directory: str, max_to_keep: Optional[int] = None):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


class CheckpointManager:
    """Thin orbax wrapper with the reference's two checkpoint flavors."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = 3):
        self.directory = directory
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, state: Dict[str, Any]) -> None:
        """state: arbitrary pytree, e.g. FusionTrainer.state_dict()."""
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        import orbax.checkpoint as ocp

        if step is None:
            step = self._mgr.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint found in {self.directory}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()


def save_params(path: str, params: Dict) -> None:
    """Weights-only snapshot (reference save_model, fusion_model.py:133)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params)
    ckpt.wait_until_finished()


def load_params(path: str, template: Optional[Dict] = None) -> Dict:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        return ckpt.restore(os.path.abspath(path), target=template)
    return ckpt.restore(os.path.abspath(path))
