"""Checkpoint / resume via orbax — preemption-safe step checkpoints.

Replaces the reference's per-epoch ``torch.save`` tarballs (which embed a
byte snapshot of the whole source tree, reference:
utils/train_summary.py:130-160,200-223) with orbax step directories plus a
config JSON; auto-resume picks the latest step (the reference requires
hand-editing ``resume_ckpt``, train_FAR.py:142-143).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True))

    def save(self, step: int, state: Any, *, config_json: Optional[str] = None,
             history: Optional[dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if config_json is not None:
            (self.directory / "config.json").write_text(config_json)
        if history is not None:
            (self.directory / "history.json").write_text(
                json.dumps(history, default=float))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return list(self._mgr.all_steps())

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore as plain nested dicts — no structure template required.
        Used for cross-stage handoff where only a subtree is wanted."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def load_history(self) -> dict:
        p = self.directory / "history.json"
        if p.exists():
            return json.loads(p.read_text())
        return {}

    def close(self):
        self._mgr.close()


def load_ae_modules(directory: str, step: Optional[int] = None):
    """Load the frozen stage-1 (enc, dec) module states for stage 2
    (reference: train_FAR.py:210 resumes the AE checkpoint into the stage-2
    script). Rebuilds the stage-1 state template from the saved config.json
    so the restore works across device topologies. ``directory`` is the
    stage-1 ``<ckpt_dir>/ckpt``.

    Returns (enc_state, dec_state) as ModuleState.
    """
    import json

    from vptr_tpu.config import ExperimentConfig

    cfg_path = Path(directory) / "config.json"
    if not cfg_path.exists():
        raise FileNotFoundError(
            f"{cfg_path} missing — stage-1 checkpoints save their config "
            "next to the step dirs; cannot rebuild the restore template")
    cfg = ExperimentConfig().override(json.loads(cfg_path.read_text()))

    from vptr_tpu.train.trainer import Trainer

    template = Trainer(cfg, write_outputs=False).init_state()
    mgr = CheckpointManager(directory)
    try:
        restored = mgr.restore(template, step)
    finally:
        mgr.close()
    return restored.enc, restored.dec
