"""Training checkpoint / resume (orbax-backed).

The reference's only checkpoint format is the weights-only GGUF file produced
offline (SURVEY §5: no training, no resume).  The TPU framework trains, so it
needs real resume: full TrainState (params + optimizer moments + step) saved
asynchronously via orbax, plus GGUF export of just the weights for serving
(zerovox_tpu.params.save_params).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train import TrainState


class CheckpointManager:
    """Step-numbered TrainState checkpoints with keep-last-N retention."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, step: Optional[int] = None,
             wait: bool = False):
        step = int(state.step) if step is None else int(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        if wait:
            self._mgr.wait_until_finished()
        return step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure of `target` (an abstract or concrete
        TrainState, e.g. freshly initialised)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target._asdict()))
        return TrainState(**restored)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def export_weights_gguf(path: str, state: TrainState, cfg):
    """Serving export: weights-only GGUF in the reference's format."""
    from ..params import save_params
    save_params(path, jax.tree.map(np.asarray, state.params), cfg)
