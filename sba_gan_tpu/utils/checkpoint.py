"""Orbax checkpointing: train-state save / restore / resume.

The reference checkpoints raw ``state_dict`` files — ``netG_epoch_{E}.pth``
with EMA weights swapped in and ``netD{i}.pth`` without optimizer state
(AttnGAN2/code/trainer.py:159-170), DAMSM ``text_encoder{E}.pth`` /
``image_encoder{E}.pth`` (pretrain_DAMSM.py:286-292), and resume paths that
parse the epoch out of the filename (trainer.py:105-122).

TPU-native upgrade: Orbax saves the FULL train state — params, EMA shadow,
batch-norm stats, optimizer moments, step — so resume is exact (the active
reference pipeline silently drops optimizer state on resume; the legacy
generation kept it, Old_Code/train.py:167-179).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    """Thin wrapper over ocp.CheckpointManager keyed by integer step/epoch."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template`` (an abstract or
        concrete pytree of the same shape)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
