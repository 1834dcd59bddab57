"""Orbax checkpointing (optional, alongside the npz path).

The npz path (utils/checkpoint.py) keeps the reference's artifact contract
(train_model.py:1023-1041); Orbax adds production-grade atomic writes,
async save, and step-managed retention for long multi-chip runs. Import
is lazy so the framework works without orbax installed.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except ImportError:
        return False


def make_manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(directory, options=options)


def save(manager, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp

    if step in manager.all_steps():
        return  # already saved (e.g. the final re-save after a resume)
    manager.save(step, args=ocp.args.StandardSave(state))
    manager.wait_until_finished()


def restore(manager, state_template: Any, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    step = manager.latest_step() if step is None else step
    if step is None:
        raise ValueError("no checkpoint found")
    return manager.restore(step,
                           args=ocp.args.StandardRestore(state_template))
