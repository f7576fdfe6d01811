"""Full training-state checkpointing (params + optimizer + step) via orbax.

Complements the flat .npz model shipping codec (``utils/checkpoint.py``)
with resumable trainer state — the framework analog of the reference's
filesystem-as-state persistence (SURVEY.md §5 checkpoint/resume), but with
proper sharded-array support for mesh training.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, state: Any, step: Optional[int] = None) -> str:
    """Save a TrainState pytree; returns the checkpoint path."""
    import jax

    path = os.path.abspath(
        os.path.join(directory, f"step_{int(step)}" if step is not None else "latest")
    )
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
        elif name == "latest":
            steps.append((-1, name))
    if not steps:
        return None
    return os.path.join(directory, max(steps)[1])


def restore_train_state(path: str, example_state: Any) -> Any:
    """Restore into the structure of ``example_state``."""
    ckptr = _checkpointer()
    return ckptr.restore(path, item=example_state)
