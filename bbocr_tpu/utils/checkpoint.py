"""Flat .npz checkpointing for parameter pytrees.

Orbax is available for sharded multi-host checkpoints (used by the trainer);
this lightweight codec covers single-file model shipping — the analog of the
reference's filesystem-as-state persistence (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_params(path: str, params: Any) -> None:
    """Atomic write (tmp + rename): concurrent readers never see a
    truncated archive."""
    import os

    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **_flatten(params))
    os.replace(tmp, path)


def load_params(path: str) -> Any:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})
