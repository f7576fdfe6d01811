"""Device mesh construction.

The reference's only parallelism is host thread pools and a job semaphore
(SURVEY.md §2.8); the TPU-native scaling story is SPMD over an ICI mesh:
``dp`` (data/batch) x ``tp`` (tensor) axes, with XLA inserting collectives
from sharding annotations. DCN-spanning meshes put ``dp`` outermost so
cross-host traffic is the infrequent gradient/batch axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshConfig:
    dp: Optional[int] = None  # None: all remaining devices
    tp: int = 1


def make_mesh(config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = config.tp
    if n % tp != 0:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    dp = config.dp if config.dp is not None else n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(dp=1, tp=1), devices=jax.devices()[:1])
