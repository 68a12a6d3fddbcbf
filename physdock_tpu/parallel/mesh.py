"""Device mesh and sharding helpers.

The reference's only distributed strategy is DDP over NCCL
(tasks/unicore_train/train.sh:69-81).  TPU-native equivalent: a
(dp, mp) jax.sharding.Mesh; the system/sample batch axis shards over `dp`
(gradients psum over ICI), `mp` is reserved for sharding attention heads /
pair channels in no-crop inference.  Multi-host: the same code runs under
jax.distributed.initialize with a global mesh spanning slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = -1, mp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp == -1:
        dp = len(devices) // mp
    assert dp * mp <= len(devices), (dp, mp, len(devices))
    arr = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over dp."""
    return NamedSharding(mesh, P("dp"))
