"""Device mesh and sharding helpers.

The reference's only distributed strategy is DDP over NCCL
(tasks/unicore_train/train.sh:69-81).  TPU-native equivalent: a 1-D `dp`
jax.sharding.Mesh; the system/sample batch axis shards over `dp`
(gradients psum over ICI).  Multi-host: the same code runs under
jax.distributed.initialize (train/train.py --coordinator) with a global
mesh spanning slices — DP gradients then allreduce over ICI within a
slice and DCN across slices, inserted by XLA from the same shard_map.

There is deliberately no model-parallel axis: the reference has no
TP/PP/SP to reproduce (SURVEY §2.5), crop-free trunks fit a single chip
at bf16 (validated on-chip, NOTES_ROUND2 item 5), and a config axis
nothing shards over would be a false capability surface.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp == -1:
        dp = len(devices)
    assert dp <= len(devices), (dp, len(devices))
    arr = np.array(devices[:dp])
    return Mesh(arr, ("dp",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over dp."""
    return NamedSharding(mesh, P("dp"))
