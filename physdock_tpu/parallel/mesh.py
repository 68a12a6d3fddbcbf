"""Device mesh and sharding helpers.

The reference's only distributed strategy is DDP over NCCL
(tasks/unicore_train/train.sh:69-81).  TPU-native equivalent: a 1-D `dp`
jax.sharding.Mesh; the system/sample batch axis shards over `dp`
(gradients psum over ICI).  Multi-host: the same code runs under
jax.distributed.initialize (train/train.py --coordinator) with a global
mesh spanning slices — DP gradients then allreduce over ICI within a
slice and DCN across slices, inserted by XLA from the same shard_map.

Beyond DP (the reference's ceiling) there is an optional `tp` axis for
pair-tensor row sharding — a real, tested capability (parallel/tp.py,
tests/test_tensor_parallel.py), not a config flag: the quadratic pair
tensors shard their query-row axis over tp, XLA GSPMD inserts the
collectives, and z/ap/bias memory scales 1/tp (crop-free 768+ token
trunks).  tp=1 (default) builds the identical 1-D dp mesh and traces the
identical single-device HLO.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = -1, devices: Optional[Sequence] = None, tp: int = 1
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp == -1:
        dp = len(devices) // tp
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    if tp == 1:
        return Mesh(np.array(devices[:dp]), ("dp",))
    # tp innermost: pair-row collectives ride the fastest ICI links
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over dp."""
    return NamedSharding(mesh, P("dp"))
