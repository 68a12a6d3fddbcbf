"""Tensor parallelism for the pair stacks: row-sharded [S, S, C] tensors.

The reference's only distributed strategy is DDP (SURVEY §2.5); this is a
capability the reference does NOT have, built the TPU way: the quadratic
pair tensors (token pair z, atom pair ap, and the cached per-block
attention biases) carry a `with_sharding_constraint` that shards their
QUERY-row axis over a `tp` mesh axis, and XLA GSPMD propagates the
sharding through the trunk and inserts the collectives (all-gathers for
the k/j-indexed operands of triangle updates / column attention,
reduce-scatters where profitable) over ICI.

Why row sharding: every pair op is either row-local (row attention: each
query row i attends within its own row), a matmul over the shared axis
(triangle update z[i,j] = sum_k a[i,k] b[j,k] — a stays sharded, b
all-gathers), or a transpose (column ops — GSPMD re-shards once per
block).  Memory for z scales 1/tp, which is what unlocks crop-free 768+
token trunks and >2048-atom pair grids that would not fit one chip.

Mechanism: an ambient-mesh global set by `use_tp(mesh)`. Constraints are
applied only while a tp>1 mesh is active, so the default path (tp=1 or no
mesh) traces to the identical single-device HLO — the golden parity gates
are unaffected.  Pallas attention kernels have no GSPMD partitioning
rule, so the SDPA dispatcher forces the XLA path while tp is active
(ops/attention.py); XLA's fused attention partitions cleanly over the
row-sharded bias.

Numerical equivalence (tp=4 trunk == single-device trunk) is asserted in
tests/test_tensor_parallel.py on an 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

_state = threading.local()


def current_tp_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


def tp_active() -> bool:
    return current_tp_mesh() is not None


@contextmanager
def use_tp(mesh: Optional[Mesh]):
    """Activate pair-tensor sharding over `mesh`'s `tp` axis.

    Must be active during TRACING (the first call of each jitted
    function); the constraints are baked into the jaxpr.  A mesh without
    a `tp` axis or with tp=1 deactivates (identity).
    """
    ok = (
        mesh is not None
        and "tp" in mesh.axis_names
        and mesh.shape["tp"] > 1
    )
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh if ok else None
    try:
        if ok:
            # ambient mesh: constraints are spec-only, so the same traced
            # code works under plain jit AND inside shard_map regions where
            # dp is manual and tp is auto (a concrete NamedSharding would
            # be rejected there)
            with jax.sharding.set_mesh(mesh):
                yield
        else:
            yield
    finally:
        _state.mesh = prev


def enable_tp(mesh: Optional[Mesh]) -> bool:
    """Process-lifetime (non-context) enablement, for CLI entry points:
    sets the thread-local tp mesh AND the global ambient mesh so every
    later trace (lazily-jitted pipeline functions) picks up the
    constraints.  Returns whether tp is actually active."""
    ok = (
        mesh is not None
        and "tp" in mesh.axis_names
        and mesh.shape["tp"] > 1
    )
    _state.mesh = mesh if ok else None
    if ok:
        jax.sharding.set_mesh(mesh)
    return ok


def shard_rows(x, row_axis: int = -3):
    """Constrain a pair-shaped tensor's query-row axis over `tp`.

    x: [..., S_q, S_k, C] by default (row_axis=-3); any leading batch/
    stack axes stay replicated.  Identity when no tp mesh is active, so
    call sites stay unconditional.
    """
    mesh = current_tp_mesh()
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[row_axis % x.ndim] = "tp"
    return jax.lax.with_sharding_constraint(x, P(*spec))


def replicate(x):
    """Pin a tensor replicated (useful at sharded-region boundaries)."""
    mesh = current_tp_mesh()
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, P(*([None] * x.ndim)))
