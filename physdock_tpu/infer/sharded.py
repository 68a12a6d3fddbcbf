"""Multi-chip inference: diffusion-sample axis sharded over the dp mesh.

The reference's VS throughput axis is embarrassingly parallel (independent
poses/ligands; SURVEY §2.5).  Here the `num_sample` axis of the EDM reverse
pass shards over `dp` via shard_map: conditioning tensors and params are
replicated (broadcast once over ICI), every device runs the identical
sampling scan on its sample shard, zero collectives in steady state.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from physdock_tpu.model.diffusion import sample_diffusion


def sharded_sample_diffusion(
    model,
    params,
    batch,
    key,
    mesh: Mesh,
    num_sample: int,
    guidance=None,
    conditioning=None,
    **kw,
):
    """Run `num_sample` poses sharded over the mesh's dp axis.

    Returns [num_sample, A, 3] with the leading axis dp-sharded.
    """
    dp = mesh.shape["dp"]
    assert num_sample % dp == 0, (num_sample, dp)
    local = num_sample // dp

    def body(params, batch, key, conditioning, guidance):
        # same BASE key on every device; each device draws the global
        # sample indices of its shard, so the result equals the unsharded
        # sample_diffusion(num_sample=dp*local) pose-for-pose
        idx = jax.lax.axis_index("dp")
        return sample_diffusion(
            model,
            params,
            batch,
            key,
            num_sample=local,
            guidance=guidance,
            conditioning=conditioning,
            sample_key_offset=idx * local,
            **kw,
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P("dp"),
        check_vma=False,
        # manual only over dp; a tp axis (parallel/tp.py) stays auto so
        # the per-device sampler body can itself be pair-row sharded
        axis_names={"dp"},
    )
    return fn(params, batch, key, conditioning, guidance)
