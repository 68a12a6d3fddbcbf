"""Multi-chip inference: diffusion-sample axis sharded over the dp mesh.

The reference's VS throughput axis is embarrassingly parallel (independent
poses/ligands; SURVEY §2.5).  Here the `num_sample` axis of the EDM reverse
pass is partitioned over `dp` by GSPMD: the whole sampler is jitted with
``out_shardings=P('dp')`` plus sharding constraints on the scan carry, and
XLA partitions every per-sample op across dp with zero collectives in
steady state (conditioning tensors and params replicate — one broadcast
over ICI).

Why jit+GSPMD instead of a manual shard_map (the round-4 design): the pair
tensors inside the denoiser carry `tp` row-sharding constraints
(parallel/tp.py), and a dp-manual shard_map region rejects specs that refer
to the auto `tp` axis (`MULTICHIP_r04.json` — ``shard_map out_specs ...
refers to 'tp'``).  Under plain jit both axes are auto, so dp x tp
composes: sample axis over dp, pair rows over tp.  Numerically this IS the
unsharded sampler (same trace), so pose-for-pose equality with
`sample_diffusion` holds by construction (tests/test_sharded_infer.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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

    Returns [num_sample, A, 3] with the leading axis dp-sharded
    (or [T, num_sample, A, 3] with return_trajectory=True).
    """
    dp = mesh.shape["dp"]
    assert num_sample % dp == 0, (num_sample, dp)

    def constrain(x):
        # pin the sample axis (axis 0 of every per-sample tensor in the
        # scan carry) to dp so GSPMD partitions the whole reverse pass
        spec = P(*(["dp"] + [None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    out_spec = P(None, "dp") if kw.get("return_trajectory") else P("dp")

    def body(params, batch, key, conditioning, guidance):
        return sample_diffusion(
            model,
            params,
            batch,
            key,
            num_sample=num_sample,
            guidance=guidance,
            conditioning=conditioning,
            sample_constraint=constrain,
            **kw,
        )

    fn = jax.jit(body, out_shardings=NamedSharding(mesh, out_spec))
    return fn(params, batch, key, conditioning, guidance)
