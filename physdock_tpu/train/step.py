"""Sharded training step.

TPU-native replacement for Uni-Core DDP (SURVEY §2.5): the system batch
(leading axis) shards over the `dp` mesh axis via shard_map; each device
computes its microbatch gradient, clips it to 0.1 (the reference's
per-sample clip — equivalent because the reference runs 1 system/GPU,
tasks/unicore_train/__init__.py:61-65), psum-means in fp32 over ICI, then
the replicated optimizer applies global clip 10 + adam + EMA.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from physdock_tpu.config import LossConfig
from physdock_tpu.model.losses import physdock_loss, rffold_loss
from physdock_tpu.train.optim import clip_by_norm, ema_update


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
    )


def make_train_step(
    model,
    optimizer,
    loss_cfg: LossConfig,
    mesh: Mesh,
    per_replica_clip: float = 0.1,
    ema_decay: float = 0.999,
    sigma_data: float = 16.0,
    use_mini_rollout: bool = False,
    mini_rollout_steps: int = 12,
    corrupt_rollout_pose: bool = False,
):
    """Build the jitted sharded train step.

    batch: dict of arrays with a leading system axis divisible by mesh dp
    size.  Returns (new_state, logs) with logs averaged over replicas.
    """
    from jax import shard_map

    dp = mesh.shape["dp"]

    def loss_fn(params, microbatch, key):
        if not use_mini_rollout:
            out = model.apply(params, microbatch, key)
            return physdock_loss(out, microbatch, loss_cfg, sigma_data=sigma_data)
        # mini-rollout confidence training (loss_module3.py:599-610,
        # train.sh --mini-rollout-steps 12): run a short no-grad EDM rollout
        # with the trunk conditioning already computed by the forward, then
        # train the PAE/PDE/pLDDT heads on the rollout's first sample.
        from physdock_tpu.model.diffusion import sample_diffusion

        k_fwd, k_roll = jax.random.split(key)
        out = model.apply(params, microbatch, k_fwd, return_conditioning=True)
        a, ap, s, z = out.pop("conditioning")
        if corrupt_rollout_pose:
            # corrupted-GT pose instead of a rollout: spans the lDDT/PAE
            # label bins even when the denoiser is memorized (corrupt.py)
            from physdock_tpu.train.corrupt import corrupt_pose

            is_lig_atom = (
                jnp.take(
                    microbatch["is_ligand"],
                    microbatch["atom_id_to_token_id"],
                    axis=-1,
                )
                * microbatch["a_mask"]
            ).astype(jnp.float32)
            x_pred = corrupt_pose(
                k_roll,
                microbatch["x_gt"].astype(jnp.float32),
                microbatch["a_mask"].astype(jnp.float32),
                is_lig_atom,
            )
        else:
            x_pred = jax.lax.stop_gradient(
                sample_diffusion(
                    model,
                    params,
                    microbatch,
                    k_roll,
                    num_sample=1,
                    steps=mini_rollout_steps,
                    conditioning=(a, ap, s, z),
                )
            )
        p_pae, p_pde, p_plddt = model.apply(
            params, microbatch, s, z, x_pred, method="confidence"
        )
        out.update(x_pred=x_pred, p_pae=p_pae, p_pde=p_pde, p_plddt=p_plddt)
        return rffold_loss(
            out, microbatch, loss_cfg, sigma_data=sigma_data, use_mini_rollout=True
        )

    def device_grads(params, batch, key):
        """Runs per device under shard_map; batch is the local shard.

        Per-sample keys fold in the GLOBAL sample index, so the gradient
        is invariant to the mesh size for a fixed global batch (the dp=8
        step equals the dp=1 step — tests/test_train.py asserts it)."""
        idx = jax.lax.axis_index("dp")

        def one(i, acc):
            microbatch = jax.tree_util.tree_map(lambda x: x[i], batch)
            n_local_ = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x.shape[0], batch)
            )[0]
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, microbatch,
                jax.random.fold_in(key, idx * n_local_ + i),
            )
            grads = clip_by_norm(grads, per_replica_clip)
            g_acc, l_acc = acc
            return (
                jax.tree_util.tree_map(jnp.add, g_acc, grads),
                jax.tree_util.tree_map(jnp.add, l_acc, logs),
            )

        local = jax.tree_util.tree_map(lambda x: x.shape[0], batch)
        n_local = jax.tree_util.tree_leaves(local)[0]
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
        _, zero_l = jax.eval_shape(loss_fn, params, jax.tree_util.tree_map(lambda x: x[0], batch), key)
        zero_l = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), zero_l)
        grads, logs = jax.lax.fori_loop(0, n_local, one, (zero_g, zero_l))

        # fp32 cross-replica mean (train.sh --allreduce-fp32-grad)
        total = n_local * dp
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g.astype(jnp.float32), "dp") / total, grads
        )
        logs = jax.tree_util.tree_map(
            lambda l: jax.lax.psum(l / total, "dp"), logs
        )
        return grads, logs

    sharded_grads = shard_map(
        device_grads,
        mesh=mesh,
        in_specs=(P(), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
        # manual only over dp; a tp axis (pair-row tensor parallelism,
        # parallel/tp.py) stays auto so GSPMD shards the model body
        axis_names={"dp"},
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict, key) -> Tuple[TrainState, Dict]:
        # donating the state buffers lets XLA update params/opt/EMA in place
        # (and keeps input/output layouts identical -> no second compile)
        grads, logs = sharded_grads(state.params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, ema_decay)
        return (
            TrainState(state.step + 1, params, opt_state, ema),
            logs,
        )

    return train_step
