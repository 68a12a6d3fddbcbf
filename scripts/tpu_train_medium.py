"""Medium-model training step timing on one chip.

Times the full sharded train step (1-device mesh): trunk + 48-sample DiT
forward, backward, per-replica clip, psum, adam, EMA.  Also times the
mini-rollout confidence variant when --rollout is passed.
"""

from __future__ import annotations

import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import batch_sharding, make_mesh
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state, make_train_step

    rollout = "--rollout" in sys.argv
    on_tpu = jax.devices()[0].platform != "cpu"
    name = "medium" if on_tpu else "toy"
    n_tok, n_atoms, n_msa, n_aug = (
        (256, 2048, 128, 48) if on_tpu else (16, 48, 4, 2)
    )

    cfg = PhysDockConfig.named(
        name, bf16=on_tpu, num_augmentation_sample=n_aug
    )
    model = PhysDock(
        cfg=cfg.model,
        dtype=cfg.dtypes.compute_dtype,
        with_confidence=rollout,
    )
    optimizer = make_optimizer()
    mesh = make_mesh(dp=1)

    single = make_synthetic_batch(
        n_tokens=n_tok, n_atoms=n_atoms, n_msa=n_msa, n_ligand_tokens=16
    )
    batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in single.items()}
    batch = jax.device_put(batch, batch_sharding(mesh))
    micro = {k: jnp.asarray(v) for k, v in single.items()}
    params = jax.jit(
        model.init,
        static_argnames=("method",) if rollout else (),
    )(
        jax.random.PRNGKey(0), micro, jax.random.PRNGKey(1),
        **({"method": "init_all"} if rollout else {}),
    )
    state = init_train_state(params, optimizer)
    step = make_train_step(
        model, optimizer, cfg.loss, mesh,
        use_mini_rollout=rollout, mini_rollout_steps=12,
    )

    t0 = time.perf_counter()
    state, logs = step(state, batch, jax.random.PRNGKey(2))
    loss = float(logs["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s loss={loss:.3f}")

    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        state, logs = step(state, batch, jax.random.PRNGKey(3 + i))
        loss = float(logs["loss"])  # scalar readback = sync
    dt = (time.perf_counter() - t0) / n
    tag = "mini-rollout" if rollout else "standard"
    print(f"steady {tag} train step ({name}, {n_tok}/{n_atoms}, "
          f"{n_aug} aug): {dt*1e3:.0f} ms  loss={loss:.3f}")


if __name__ == "__main__":
    main()
