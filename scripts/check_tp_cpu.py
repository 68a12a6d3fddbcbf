"""One-shot verifier: full dp x tp train step == dp-only train step.

GSPMD-partitioning the whole train graph costs minutes of CPU compile,
too heavy for the test suite (tests/test_tensor_parallel.py covers the
light equivalences; __graft_entry__.dryrun_multichip runs the dp x tp
step every round).  This script proves parameter-level equality once;
the measured max delta is recorded in ARCHITECTURE.md.

Run: python scripts/check_tp_cpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel import tp as tp_lib
    from physdock_tpu.parallel.mesh import batch_sharding, make_mesh
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state, make_train_step

    cfg = PhysDockConfig.named("toy", num_augmentation_sample=2)
    model = PhysDock(cfg=cfg.model)
    single = make_synthetic_batch(n_tokens=16, n_atoms=48, n_msa=4)
    micro0 = {k: jnp.asarray(v) for k, v in single.items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), micro0, jax.random.PRNGKey(1)
    )
    optimizer = make_optimizer()
    # the train step donates its state buffers — give each run its own
    # fresh state from a host-side snapshot
    params_np = jax.device_get(params)
    batch = {
        k: jnp.asarray(np.stack([np.asarray(v)] * 2)) for k, v in single.items()
    }

    def fresh_state():
        p = jax.tree_util.tree_map(jnp.asarray, params_np)
        return init_train_state(p, optimizer)

    mesh_tp = make_mesh(dp=2, tp=4)
    with tp_lib.use_tp(mesh_tp):
        step_tp = make_train_step(model, optimizer, cfg.loss, mesh_tp)
        state_tp, logs_tp = step_tp(
            fresh_state(),
            jax.device_put(batch, batch_sharding(mesh_tp)),
            jax.random.PRNGKey(3),
        )
    print("tp loss:", float(logs_tp["loss"]), flush=True)
    tp_params = jax.device_get(state_tp.params)

    mesh_dp = make_mesh(dp=2)
    step_dp = make_train_step(model, optimizer, cfg.loss, mesh_dp)
    state_dp, logs_dp = step_dp(
        fresh_state(),
        jax.device_put(batch, batch_sharding(mesh_dp)),
        jax.random.PRNGKey(3),
    )
    print("dp loss:", float(logs_dp["loss"]), flush=True)

    dmax = max(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()),
                tp_params,
                jax.device_get(state_dp.params),
            )
        )
    )
    dloss = abs(float(logs_tp["loss"]) - float(logs_dp["loss"]))
    print(f"max param delta: {dmax:.3e}  loss delta: {dloss:.3e}")
    assert dmax < 5e-5, dmax
    assert dloss < 1e-4, dloss
    print("TP TRAIN-STEP EQUALITY OK")


if __name__ == "__main__":
    main()
