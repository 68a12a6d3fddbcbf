"""Two-process multi-host smoke: jax.distributed.initialize on CPU.

Each process owns 4 virtual CPU devices; together they form an 8-device
global dp mesh and run ONE sharded train step on a synthetic batch
(reference equivalent: train.sh's OMPI multi-node launch).  Process 0
prints MULTIHOST_OK <loss> on success.

Run (two shells or the test harness):
    python scripts/multihost_cpu_smoke.py 0 &
    python scripts/multihost_cpu_smoke.py 1
"""

import os
import sys

PORT = int(os.environ.get("SMOKE_PORT", "12345"))


def main():
    pid = int(sys.argv[1])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=2,
        process_id=pid,
        cluster_detection_method="deactivate",
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import batch_sharding, make_mesh
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state, make_train_step

    cfg = PhysDockConfig.named(
        "toy", crop_size=12, atom_crop_size=36, inference_mode=False,
        num_augmentation_sample=2,
    )
    mesh = make_mesh()  # 8 global devices, 4 addressable per process
    model = PhysDock(cfg=cfg.model)
    optimizer = make_optimizer()

    # this host's 4 systems of the global batch of 8
    local = [
        make_synthetic_batch(n_tokens=12, n_atoms=36, n_msa=4,
                             n_ligand_tokens=4, seed=pid * 4 + i)
        for i in range(4)
    ]
    local_stacked = {
        k: np.stack([np.asarray(s[k]) for s in local]) for k in local[0]
    }
    sharding = batch_sharding(mesh)
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_stacked.items()
    }

    micro = {k: jnp.asarray(v) for k, v in local[0].items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), micro, jax.random.PRNGKey(1)
    )
    state = init_train_state(params, optimizer)
    step = make_train_step(model, optimizer, cfg.loss, mesh)
    state, logs = step(state, batch, jax.random.PRNGKey(2))
    loss = float(logs["loss"])
    assert np.isfinite(loss), loss
    if pid == 0:
        print(f"MULTIHOST_OK {loss:.6f}", flush=True)
    # explicit teardown: without it the distributed client's atexit hook
    # can hang the interpreter after main() returns
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
    import os as _os

    _os._exit(0)
