"""Multi-chip inference sharding test on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np


def test_sharded_sampling_8_devices(toy_config, tiny_batch):
    from physdock_tpu.infer.sharded import sharded_sample_diffusion
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8)
    model = PhysDock(cfg=toy_config.model, attn_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    x = sharded_sample_diffusion(
        model,
        params,
        batch,
        jax.random.PRNGKey(2),
        mesh,
        num_sample=8,
        steps=2,
    )
    assert x.shape == (8, tiny_batch["a_mask"].shape[0], 3)
    assert np.all(np.isfinite(np.asarray(x)))
    # different devices folded different keys -> samples differ
    assert float(jnp.abs(x[0] - x[1]).max()) > 1e-3
