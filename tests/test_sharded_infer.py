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


def test_sharded_equals_unsharded(toy_config, tiny_batch):
    """DP-correctness gate (VERDICT r2 item 5): the 8-device sharded
    sampler must produce exactly the poses of the single-device sampler
    under the same base key (per-sample key streams are mesh-invariant)."""
    from physdock_tpu.infer.sharded import sharded_sample_diffusion
    from physdock_tpu.model.diffusion import sample_diffusion
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8)
    model = PhysDock(cfg=toy_config.model, attn_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(7)

    x_sharded = sharded_sample_diffusion(
        model, params, batch, key, mesh, num_sample=8, steps=2
    )
    x_single = sample_diffusion(
        model, params, batch, key, num_sample=8, steps=2
    )
    # early-step coordinates sit at sigma_max scale (~2500 A), so the
    # tolerance is relative: batched-vs-sharded matmul reduction order
    # gives ~1e-5 relative fp drift, nothing more
    np.testing.assert_allclose(
        np.asarray(x_sharded), np.asarray(x_single), rtol=1e-4, atol=2e-3,
        err_msg="dp-sharded sampler diverged from the unsharded sampler",
    )
