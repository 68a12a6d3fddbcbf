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


def test_sharded_sampling_dp_x_tp(toy_config, tiny_batch):
    """dp x tp composition — the exact combination that shipped broken in
    round 4 (MULTICHIP_r04 ok:false: the tp row-sharding constraints inside
    the denoiser are incompatible with a dp-manual shard_map).  Guided
    sampling on a dp=4 x tp=2 mesh must match the unsharded sampler."""
    from physdock_tpu.infer.sharded import sharded_sample_diffusion
    from physdock_tpu.model.diffusion import (
        PhysicsGuidance,
        sample_diffusion,
    )
    from physdock_tpu.model.forcefield import build_ligand_ff
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import make_mesh
    from physdock_tpu.parallel.tp import use_tp

    mesh = make_mesh(dp=4, tp=2)
    model = PhysDock(cfg=toy_config.model, attn_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(11)

    tok_map = np.asarray(tiny_batch["atom_id_to_token_id"])
    lig_atoms = np.nonzero((np.asarray(tiny_batch["is_ligand"]) > 0)[tok_map])[0]
    L = len(lig_atoms)
    rng = np.random.default_rng(0)
    confs = rng.normal(0, 2, (3, L, 3)).astype(np.float32)
    dists = np.linalg.norm(confs[:, :, None] - confs[:, None], axis=-1)
    ff = build_ligand_ff([6] * L, [(i, i + 1) for i in range(L - 1)], confs[0])
    guidance = PhysicsGuidance(
        ligand_idx=jnp.asarray(lig_atoms, jnp.int32),
        ligand_mask=jnp.ones(L),
        conf_pos=jnp.asarray(confs),
        conf_dists=jnp.asarray(dists),
        conf_mask=jnp.ones(3),
        ff=ff,
    )

    with use_tp(mesh):
        x_sharded = sharded_sample_diffusion(
            model, params, batch, key, mesh, num_sample=4, steps=2,
            guidance=guidance, mmff_gamma_0_factor=6.0,
        )
    x_single = sample_diffusion(
        model, params, batch, key, num_sample=4, steps=2,
        guidance=guidance, mmff_gamma_0_factor=6.0,
    )
    assert x_sharded.shape == (4, tiny_batch["a_mask"].shape[0], 3)
    assert np.all(np.isfinite(np.asarray(x_sharded)))
    np.testing.assert_allclose(
        np.asarray(x_sharded), np.asarray(x_single), rtol=1e-4, atol=2e-3,
        err_msg="dp x tp sharded sampler diverged from the unsharded sampler",
    )
