"""Model-core tests: primitives, attention variants, trunk, denoiser, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physdock_tpu.config import PhysDockConfig
from physdock_tpu.model.losses import physdock_loss
from physdock_tpu.model.physdock import PhysDock


def _to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def model_and_params(toy_config, tiny_batch):
    model = PhysDock(cfg=toy_config.model, attn_impl="xla")
    batch = _to_jnp(tiny_batch)
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    return model, params, batch


def test_conditioning_shapes(model_and_params, toy_config):
    model, params, batch = model_and_params
    a, ap, s, z = model.apply(params, batch, method="conditioning")
    T = batch["s_mask"].shape[0]
    A = batch["a_mask"].shape[0]
    c = toy_config.model
    assert a.shape == (A, c.c_a)
    assert ap.shape == (A, A, c.c_ap)
    assert s.shape == (T, c.c_s)
    assert z.shape == (T, T, c.c_z)
    for x in (a, ap, s, z):
        assert np.all(np.isfinite(x))


def test_training_forward_and_loss(model_and_params, toy_config):
    model, params, batch = model_and_params
    out = model.apply(params, batch, jax.random.PRNGKey(2))
    n_aug = toy_config.model.num_augmentation_sample
    A = batch["a_mask"].shape[0]
    T = batch["s_mask"].shape[0]
    assert out["x_denoised"].shape == (n_aug, A, 3)
    assert out["t_hat"].shape == (n_aug,)
    assert out["p_distogram"].shape == (T, T, 39)
    # distogram symmetrized
    assert np.allclose(
        out["p_distogram"], np.swapaxes(out["p_distogram"], 0, 1), atol=1e-5
    )
    loss, logs = physdock_loss(out, batch, toy_config.loss)
    assert np.isfinite(loss)
    assert set(logs) >= {"weighted_mse_loss", "smooth_lddt_loss", "distogram_loss"}


def test_denoiser_identity_at_zero_noise(model_and_params):
    """EDM preconditioning: as t->0, c_skip->1 and c_out->0, so the denoiser
    returns ~x_hat regardless of network output."""
    model, params, batch = model_and_params
    a, ap, s, z = model.apply(params, batch, method="conditioning")
    A = batch["a_mask"].shape[0]
    x_hat = jax.random.normal(jax.random.PRNGKey(3), (2, A, 3))
    t_hat = jnp.full((2,), 1e-4)
    x_d = model.apply(params, batch, x_hat, t_hat, a, ap, s, z, method="denoise")
    assert np.allclose(x_d, x_hat, atol=1e-2)


def test_gradients_flow(model_and_params, toy_config):
    model, params, batch = model_and_params

    def loss_fn(p):
        out = model.apply(p, batch, jax.random.PRNGKey(4))
        loss, _ = physdock_loss(out, batch, toy_config.loss)
        return loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0.0


def test_padding_invariance(toy_config):
    """Padded tokens/atoms must not change real outputs (static-shape
    bucketing correctness)."""
    from physdock_tpu.data.synthetic import make_synthetic_batch, pad_batch

    raw = make_synthetic_batch(n_tokens=12, n_atoms=36, n_msa=4, n_ligand_tokens=4)
    model = PhysDock(cfg=toy_config.model, attn_impl="xla")
    b0 = _to_jnp(raw)
    params = model.init(jax.random.PRNGKey(0), b0, jax.random.PRNGKey(1))
    a0, ap0, s0, z0 = model.apply(params, b0, method="conditioning")

    bp = _to_jnp(pad_batch(raw, 16, 44))
    a1, ap1, s1, z1 = model.apply(params, bp, method="conditioning")
    assert np.allclose(a0, a1[:36], atol=1e-4)
    assert np.allclose(s0, s1[:12], atol=1e-4)
    assert np.allclose(z0, z1[:12, :12], atol=1e-4)

    # pad CONTENT must not matter at all (two-tier mask correctness)
    g = {k: np.array(v) for k, v in pad_batch(raw, 16, 44).items()}
    g["ref_feat"][36:] = 3.14
    g["msa_feat"][:, 12:] = -2.7
    g["templ_feat"][12:] = 1.0
    a2, _, s2, z2 = model.apply(params, _to_jnp(g), method="conditioning")
    assert np.array_equal(np.asarray(a1[:36]), np.asarray(a2[:36]))
    assert np.array_equal(np.asarray(s1[:12]), np.asarray(s2[:12]))


def test_confidence_head(toy_config, tiny_batch):
    """Optional confidence head: init_all creates its params; PAE/PDE/pLDDT
    shapes match the reference heads (confidence_module.py:40-53)."""
    model = PhysDock(cfg=toy_config.model, attn_impl="xla", with_confidence=True)
    batch = _to_jnp(tiny_batch)
    params = model.init(
        jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1), method="init_all"
    )
    s, z = model.apply(params, batch, method="conditioning")[2:]
    A = tiny_batch["a_mask"].shape[0]
    T = tiny_batch["s_mask"].shape[0]
    x = jax.random.normal(jax.random.PRNGKey(2), (1, A, 3))
    pae, pde, plddt = model.apply(params, batch, s, z, x, method="confidence")
    assert pae.shape == (T, T, 64)
    assert pde.shape == (T, T, 64)
    assert plddt.shape == (A, 50)
    for t in (pae, pde, plddt):
        assert np.all(np.isfinite(np.asarray(t)))


def test_recycling_trunk(toy_config, tiny_batch):
    """num_recycles>0 (configs_old.py training-era capability): recycled
    (s,z) re-enter the trunk through zero-init projections — identical to
    num_recycles=0 at init, param names unchanged for the release model."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.model.physdock import PhysDock

    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    m0 = PhysDock(cfg=toy_config.model)
    cfg2 = dataclasses.replace(toy_config.model, num_recycles=2)
    m2 = PhysDock(cfg=cfg2)
    p0 = m0.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    p2 = m2.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    # recycle params exist only with recycling on
    te0 = p0["params"]["diffusion_conditioning"]["token_embedder"]
    te2 = p2["params"]["diffusion_conditioning"]["token_embedder"]
    assert "recycle_linear_s" not in te0
    assert "recycle_linear_s" in te2 and "recycle_linear_z" in te2

    # zero-init recycle projection => same conditioning at init
    s0, z0 = m0.apply(p0, batch, method="conditioning")[2:4]
    # graft the shared params of p0 into p2 (same names)
    import flax

    flat0 = flax.traverse_util.flatten_dict(p0["params"])
    flat2 = dict(flax.traverse_util.flatten_dict(p2["params"]))
    flat2.update(flat0)
    p2g = {"params": flax.traverse_util.unflatten_dict(flat2)}
    s2, z2 = m2.apply(p2g, batch, method="conditioning")[2:4]
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(s0), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(z2), np.asarray(z0), rtol=2e-4, atol=2e-4
    )


def test_compact_transport_roundtrip(tiny_batch):
    """Compact int8 transport re-expands to the exact fat features (modulo
    uint8 quantization of deletion_value) — model outputs match."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.model.compact import compact_batch_np, expand_batch

    compact = compact_batch_np(tiny_batch)
    for k in ("msa_feat", "rel_tok_feat", "templ_feat", "ap_mask", "z_mask"):
        assert k not in compact
    fat = expand_batch({k: jnp.asarray(v) for k, v in compact.items()})
    np.testing.assert_allclose(
        np.asarray(fat["rel_tok_feat"]), tiny_batch["rel_tok_feat"], atol=0
    )
    np.testing.assert_allclose(
        np.asarray(fat["templ_feat"]), tiny_batch["templ_feat"], atol=0
    )
    np.testing.assert_allclose(
        np.asarray(fat["msa_feat"]), tiny_batch["msa_feat"], atol=1 / 254
    )
    # compact transport is dramatically smaller
    fat_bytes = sum(
        np.asarray(tiny_batch[k]).nbytes
        for k in ("msa_feat", "rel_tok_feat", "templ_feat", "ap_mask", "z_mask")
    )
    c_bytes = sum(
        np.asarray(v).nbytes
        for k, v in compact.items()
        if k.endswith("_c")
    )
    assert c_bytes < fat_bytes / 20
