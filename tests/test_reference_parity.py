"""Golden activation parity vs the reference PyTorch implementation.

Builds the reference torch model (toy size, random init), converts its
state_dict with our checkpoint converter, runs both implementations on the
same features, and compares activations.  This validates the converter AND
the forward semantics exactly — the same guarantee the released params.pt
conversion relies on (BASELINE north star: coordinate reproduction within
numerical tolerance).

The reference package imports RDKit at module scope (models/model.py:20-22);
RDKit is absent here, so it is stubbed before import — only the sampler
helpers touch it, not the forward pass under test.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


def _stub_rdkit():
    if "rdkit" in sys.modules:
        return
    rdkit = types.ModuleType("rdkit")
    chem = types.ModuleType("rdkit.Chem")
    chem.AllChem = types.SimpleNamespace()
    geom = types.ModuleType("rdkit.Geometry")
    geom.Point3D = object
    rdbase = types.ModuleType("rdkit.rdBase")
    rdbase.DisableLog = lambda *_: None
    rdkit.Chem = chem
    rdkit.Geometry = geom
    rdkit.rdBase = rdbase
    sys.modules.update(
        {
            "rdkit": rdkit,
            "rdkit.Chem": chem,
            "rdkit.Geometry": geom,
            "rdkit.rdBase": rdbase,
        }
    )


@pytest.fixture(scope="module")
def torch_reference(tiny_batch):
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo unavailable")
    _stub_rdkit()
    sys.path.insert(0, REFERENCE)
    from PhysDock.configs import PhysDockConfig as TorchConfig
    from PhysDock.models.model import PhysDock as TorchPhysDock

    torch.manual_seed(0)
    cfg = TorchConfig(model_name="toy", num_augmentation_sample=2)
    model = TorchPhysDock(cfg).eval().float()
    tb = {}
    for k, v in tiny_batch.items():
        arr = np.asarray(v)
        t = torch.from_numpy(arr.copy())
        if t.dtype in (torch.int32,):
            t = t.long()
        tb[k] = t
    return model, tb


@pytest.fixture(scope="module")
def converted(torch_reference, toy_config, tiny_batch):
    import jax
    import jax.numpy as jnp

    from physdock_tpu.model.import_weights import (
        audit_conversion,
        convert_state_dict,
    )
    from physdock_tpu.model.physdock import PhysDock

    model_t, _ = torch_reference
    state = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = convert_state_dict(state)

    model_j = PhysDock(cfg=toy_config.model, attn_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    ref_params = model_j.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
    missing, unexpected, mismatched = audit_conversion(params, ref_params)
    assert not missing, missing[:5]
    assert not unexpected, unexpected[:5]
    assert not mismatched, mismatched[:5]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model_j, params, batch


def test_conditioning_activation_parity(torch_reference, converted):
    model_t, tb = torch_reference
    model_j, params, batch = converted

    with torch.no_grad():
        a_t, ap_t, s_t, z_t = model_t.diffusion_conditioning(tb)
    a_j, ap_j, s_j, z_j = model_j.apply(params, batch, method="conditioning")

    for name, t_val, j_val, tol in [
        ("a", a_t, a_j, 2e-3),
        ("ap", ap_t, ap_j, 2e-3),
        ("s", s_t, s_j, 5e-3),
        ("z", z_t, z_j, 5e-3),
    ]:
        t_np = t_val.numpy()
        j_np = np.asarray(j_val)
        scale = np.abs(t_np).max() + 1e-6
        err = np.abs(t_np - j_np).max() / scale
        assert err < tol, f"{name}: rel err {err:.2e} (scale {scale:.2f})"


def test_denoiser_activation_parity(torch_reference, converted, tiny_batch):
    import jax.numpy as jnp

    model_t, tb = torch_reference
    model_j, params, batch = converted

    A = tiny_batch["a_mask"].shape[0]
    rng = np.random.default_rng(5)
    x_hat = rng.normal(0, 16.0, (2, A, 3)).astype(np.float32)
    t_hat = np.array([16.0, 2.0], np.float32)

    with torch.no_grad():
        a_t, ap_t, s_t, z_t = model_t.diffusion_conditioning(tb)
        x_d_t = model_t.dit(
            tb,
            torch.from_numpy(x_hat),
            torch.from_numpy(t_hat),
            a_t,
            ap_t,
            s_t,
            z_t,
        ).numpy()

    cond = model_j.apply(params, batch, method="conditioning")
    x_d_j = np.asarray(
        model_j.apply(
            params, batch, jnp.asarray(x_hat), jnp.asarray(t_hat), *cond,
            method="denoise",
        )
    )
    err = np.abs(x_d_t - x_d_j).max()
    assert err < 0.1, f"denoised coords abs err {err:.3f} A"
    # EDM-preconditioned outputs are coordinates; demand tight agreement
    assert np.abs(x_d_t - x_d_j).mean() < 0.02


def test_distogram_parity(torch_reference, converted):
    model_t, tb = torch_reference
    model_j, params, batch = converted
    with torch.no_grad():
        _, _, _, z_t = model_t.diffusion_conditioning(tb)
        p_t = model_t.linear_distogram(z_t)
        p_t = (p_t + p_t.transpose(-2, -3)).numpy()
    _, _, _, z_j = model_j.apply(params, batch, method="conditioning")
    p_j = np.asarray(model_j.apply(params, z_j, method="distogram"))
    assert np.abs(p_t - p_j).max() < 5e-3 * (np.abs(p_t).max() + 1e-6)
