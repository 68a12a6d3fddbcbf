"""Loss-function parity vs the reference torch implementations.

Feeds identical inputs through reference PhysDock/models/loss.py functions
and ours; asserts numerical agreement.  Complements the model-activation
parity suite.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_loss():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo unavailable")
    from tests.test_reference_parity import _stub_rdkit

    _stub_rdkit()
    sys.path.insert(0, REFERENCE)
    import importlib

    return importlib.import_module("PhysDock.models.loss")


@pytest.fixture(scope="module")
def inputs(tiny_batch):
    rng = np.random.default_rng(0)
    A = tiny_batch["a_mask"].shape[0]
    S = 3
    return {
        "x_denoised": rng.normal(0, 5, (S, A, 3)).astype(np.float32),
        "t_hat": np.array([20.0, 4.0, 0.5], np.float32),
        "batch": {k: np.asarray(v) for k, v in tiny_batch.items()},
    }


def test_weighted_mse_parity(ref_loss, inputs):
    import jax.numpy as jnp

    from physdock_tpu.model.losses import weighted_mse_loss

    b = inputs["batch"]
    t = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in b.items()}
    ref = ref_loss.weighted_mse_loss(
        x_denoised=torch.from_numpy(inputs["x_denoised"]),
        x_gt=t["x_gt"],
        t_hat=torch.from_numpy(inputs["t_hat"]),
        sigma_data=16.0,
        is_dna=t["is_dna"],
        is_rna=t["is_rna"],
        is_ligand=t["is_ligand"],
        alpha_dna=5.0,
        alpha_rna=5.0,
        alpha_ligand=10.0,
        atom_id_to_token_id=t["atom_id_to_token_id"].long(),
        x_exists=t["x_exists"],
    ).item()
    ours = float(
        weighted_mse_loss(
            jnp.asarray(inputs["x_denoised"]),
            jnp.asarray(b["x_gt"]),
            jnp.asarray(inputs["t_hat"]),
            sigma_data=16.0,
            is_dna=jnp.asarray(b["is_dna"]),
            is_rna=jnp.asarray(b["is_rna"]),
            is_ligand=jnp.asarray(b["is_ligand"]),
            alpha_dna=5.0,
            alpha_rna=5.0,
            alpha_ligand=10.0,
            atom_id_to_token_id=jnp.asarray(b["atom_id_to_token_id"]),
            x_exists=jnp.asarray(b["x_exists"]),
        )
    )
    assert np.isclose(ref, ours, rtol=1e-3), (ref, ours)


def test_smooth_lddt_parity(ref_loss, inputs):
    import jax.numpy as jnp

    from physdock_tpu.model.losses import smooth_lddt_loss

    b = inputs["batch"]
    ref = ref_loss.smooth_lddt_loss(
        x_denoised=torch.from_numpy(inputs["x_denoised"]),
        x_gt=torch.from_numpy(b["x_gt"]),
        x_exists=torch.from_numpy(b["x_exists"]),
        t_hat=torch.from_numpy(inputs["t_hat"]),
        atom_id_to_token_id=torch.from_numpy(b["atom_id_to_token_id"]),
        max_clamp_distance=15.0,
    ).item()
    ours = float(
        smooth_lddt_loss(
            jnp.asarray(inputs["x_denoised"]),
            jnp.asarray(b["x_gt"]),
            jnp.asarray(b["x_exists"]),
            max_clamp_distance=15.0,
        )
    )
    assert np.isclose(ref, ours, rtol=1e-4), (ref, ours)


def test_distogram_parity(ref_loss, inputs):
    import jax.numpy as jnp

    from physdock_tpu.model.losses import distogram_loss

    b = inputs["batch"]
    T = b["s_mask"].shape[0]
    rng = np.random.default_rng(1)
    p = rng.normal(0, 1, (T, T, 39)).astype(np.float32)
    ref = ref_loss.distogram_loss(
        p_distogram=torch.from_numpy(p),
        x_gt=torch.from_numpy(b["x_gt"]),
        x_exists=torch.from_numpy(b["x_exists"]),
        token_id_to_pseudo_beta_atom_id=torch.from_numpy(
            b["token_id_to_pseudo_beta_atom_id"]
        ).long(),
    ).item()
    ours = float(
        distogram_loss(
            jnp.asarray(p),
            jnp.asarray(b["x_gt"]),
            jnp.asarray(b["x_exists"]),
            jnp.asarray(b["token_id_to_pseudo_beta_atom_id"]),
        )
    )
    assert np.isclose(ref, ours, rtol=1e-4), (ref, ours)


def test_bond_and_key_res_parity(ref_loss, inputs):
    import jax.numpy as jnp

    from physdock_tpu.model.losses import bond_loss, key_res_loss

    b = inputs["batch"]
    ref_b = ref_loss.bond_loss(
        x_denoised=torch.from_numpy(inputs["x_denoised"]),
        x_gt=torch.from_numpy(b["x_gt"]),
        x_exists=torch.from_numpy(b["x_exists"]),
        token_bonds=torch.from_numpy(b["token_bonds"]),
        t_hat=torch.from_numpy(inputs["t_hat"]),
        sigma_data=16.0,
        atom_id_to_token_id=torch.from_numpy(b["atom_id_to_token_id"]).long(),
        token_id_to_centre_atom_id=torch.from_numpy(
            b["token_id_to_centre_atom_id"]
        ).long(),
    ).item()
    ours_b = float(
        bond_loss(
            jnp.asarray(inputs["x_denoised"]),
            jnp.asarray(b["x_gt"]),
            jnp.asarray(b["token_bonds"]),
            jnp.asarray(inputs["t_hat"]),
            sigma_data=16.0,
            token_id_to_centre_atom_id=jnp.asarray(b["token_id_to_centre_atom_id"]),
        )
    )
    assert np.isclose(ref_b, ours_b, rtol=1e-3), (ref_b, ours_b)

    ref_k = ref_loss.key_res_loss(
        x_denoised=torch.from_numpy(inputs["x_denoised"]),
        x_gt=torch.from_numpy(b["x_gt"]),
        t_hat=torch.from_numpy(inputs["t_hat"]),
        is_ligand=torch.from_numpy(b["is_ligand"]),
        is_key_res=torch.from_numpy(b["is_key_res"]),
        sigma_data=16.0,
        token_id_to_centre_atom_id=torch.from_numpy(
            b["token_id_to_centre_atom_id"]
        ).long(),
    ).item()
    ours_k = float(
        key_res_loss(
            jnp.asarray(inputs["x_denoised"]),
            jnp.asarray(b["x_gt"]),
            jnp.asarray(inputs["t_hat"]),
            is_ligand=jnp.asarray(b["is_ligand"]),
            is_key_res=jnp.asarray(b["is_key_res"]),
            sigma_data=16.0,
            token_id_to_centre_atom_id=jnp.asarray(b["token_id_to_centre_atom_id"]),
        )
    )
    assert np.isclose(ref_k, ours_k, rtol=1e-3), (ref_k, ours_k)


def test_rigid_align_parity(ref_loss, inputs):
    import jax.numpy as jnp

    from physdock_tpu.utils.geometry import weighted_rigid_align

    b = inputs["batch"]
    w = np.asarray(b["x_exists"], np.float32)
    ref = ref_loss.weighted_rigid_align(
        torch.from_numpy(inputs["x_denoised"]),
        torch.from_numpy(b["x_gt"]),
        torch.from_numpy(w),
    ).numpy()
    ours = np.asarray(
        weighted_rigid_align(
            jnp.asarray(inputs["x_denoised"]),
            jnp.asarray(b["x_gt"]),
            jnp.asarray(w),
        )
    )
    assert np.allclose(ref, ours, atol=1e-3), np.abs(ref - ours).max()
