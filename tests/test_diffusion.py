"""EDM sampler, physics guidance, and force-field tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physdock_tpu.model.diffusion import (
    PhysicsGuidance,
    karras_noise_schedule,
    sample_diffusion,
    select_best_conformers,
)
from physdock_tpu.model.forcefield import (
    build_ligand_ff,
    chirality_correct,
    ff_energy,
    relax_positions,
)
from physdock_tpu.model.physdock import PhysDock


def test_karras_schedule_shape_and_monotone():
    s = karras_noise_schedule(40, rho=7.0)
    assert s.shape == (41,)
    assert s[-1] == 0.0
    assert np.all(np.diff(s) < 1e-9)  # strictly decreasing to 0
    assert np.isclose(s[0], 16.0 * 160.0)
    # redocking CLI uses rho=1000 (near-geometric)
    s2 = karras_noise_schedule(40, rho=1000.0)
    assert np.all(np.isfinite(s2)) and s2[0] > s2[1] > 0


def _methane_like_ff():
    # 5-atom star: C bonded to 4 neighbours (chiral-like arrangement)
    atomic = [6, 6, 7, 8, 9]
    bonds = [(0, 1), (0, 2), (0, 3), (0, 4)]
    ref = np.array(
        [
            [0.0, 0, 0],
            [1.5, 0, 0],
            [-0.5, 1.4, 0],
            [-0.5, -0.7, 1.2],
            [-0.5, -0.7, -1.2],
        ],
        np.float32,
    )
    chirals = [(0, (1, 2, 3, 4))]
    return build_ligand_ff(atomic, bonds, ref, chirals), ref


def test_ff_energy_zero_at_reference():
    ff, ref = _methane_like_ff()
    e0 = float(ff_energy(jnp.asarray(ref), ff))
    assert e0 < 1e-3


def test_ff_relax_reduces_energy():
    ff, ref = _methane_like_ff()
    noisy = jnp.asarray(ref + np.random.default_rng(0).normal(0, 0.35, ref.shape))
    e_before = float(ff_energy(noisy, ff))
    relaxed = relax_positions(noisy[None], ff, iters=60, step_size=5e-3)[0]
    e_after = float(ff_energy(relaxed, ff))
    assert e_after < e_before * 0.5


def test_chirality_check_and_mirror():
    ff, ref = _methane_like_ff()
    ok = chirality_correct(jnp.asarray(ref)[None], ff)
    assert bool(ok[0])
    mirrored = ref * np.array([1.0, 1.0, -1.0], np.float32)
    ok_m = chirality_correct(jnp.asarray(mirrored)[None], ff)
    assert not bool(ok_m[0])


def test_select_best_conformers():
    rng = np.random.default_rng(1)
    L, C, S = 6, 4, 3
    confs = rng.normal(0, 2, (C, L, 3)).astype(np.float32)
    dists = np.linalg.norm(confs[:, :, None] - confs[:, None], axis=-1)
    guidance = PhysicsGuidance(
        ligand_idx=jnp.arange(L, dtype=jnp.int32),
        ligand_mask=jnp.ones(L),
        conf_pos=jnp.asarray(confs),
        conf_dists=jnp.asarray(dists),
        conf_mask=jnp.ones(C),
    )
    # each sample IS one of the conformers (rigidly rotated) -> match itself
    from physdock_tpu.utils.geometry import uniform_random_rotation

    rots = uniform_random_rotation(jax.random.PRNGKey(0), (S,))
    picks = [0, 2, 3]
    lig = jnp.einsum("sij,slj->sli", rots, jnp.asarray(confs[picks]))
    best, sel = select_best_conformers(lig, guidance)
    assert list(np.asarray(best)) == picks


@pytest.mark.slow
def test_sample_diffusion_runs(toy_config, tiny_batch):
    model = PhysDock(cfg=toy_config.model, attn_impl="xla")
    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    params = model.init(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    # ligand atoms = atoms of ligand tokens
    tok = np.asarray(tiny_batch["atom_id_to_token_id"])
    is_lig_tok = np.asarray(tiny_batch["is_ligand"]) > 0
    lig_atoms = np.nonzero(is_lig_tok[tok])[0]
    L = len(lig_atoms)
    rng = np.random.default_rng(0)
    confs = rng.normal(0, 2, (3, L, 3)).astype(np.float32)
    dists = np.linalg.norm(confs[:, :, None] - confs[:, None], axis=-1)
    ff = build_ligand_ff(
        [6] * L, [(i, i + 1) for i in range(L - 1)], confs[0]
    )
    guidance = PhysicsGuidance(
        ligand_idx=jnp.asarray(lig_atoms, jnp.int32),
        ligand_mask=jnp.ones(L),
        conf_pos=jnp.asarray(confs),
        conf_dists=jnp.asarray(dists),
        conf_mask=jnp.ones(3),
        ff=ff,
    )
    x = sample_diffusion(
        model,
        params,
        batch,
        jax.random.PRNGKey(2),
        num_sample=2,
        steps=4,
        guidance=guidance,
        mmff_gamma_0_factor=6.0,
    )
    assert x.shape == (2, tiny_batch["a_mask"].shape[0], 3)
    assert np.all(np.isfinite(x))
