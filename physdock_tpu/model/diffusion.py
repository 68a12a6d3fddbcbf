"""EDM reverse-diffusion sampler with inline physics guidance.

TPU-native redesign of reference PhysDock/models/model.py:117-282
(`karras_noise_schedule`, `prepare_solver`, `sample_diffusion`):

  * the whole reverse pass is ONE `lax.scan` over the sigma schedule — the
    conditioning trunk runs once, the denoiser body compiles once;
  * per-step physics guidance is pure JAX selected by per-step flags carried
    as scan inputs (no Python branching, no recompiles when the adaptive
    mmff factor changes between rounds);
  * conformer-ensemble distance matching (model.py:223-250) is a masked
    argmin over a precomputed [C, L, L] conformer distance bank;
  * the late-stage MMFF relaxation (model.py:252-261, host RDKit in the
    reference) is the on-device restraint field in model/forcefield.py;
  * ligand atoms live at static padded indices; scatters use mode="drop".

Randomness is explicit: one PRNG key in, split per step inside the scan.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from physdock_tpu.model.forcefield import LigandFF, relax_positions
from physdock_tpu.utils.geometry import (
    apply_centre_augmentation,
    centre_random_augmentation,
    masked_mean,
    smooth_lddt_epsilon,
    weighted_rigid_align,
)

Batch = Dict[str, jnp.ndarray]


def karras_noise_schedule(
    num_steps: int,
    sigma_data: float = 16.0,
    s_max: float = 160.0,
    s_min: float = 4e-3,
    rho: float = 7.0,
) -> np.ndarray:
    """Karras sigma schedule with trailing zero (model.py:117-129).

    Note the reference default s_min is written `4 * 10e-4` (= 4e-3), and the
    redocking CLI uses rho=1000, which makes the schedule near-geometric.
    Returned on host (numpy) — it is static per (steps, rho).
    """
    i = np.arange(num_steps, dtype=np.float64)
    # num_steps=1 (a single denoise from s_max, e.g. the shortest
    # mini-rollout) must not divide 0/0
    denom = max(num_steps - 1, 1)
    t = sigma_data * (
        s_max ** (1 / rho) + i / denom * (s_min ** (1 / rho) - s_max ** (1 / rho))
    ) ** rho
    return np.concatenate([t, [0.0]]).astype(np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PhysicsGuidance:
    """Device-side physics-guidance inputs (static shapes).

    ligand_idx: [L] indices of ligand atoms in the (padded) atom axis; padded
    entries point one-past-the-end so scatters drop them.
    conf_pos / conf_dists: ETKDG-style conformer bank [C, L, 3] / [C, L, L]
    (precomputed host-side once per ligand; model.py:176-196).
    """

    ligand_idx: jnp.ndarray  # [L] int32
    ligand_mask: jnp.ndarray  # [L] float
    conf_pos: jnp.ndarray  # [C, L, 3]
    conf_dists: jnp.ndarray  # [C, L, L]
    conf_mask: jnp.ndarray  # [C] float — valid conformers
    ff: Optional[LigandFF] = None


def select_best_conformers(
    ligand_pos: jnp.ndarray,  # [S, L, 3]
    guidance: PhysicsGuidance,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match each sample's ligand distance matrix against the conformer bank
    with the 4-sigmoid epsilon and return (best_idx [S], conf_pos [S, L, 3])
    (model.py:236-250)."""
    lig_d = jnp.linalg.norm(
        ligand_pos[:, :, None] - ligand_pos[:, None] + 1e-12, axis=-1
    )
    delta = jnp.abs(lig_d[:, None] - guidance.conf_dists[None])  # [S, C, L, L]
    eps = smooth_lddt_epsilon(delta)
    pair_mask = guidance.ligand_mask[:, None] * guidance.ligand_mask[None, :]
    score = masked_mean(pair_mask[None, None], eps, axis=(-1, -2))  # [S, C]
    score = jnp.where(guidance.conf_mask[None] > 0, score, jnp.inf)
    best = jnp.argmin(score, axis=-1)
    return best, guidance.conf_pos[best]


def _gather_ligand(x, guidance):
    # [..., A, 3] -> [..., L, 3]; padded idx gathers clamp (masked out later)
    return jnp.take(x, guidance.ligand_idx, axis=-2, mode="clip")


def _scatter_ligand(x, lig, guidance):
    # padded idx point out-of-range -> dropped
    return x.at[..., guidance.ligand_idx, :].set(lig, mode="drop")


def sample_diffusion(
    model,
    params,
    batch: Batch,
    key,
    *,
    num_sample: int = 5,
    steps: int = 40,
    gamma_0: float = 0.8,
    gamma_min: float = 1.0,
    noise_scale_lambda: float = 1.003,
    step_scale_eta: float = 1.5,
    ode_step_scale_eta: float = 1.0,
    karras_rho: float = 7.0,
    s_max: float = 160.0,
    s_min: float = 4e-3,
    guidance: Optional[PhysicsGuidance] = None,
    mmff_gamma_0_factor: float = 1.0,
    mmff_iters: int = 5,
    align_ref_pos: bool = True,
    conditioning: Optional[Tuple] = None,
    sample_key_offset=0,
    noise_override: Optional[Dict[str, jnp.ndarray]] = None,
    return_trajectory: bool = False,
    sample_constraint=None,
) -> jnp.ndarray:
    """Run the EDM reverse pass; returns x [num_sample, A, 3].

    `mmff_gamma_0_factor` may be a traced scalar (it adapts across rounds —
    redocking.py:318-335) without triggering recompilation.
    If `conditioning` (a, ap, s, z) is given, the trunk is skipped (the
    redocking round loop reuses it across rounds with resampled MSA —
    conditioning must then be recomputed by the caller per round).

    RNG is mesh-invariant: every sample draws from its own stream
    `fold_in(key, sample_key_offset + i)`, so a dp-sharded run (each device
    sampling a slice with offset = device_index * local_count and the SAME
    base key) produces exactly the poses the unsharded run would
    (tests/test_sharded_infer.py asserts this equivalence).

    `noise_override` replaces every stochastic draw with caller-provided
    arrays — the lockstep-parity hook (VERDICT r3 item 4): the torch
    reference's reverse loop and this one consume identical noise and the
    trajectories are compared step by step. Keys:
      x_init_z [S, A, 3]      standard normal for the sigma_max init
      aug_R    [T, S, 3, 3]   per-step augmentation rotations
      aug_t    [T, S, 3]      per-step augmentation translations
      churn_z  [T, S, A, 3]   per-step churn noise
    `return_trajectory` returns x after every step, [T, S, A, 3].
    `sample_constraint` (optional, identity by default) is applied to every
    per-sample carry tensor — infer/sharded.py passes a dp sharding
    constraint on axis 0 so GSPMD partitions the reverse pass over chips.
    """
    sc = sample_constraint if sample_constraint is not None else (lambda v: v)
    x_exists = batch["a_mask"].astype(jnp.float32)
    num_atoms = batch["ref_pos"].shape[-2]

    if conditioning is None:
        a, ap, s, z = model.apply(params, batch, method="conditioning")
    else:
        a, ap, s, z = conditioning

    # per-block attention biases depend only on (ap, z): compute once and
    # reuse across all steps of the scan (vs per block x step recompute)
    bias_cache = model.apply(params, batch, ap, z, method="denoise_bias_cache")

    sigmas = jnp.asarray(
        karras_noise_schedule(steps, model.cfg.sigma_data, s_max, s_min, karras_rho)
    )

    is_ligand_atom = (
        jnp.take(batch["is_ligand"], batch["atom_id_to_token_id"], axis=-1)
        * x_exists
    ).astype(jnp.float32)

    # one independent key stream per sample (mesh-invariant; see docstring)
    sample_ids = sample_key_offset + jnp.arange(num_sample)
    skeys = jax.vmap(lambda i: jax.random.fold_in(key, i))(sample_ids)

    k_init = jax.vmap(lambda k: jax.random.fold_in(k, 0))(skeys)
    if noise_override is not None:
        x_next = sigmas[0] * noise_override["x_init_z"].astype(jnp.float32)
    else:
        x_next = sigmas[0] * jax.vmap(
            lambda k: jax.random.normal(k, (num_atoms, 3), jnp.float32)
        )(k_init)
    x_next = sc(x_next)
    skeys = sc(skeys)

    batch_ref_pos0 = sc(
        jnp.repeat(batch["ref_pos"][None].astype(jnp.float32), num_sample, axis=0)
    )

    has_conf = guidance is not None and align_ref_pos
    has_ff = guidance is not None and guidance.ff is not None
    thresh = gamma_min * mmff_gamma_0_factor

    def denoiser(x_hat, t_hat):
        return model.apply(
            params, batch, x_hat, t_hat, a, ap, s, z, bias_cache,
            method="denoise",
        )

    def step(carry, xs):
        x_next, batch_ref_pos, skeys = carry
        if noise_override is not None:
            (t_cur, t_next), aug_R, aug_t, churn_z = xs
        else:
            t_cur, t_next = xs
        skeys, k_augs, k_churns = jax.vmap(
            lambda k: tuple(jax.random.split(k, 3))
        )(skeys)

        if noise_override is not None:
            x_cur = apply_centre_augmentation(x_next, x_exists, aug_R, aug_t)
        else:
            x_cur = jax.vmap(
                lambda k, xs_: centre_random_augmentation(k, xs_, x_exists)
            )(k_augs, x_next)

        churn = t_cur > gamma_min
        t_hat_churn = t_cur * (gamma_0 + 1.0)
        if noise_override is not None:
            noise = churn_z.astype(x_cur.dtype)
        else:
            noise = jax.vmap(
                lambda k: jax.random.normal(k, x_cur.shape[1:], x_cur.dtype)
            )(k_churns)
        ksi = (
            noise_scale_lambda
            * noise
            * jnp.sqrt(jnp.maximum(t_hat_churn**2 - t_cur**2, 0.0))
        )
        t_hat = jnp.where(churn, t_hat_churn, t_cur) * jnp.ones((num_sample,))
        x_hat = jnp.where(churn, x_cur + ksi, x_cur)

        x_denoised = denoiser(x_hat, t_hat)

        th = t_hat[:, None, None]
        d_plain = (x_hat - x_denoised) / th
        d_cur = d_plain

        use_conf = jnp.logical_and(has_conf, t_cur > thresh) if has_conf else False
        use_ff = jnp.logical_and(has_ff, t_cur <= thresh) if has_ff else False

        if has_conf or has_ff:
            w = is_ligand_atom  # [A]
            if has_conf:
                lig = _gather_ligand(x_denoised, guidance)
                _, best_conf = select_best_conformers(lig, guidance)
                new_ref = _scatter_ligand(batch_ref_pos, best_conf, guidance)
                batch_ref_pos = jnp.where(use_conf, new_ref, batch_ref_pos)

            if has_ff:
                lig = _gather_ligand(x_denoised, guidance)
                lig_relaxed = relax_positions(lig, guidance.ff, iters=mmff_iters)
                x_ref_ff = _scatter_ligand(x_denoised, lig_relaxed, guidance)

            # pick the guidance target for this step
            if has_conf and has_ff:
                target = jnp.where(use_conf, batch_ref_pos, x_ref_ff)
                active = jnp.logical_or(use_conf, use_ff)
            elif has_conf:
                target, active = batch_ref_pos, use_conf
            else:
                target, active = x_ref_ff, use_ff

            ligand_denoised = weighted_rigid_align(
                x_denoised * x_exists[..., None], target, w
            )
            d_lig = (x_hat - ligand_denoised) / th * w[None, :, None]
            d_guided = d_plain * (1.0 - w[None, :, None]) + d_lig
            d_cur = jnp.where(active, d_guided, d_plain)

        dt = (t_next - t_hat)[:, None, None]
        eta = jnp.where(churn, step_scale_eta, ode_step_scale_eta)
        x_out = sc(x_hat + eta * dt * d_cur)
        ys = x_out if return_trajectory else None
        return (x_out, sc(batch_ref_pos), sc(skeys)), ys

    xs = (sigmas[:-1], sigmas[1:])
    if noise_override is not None:
        xs = (
            xs,
            noise_override["aug_R"].astype(jnp.float32),
            noise_override["aug_t"].astype(jnp.float32),
            noise_override["churn_z"],
        )
    from physdock_tpu.nn.transformers import _unroll_for_cost

    (x_final, _, _), traj = jax.lax.scan(
        step, (x_next, batch_ref_pos0, skeys), xs,
        unroll=steps if _unroll_for_cost() else 1,
    )
    return traj if return_trajectory else x_final
