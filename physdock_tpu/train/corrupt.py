"""Pose corruption for confidence-head training.

A memorized denoiser's mini-rollouts are all near-GT, so the pLDDT/PAE/
PDE labels they generate are constant (bin 0 / top bin) and the head
collapses to a constant distribution (measured in round 3: pLDDT pinned
at 97.0, ipTM identical to 7 decimals across systems — CONFIDENCE_GATE
r3).  Corrupted poses span the label bins: a random error magnitude per
draw drives a rigid ligand displacement + rotation, per-atom ligand
jitter and a smaller receptor jitter, so the head sees lDDT/error labels
across their whole range and must READ the pose to predict them.

The reference never shipped this (its confidence head is dormant,
confidence_module.py:1); this is the training signal that turns the head
into a ranker (VERDICT r3 item 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from physdock_tpu.utils.geometry import uniform_random_rotation


def corrupt_pose(
    key,
    x_gt,  # [A, 3]
    x_exists,  # [A]
    is_ligand_atom,  # [A] float
    min_mag: float = 0.1,
    max_mag: float = 24.0,
):
    """Return a corrupted pose [1, A, 3] whose ligand error magnitude is
    log-uniform in [min_mag, max_mag] Angstrom (receptor gets ~5% of it).
    """
    k_m, k_dir, k_rot, k_jl, k_jr = jax.random.split(key, 5)
    u = jax.random.uniform(k_m)
    m = min_mag * (max_mag / min_mag) ** u  # log-uniform magnitude

    w_lig = (is_ligand_atom * x_exists)[:, None]
    w_rec = ((1.0 - is_ligand_atom) * x_exists)[:, None]

    # rigid ligand move: rotation about the ligand centroid + translation
    lig_centre = jnp.sum(x_gt * w_lig, axis=0) / (jnp.sum(w_lig) + 1e-6)
    angle_scale = jnp.minimum(m / 8.0, 1.0)  # full random rotation by ~8 A
    rot = uniform_random_rotation(k_rot, ())
    eye = jnp.eye(3, dtype=rot.dtype)
    rot = eye + angle_scale * (rot - eye)  # blend toward identity when small
    # re-orthonormalize the blended matrix (QR keeps it a rotation)
    q, r = jnp.linalg.qr(rot)
    rot = q * jnp.sign(jnp.diagonal(r))[None, :]
    direction = jax.random.normal(k_dir, (3,))
    direction = direction / (jnp.linalg.norm(direction) + 1e-9)

    x_lig = (x_gt - lig_centre) @ rot.T + lig_centre + m * direction
    x_lig = x_lig + 0.2 * m * jax.random.normal(k_jl, x_gt.shape)
    x_rec = x_gt + jnp.minimum(0.05 * m, 0.5) * jax.random.normal(
        k_jr, x_gt.shape
    )
    x = x_lig * w_lig + x_rec * w_rec + x_gt * (1.0 - w_lig - w_rec)
    return jax.lax.stop_gradient(x[None].astype(jnp.float32))
