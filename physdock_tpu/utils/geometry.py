"""Pure-JAX geometry and tensor primitives.

Functional equivalents of the reference's torch helpers
(reference: PhysDock/utils/tensor_utils.py) with explicit PRNG-key threading
(the reference used implicit global RNG).  Everything here is jit/vmap-safe,
static-shaped, and differentiable unless noted.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def masked_mean(mask, value, axis, eps: float = 1e-9):
    """Mean of `value` over `axis` weighted by broadcastable `mask`.

    (reference: tensor_utils.py:50-52)
    """
    mask = jnp.broadcast_to(mask, value.shape)
    return jnp.sum(mask * value, axis=axis) / (eps + jnp.sum(mask, axis=axis))


def one_hot_nearest(x, v_bins):
    """One-hot of the nearest bin (AF3 Algorithm 4; tensor_utils.py:78-82)."""
    diffs = x[..., None] - v_bins.reshape((1,) * x.ndim + (-1,))
    am = jnp.argmin(jnp.abs(diffs), axis=-1)
    return jax.nn.one_hot(am, v_bins.shape[-1], dtype=jnp.float32)


def dgram_from_positions(
    pos,
    min_bin: float = 3.25,
    max_bin: float = 50.75,
    no_bins: int = 39,
    inf: float = 1e8,
):
    """Binary distogram over squared-distance bins (tensor_utils.py:689-705).

    Returns [..., N, N, no_bins] with exactly one hot bin per pair (interior
    bins; the reference uses strict > lower and < upper, so boundary-exact
    values produce all-zero rows — reproduced here for parity).
    """
    d2 = jnp.sum(
        (pos[..., None, :] - pos[..., None, :, :]) ** 2, axis=-1, keepdims=True
    )
    lower = jnp.linspace(min_bin, max_bin, no_bins) ** 2
    upper = jnp.concatenate([lower[1:], jnp.array([inf])], axis=-1)
    return ((d2 > lower) & (d2 < upper)).astype(pos.dtype)


def gen_attn_mask(mask, neg_inf: float):
    """Additive attention mask: 0 where mask!=0, neg_inf elsewhere
    (tensor_utils.py:642-646)."""
    return jnp.where(mask == 0, jnp.asarray(neg_inf, mask.dtype), jnp.zeros((), mask.dtype))


def uniform_random_rotation(key, shape: Tuple[int, ...] = ()):
    """Uniform random rotation matrices of batch `shape` via Gram-Schmidt on
    two uniform sphere points (tensor_utils.py:566-575).

    Returns [..., 3, 3] with rows (e0, e1, e2).
    """
    k0, k1 = jax.random.split(key)

    def sphere(k):
        kp, kt = jax.random.split(k)
        phi = jax.random.uniform(kp, shape, dtype=jnp.float32) * 2 * jnp.pi
        theta = jnp.arccos(jax.random.uniform(kt, shape, dtype=jnp.float32) * 2 - 1)
        return jnp.stack(
            [jnp.cos(phi) * jnp.sin(theta), jnp.sin(phi) * jnp.sin(theta), jnp.cos(theta)],
            axis=-1,
        )

    e0 = sphere(k0)
    u1 = sphere(k1)
    e1 = u1 - e0 * jnp.sum(u1 * e0, axis=-1, keepdims=True)
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(e0, e1)
    return jnp.stack([e0, e1, e2], axis=-2)


def centre_random_augmentation(
    key,
    x,
    x_exists,
    s: float = 1.0,
):
    """Centre on the masked mean, apply a random rotation per leading batch
    element, and add N(0, s) translation (tensor_utils.py:577-589).

    x: [..., num_atoms, 3]; x_exists: [num_atoms] mask shared across batch.
    """
    kr, kt = jax.random.split(key)
    rot = uniform_random_rotation(kr, x.shape[:-2])
    t = s * jax.random.normal(kt, x.shape[:-2] + (3,), dtype=x.dtype)
    return apply_centre_augmentation(x, x_exists, rot, t)


def apply_centre_augmentation(x, x_exists, rot, t):
    """Deterministic body of `centre_random_augmentation` with explicit
    rotation/translation — the injection point for lockstep sampler parity
    against the torch reference (tests/test_reference_parity.py)."""
    w = x_exists.astype(x.dtype)
    mean = jnp.sum(x * w[..., :, None], axis=-2, keepdims=True) / jnp.sum(w)
    x_aug = jnp.einsum(
        "...ij,...kj->...ki", rot, x - mean,
        precision=jax.lax.Precision.HIGHEST,
    )
    return x_aug + t[..., None, :]


def weighted_rigid_align(x_pred, x_gt, weights):
    """Weighted Kabsch alignment (AF3 Algorithm 28; tensor_utils.py:724-778).

    Rotates the *ground truth* onto the prediction frame: returns x_gt placed
    in x_pred's pose (matching the reference's semantics where the output is
    used as an alignment target).  SVD runs in fp32 regardless of input dtype.

    x_pred: [..., S, A, 3], x_gt: [..., A, 3] or [..., S, A, 3],
    weights: [..., A].  Gradients do not flow (lax.stop_gradient), matching
    torch.no_grad usage at every reference call site.
    """
    in_dtype = x_pred.dtype
    x_pred = x_pred.astype(jnp.float32)
    x_gt = x_gt.astype(jnp.float32)
    weights = weights.astype(jnp.float32)
    if x_gt.ndim == x_pred.ndim - 1:
        x_gt = x_gt[..., None, :, :]

    w = weights[..., None, :, None]
    denom = jnp.sum(weights[..., None, :], axis=-1, keepdims=True)
    mu_pred = jnp.sum(x_pred * w, axis=-2) / denom
    mu_gt = jnp.sum(x_gt * w, axis=-2) / denom

    x_pred_hat = x_pred - mu_pred[..., None, :]
    x_gt_hat = x_gt - mu_gt[..., None, :]

    outer = jnp.einsum(
        "...ij,...ik->...ijk", x_gt_hat, x_pred_hat, precision=jax.lax.Precision.HIGHEST
    )
    H = jnp.sum(outer * weights[..., None, :, None, None], axis=-3)
    U, _, Vh = jnp.linalg.svd(H, full_matrices=False)

    flip = jnp.diag(jnp.array([1.0, 1.0, -1.0], jnp.float32))
    R = U @ Vh
    R_reflect = U @ flip @ Vh
    reflected = jnp.linalg.det(R) < 0
    R = jnp.where(reflected[..., None, None], R_reflect, R)
    R = jnp.swapaxes(R, -1, -2)

    aligned = jnp.einsum(
        "...ij,...kj->...ki", R, x_gt_hat, precision=jax.lax.Precision.HIGHEST
    ) + mu_pred[..., None, :]
    return jax.lax.stop_gradient(aligned).astype(in_dtype)


def rmsd(x, y, mask=None, eps: float = 1e-9):
    """Root-mean-square deviation over the atom axis. x, y: [..., A, 3]."""
    d2 = jnp.sum((x - y) ** 2, axis=-1)
    if mask is None:
        return jnp.sqrt(jnp.mean(d2, axis=-1) + eps)
    m = jnp.broadcast_to(mask, d2.shape)
    return jnp.sqrt(jnp.sum(m * d2, axis=-1) / (eps + jnp.sum(m, axis=-1)) + eps)


def kabsch_rmsd(x, y, weights):
    """RMSD after weighted rigid alignment of y onto x. x: [..., S, A, 3]."""
    y_aligned = weighted_rigid_align(x, y, weights)
    return rmsd(x, y_aligned, weights)


def smooth_lddt_epsilon(delta):
    """The 4-sigmoid soft-lDDT penalty used across losses & physics guidance
    (reference: model.py:243-246, loss.py:176-180)."""
    return 0.25 * (
        jax.nn.sigmoid(delta - 0.5)
        + jax.nn.sigmoid(delta - 1.0)
        + jax.nn.sigmoid(delta - 2.0)
        + jax.nn.sigmoid(delta - 4.0)
    )


def pairwise_distances(x, eps: float = 0.0):
    """[..., N, 3] -> [..., N, N] Euclidean distances."""
    d2 = jnp.sum((x[..., :, None, :] - x[..., None, :, :]) ** 2, axis=-1)
    if eps:
        return jnp.sqrt(d2 + eps)
    return jnp.sqrt(d2)


def signed_volume(p0, p1, p2, p3):
    """Signed volume of the tetrahedron spanned by four points.

    Pure-JAX chirality test: the sign around a chiral centre with neighbours
    ordered by CIP rank replaces the reference's RDKit PDB-roundtrip check
    (reference: redocking.py:303-311).
    """
    return jnp.einsum(
        "...i,...i->...", jnp.cross(p1 - p0, p2 - p0), p3 - p0
    )


# -------------------- NumPy twins (host-side featurization) -----------------


def uniform_random_rotation_np(rng: np.random.Generator, shape=()):
    """NumPy twin of uniform_random_rotation for host featurization
    (tensor_utils.py:493-503)."""

    def sphere():
        phi = rng.random(shape) * 2 * np.pi
        theta = np.arccos(rng.random(shape) * 2 - 1)
        return np.stack(
            [np.cos(phi) * np.sin(theta), np.sin(phi) * np.sin(theta), np.cos(theta)],
            axis=-1,
        )

    e0 = sphere()
    u1 = sphere()
    e1 = u1 - e0 * np.sum(u1 * e0, axis=-1, keepdims=True)
    e1 = e1 / np.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = np.cross(e0, e1)
    return np.stack([e0, e1, e2], axis=-2)


def random_rigid_transform_np(rng: np.random.Generator, pos: np.ndarray):
    """Random rotation + unit-normal translation applied to [N, 3] points
    (used for per-conformer ref_pos augmentation; feature_loader.py:741-743)."""
    rot = uniform_random_rotation_np(rng)
    t = rng.normal(size=(3,))
    return pos @ rot.T + t


def greedy_matching_decoy(
    x_pred, x_gt_decoys, decoy_exists, token_id_to_centre_atom_id, z_mask
):
    """Pick the GT decoy whose token-centre distance matrix best matches the
    prediction (multi-conformation GT selection; tensor_utils.py:649-671).

    x_pred: [S, A, 3] (sample 0 used); x_gt_decoys: [D, A, 3];
    decoy_exists: [D]; returns the index of the best decoy.
    """
    xp = jnp.take(x_pred[0:1], token_id_to_centre_atom_id, axis=-2)
    dp = jnp.linalg.norm(xp[:, None] - xp[:, :, None] + 1e-12, axis=-1)
    xg = jnp.take(x_gt_decoys, token_id_to_centre_atom_id, axis=-2)
    dg = jnp.linalg.norm(xg[:, None] - xg[:, :, None] + 1e-12, axis=-1)
    err = masked_mean(z_mask[None], (dg - dp) ** 2, axis=(-1, -2))
    err = jnp.where(decoy_exists > 0, err, jnp.max(err))
    return jnp.argmin(err)
