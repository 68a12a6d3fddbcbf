"""Training losses.

Re-implementation of reference PhysDock/models/loss.py (release losses) plus
the frame-express FAPE and confidence losses from the training-era modules
(loss_module3.py:214-271, loss.py:309-520).  All pure functions over a
feature dict; the aggregate matches PhysDockLoss (loss.py:576-624) including
NaN/Inf zeroing (done branchlessly with jnp.where so it stays jittable).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from physdock_tpu.config import LossConfig
from physdock_tpu.utils.geometry import (
    masked_mean,
    smooth_lddt_epsilon,
    weighted_rigid_align,
)

Batch = Dict[str, jnp.ndarray]


def softmax_cross_entropy(logits, labels):
    return -jnp.sum(labels * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def weighted_mse_loss(
    x_denoised,
    x_gt,
    t_hat,
    *,
    sigma_data: float,
    is_dna,
    is_rna,
    is_ligand,
    alpha_dna: float,
    alpha_rna: float,
    alpha_ligand: float,
    atom_id_to_token_id,
    x_exists,
):
    """Rigid-aligned EDM-weighted MSE (loss.py:120-163); clamped at 1e4."""
    weights = (
        jnp.take(
            1.0 + is_dna * alpha_dna + is_rna * alpha_rna + is_ligand * alpha_ligand,
            atom_id_to_token_id,
            axis=-1,
        )
        * x_exists
    )
    x_gt_aligned = weighted_rigid_align(x_denoised * x_exists[..., None], x_gt, weights)
    sq = jnp.sum((x_denoised - x_gt_aligned) ** 2, axis=-1)
    lam = (t_hat**2 + sigma_data**2) / (t_hat * sigma_data) ** 2 / 3.0
    loss = lam * masked_mean(weights[..., None, :], sq, axis=(-1, -2))
    return jnp.minimum(jnp.mean(loss), 1e4)


def smooth_lddt_loss(x_denoised, x_gt, x_exists, *, max_clamp_distance: float = 15.0):
    """4-sigmoid soft lDDT on pair distances below the clamp (loss.py:166-186)."""
    d_pred = jnp.linalg.norm(
        x_denoised[..., None, :] - x_denoised[..., None, :, :] + 1e-12, axis=-1
    )
    d_gt = jnp.linalg.norm(x_gt[..., None, :] - x_gt[..., None, :, :] + 1e-12, axis=-1)
    mask = (
        (d_gt < max_clamp_distance)
        * x_exists[..., None]
        * x_exists[..., None, :]
    )[..., None, :, :]
    eps = smooth_lddt_epsilon(jnp.abs(d_pred - d_gt[..., None, :, :]))
    return jnp.mean(masked_mean(mask, eps, axis=(-1, -2)))


def bond_loss(
    x_denoised,
    x_gt,
    token_bonds,
    t_hat,
    *,
    sigma_data: float,
    token_id_to_centre_atom_id,
    eps: float = 1e-9,
):
    """Token-bond centre-atom length MSE with EDM weighting (loss.py:245-305)."""
    xc_pred = jnp.take(x_denoised, token_id_to_centre_atom_id, axis=-2)
    xc_gt = jnp.take(x_gt, token_id_to_centre_atom_id, axis=-2)
    d_pred = jnp.linalg.norm(xc_pred[..., None, :, :] - xc_pred[..., :, None, :] + 1e-12, axis=-1)
    d_gt = jnp.linalg.norm(xc_gt[..., None, :, :] - xc_gt[..., :, None, :] + 1e-12, axis=-1)
    diff = d_pred - d_gt[None]
    lam = (t_hat**2 + sigma_data**2) / (t_hat * sigma_data) ** 2
    per = jnp.sum(token_bonds[None] * diff**2, axis=(-1, -2)) / (
        jnp.sum(token_bonds, axis=(-1, -2)) + eps
    )
    return jnp.mean(lam * jnp.mean(per))


def key_res_loss(
    x_denoised,
    x_gt,
    t_hat,
    *,
    is_ligand,
    is_key_res,
    sigma_data: float,
    token_id_to_centre_atom_id,
    eps: float = 1e-9,
):
    """Soft-lDDT^2 on key-residue <-> ligand centre-atom distances
    (loss.py:523-556)."""
    xc_pred = jnp.take(x_denoised, token_id_to_centre_atom_id, axis=-2)
    xc_gt = jnp.take(x_gt, token_id_to_centre_atom_id, axis=-2)
    d_pred = jnp.linalg.norm(xc_pred[..., None, :, :] - xc_pred[..., :, None, :] + 1e-12, axis=-1)
    d_gt = jnp.linalg.norm(xc_gt[..., None, :, :] - xc_gt[..., :, None, :] + 1e-12, axis=-1)
    diff = smooth_lddt_epsilon(jnp.abs(d_pred - d_gt[None]))
    mask = (is_key_res[:, None] * is_ligand[None])[None]
    w2 = (t_hat**2 + sigma_data**2) / (t_hat * sigma_data) ** 2
    loss = jnp.mean(
        jnp.sum(mask[None] * diff**2, axis=(-1, -2)) / (jnp.sum(mask, axis=(-1, -2)) + eps)
    )
    return jnp.mean(loss * jnp.mean(w2))


def distogram_loss(
    p_distogram,
    x_gt,
    x_exists,
    token_id_to_pseudo_beta_atom_id,
    *,
    min_bin: float = 3.25,
    max_bin: float = 50.75,
    no_bins: int = 39,
):
    """Pseudo-beta distogram cross entropy over 39 squared-distance bins
    (loss.py:80-117)."""
    xb = jnp.take(x_gt, token_id_to_pseudo_beta_atom_id, axis=-2)
    e = jnp.take(x_exists, token_id_to_pseudo_beta_atom_id, axis=-1)
    mask = e[..., None] * e[..., None, :]
    boundaries = jnp.linspace(min_bin, max_bin, no_bins - 1) ** 2
    d2 = jnp.sum((xb[..., None, :] - xb[..., None, :, :]) ** 2, axis=-1, keepdims=True)
    true_bins = jnp.sum(d2 > boundaries, axis=-1)
    errors = softmax_cross_entropy(
        p_distogram * mask[..., None],
        jax.nn.one_hot(true_bins, no_bins) * mask[..., None],
    )
    return masked_mean(mask, errors, axis=(-1, -2))


def express_coordinates_in_frame(x, frames):
    """Express x in local frames built from 3-atom triplets
    (loss_module3.py:214-237 / loss.py:189-215).  Returns (coords, valid)."""
    a, b, c = frames[..., 0, :], frames[..., 1, :], frames[..., 2, :]
    w1 = (a - b) / jnp.linalg.norm(a - b + 1e-6, axis=-1, keepdims=True)
    w2 = (c - b) / jnp.linalg.norm(c - b + 1e-6, axis=-1, keepdims=True)
    cos_theta = jnp.sum(w1 * w2, axis=-1)
    valid = cos_theta < 0.906308  # cos(25 deg)
    e1 = (w1 + w2) / jnp.linalg.norm(w1 + w2 + 1e-6, axis=-1, keepdims=True)
    e2 = (w2 - w1) / jnp.linalg.norm(w2 - w1 + 1e-6, axis=-1, keepdims=True)
    e3 = jnp.cross(e1, e2)
    rot = jnp.swapaxes(jnp.stack([e1, e2, e3], axis=-1), -1, -2)
    d = x[..., None, :, :] - b[..., None, :]
    return jnp.einsum("...fij,...faj->...fai", rot, d), valid


def fape_loss(
    x_denoised,
    x_gt,
    x_exists,
    *,
    token_id_to_centre_atom_id,
    token_id_to_frame_atom_id_0,
    token_id_to_frame_atom_id_1,
    token_id_to_frame_atom_id_2,
):
    """Frame-aligned point error (training-era; loss_module3.py:240-271)."""
    frame_ids = jnp.stack(
        [token_id_to_frame_atom_id_0, token_id_to_frame_atom_id_1, token_id_to_frame_atom_id_2],
        axis=-1,
    )
    tok_exists = jnp.take(x_exists, token_id_to_centre_atom_id, axis=-1)
    frames_gt = x_gt[frame_ids]
    x_gt_exp, gt_valid = express_coordinates_in_frame(x_gt, frames_gt)
    frames_pred = x_denoised[:, frame_ids]
    x_pred_exp, pred_valid = express_coordinates_in_frame(x_denoised, frames_pred)
    dist = jnp.linalg.norm(
        jnp.take(x_gt, token_id_to_centre_atom_id, axis=-2)[:, None] - x_gt[None] + 1e-12,
        axis=-1,
    )
    clamp = (dist < 1.0).astype(jnp.float32)
    err = jnp.mean((x_pred_exp - x_gt_exp[None]) ** 2, axis=-1)
    mask = (
        x_exists[None] * tok_exists[:, None] * clamp * gt_valid[..., None]
    )[None] * pred_valid[..., None]
    return masked_mean(mask, err, axis=(-1, -2, -3))


def cal_lddt(x_pred, x_gt, is_dna, is_rna, is_polymer, token_id_to_centre_atom_id):
    """Per-atom lDDT vs polymer token centres (loss.py:323-380)."""
    xc_pred = jnp.take(x_pred, token_id_to_centre_atom_id, axis=-2)
    xc_gt = jnp.take(x_gt, token_id_to_centre_atom_id, axis=-2)
    is_nuc = (is_dna + is_rna)[..., None, :]
    d_pred = jnp.linalg.norm(x_pred[..., :, None, :] - xc_pred[..., None, :, :] + 1e-12, axis=-1)
    d_gt = jnp.linalg.norm(x_gt[..., :, None, :] - xc_gt[..., None, :, :] + 1e-12, axis=-1)
    d_lm = jnp.abs(d_pred - d_gt)
    score = 0.25 * (
        (d_lm < 0.5).astype(jnp.float32)
        + (d_lm < 1.0).astype(jnp.float32)
        + (d_lm < 2.0).astype(jnp.float32)
        + (d_lm < 4.0).astype(jnp.float32)
    )
    mask_r = (d_gt < 30) * is_nuc + (d_gt < 15) * (1 - is_nuc)
    mask_r = mask_r * is_polymer[..., None, :]
    return jnp.sum(mask_r * score, axis=-1) / (jnp.sum(mask_r, axis=-1) + 1e-9)


def plddt_loss(
    p_plddt,
    x_pred,
    x_gt,
    x_exists,
    *,
    no_bins: int,
    is_dna,
    is_rna,
    is_ligand,
    token_id_to_centre_atom_id,
):
    """Binned pLDDT cross entropy (loss.py:383-438)."""
    is_polymer = 1.0 - is_ligand
    lddt = jax.lax.stop_gradient(
        cal_lddt(x_pred, x_gt, is_dna, is_rna, is_polymer, token_id_to_centre_atom_id)[0]
    )
    bins = jnp.clip((lddt * no_bins).astype(jnp.int32), 0, no_bins - 1)
    labels = jax.nn.one_hot(bins, no_bins)
    l = softmax_cross_entropy(p_plddt * x_exists[..., None], labels * x_exists[..., None])
    return masked_mean(x_exists, l, axis=-1)


def pde_loss(
    p_pde,
    x_pred,
    x_gt,
    x_exists,
    *,
    token_id_to_centre_atom_id,
    min_bin: float = 0.0,
    max_bin: float = 32.0,
    no_bins: int = 64,
):
    """Predicted-distance-error cross entropy (loss.py:487-520)."""
    xc_pred = jnp.take(x_pred, token_id_to_centre_atom_id, axis=-2)
    xc_gt = jnp.take(x_gt, token_id_to_centre_atom_id, axis=-2)
    d_pred = jnp.linalg.norm(xc_pred[..., :, None, :] - xc_pred[..., None, :, :] + 1e-12, axis=-1)
    d_gt = jnp.linalg.norm(xc_gt[..., :, None, :] - xc_gt[..., None, :, :] + 1e-12, axis=-1)
    d_diff = jnp.abs(d_pred - d_gt)[0]
    bins = jnp.clip(
        ((d_diff - min_bin) / (max_bin - min_bin) * no_bins).astype(jnp.int32),
        0,
        no_bins - 1,
    )
    labels = jax.nn.one_hot(bins, no_bins)
    e = jnp.take(x_exists, token_id_to_centre_atom_id, axis=-1)
    mask = e[..., None] * e[..., None, :]
    errors = softmax_cross_entropy(p_pde * mask[..., None], labels * mask[..., None])
    return masked_mean(mask, errors, axis=(-1, -2))


def pae_loss(
    p_pae,
    x_pred,
    x_gt,
    x_exists,
    *,
    token_id_to_centre_atom_id,
    token_id_to_frame_atom_id_0,
    token_id_to_frame_atom_id_1,
    token_id_to_frame_atom_id_2,
    min_bin: float = 0.0,
    max_bin: float = 32.0,
    no_bins: int = 64,
):
    """Predicted-aligned-error cross entropy (loss.py:423-470).

    Token centres expressed in every token's 3-atom local frame; the binned
    frame-aligned error of the FIRST rollout sample is the target.  As in
    the reference, invalid frames (near-collinear triplets) zero the error
    rather than masking the loss term.
    """
    frame_ids = jnp.stack(
        [
            token_id_to_frame_atom_id_0,
            token_id_to_frame_atom_id_1,
            token_id_to_frame_atom_id_2,
        ],
        axis=-1,
    )  # [T, 3]
    tok_exists = jnp.take(x_exists, token_id_to_centre_atom_id, axis=-1)
    xc_gt = jnp.take(x_gt, token_id_to_centre_atom_id, axis=-2)
    gt_exp, gt_valid = express_coordinates_in_frame(xc_gt, x_gt[frame_ids])
    x0 = x_pred[0]
    xc_pred = jnp.take(x0, token_id_to_centre_atom_id, axis=-2)
    pred_exp, pred_valid = express_coordinates_in_frame(xc_pred, x0[frame_ids])
    error = jnp.linalg.norm(pred_exp - gt_exp + 1e-12, axis=-1)  # [T, T]
    error = error * gt_valid[..., None] * pred_valid[..., None]
    error = jax.lax.stop_gradient(error)
    bins = jnp.clip(
        ((error - min_bin) / (max_bin - min_bin) * no_bins).astype(jnp.int32),
        0,
        no_bins - 1,
    )
    labels = jax.nn.one_hot(bins, no_bins)
    mask = tok_exists[..., None] * tok_exists[..., None, :]
    l = softmax_cross_entropy(p_pae * mask[..., None], labels * mask[..., None])
    return masked_mean(mask, l, axis=(-1, -2))


def _nan_to_zero(x):
    """Branchless equivalent of the reference's NaN/Inf loss zeroing
    (loss.py:616-620)."""
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))


def physdock_loss(
    outputs: Batch, feats: Batch, cfg: LossConfig, sigma_data: float = 16.0
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Aggregate release loss (PhysDockLoss; loss.py:576-624)."""
    terms = {
        "weighted_mse_loss": (
            cfg.alpha_diffusion,
            weighted_mse_loss(
                outputs["x_denoised"],
                feats["x_gt"],
                outputs["t_hat"],
                sigma_data=sigma_data,
                is_dna=feats["is_dna"],
                is_rna=feats["is_rna"],
                is_ligand=feats["is_ligand"],
                alpha_dna=cfg.alpha_dna,
                alpha_rna=cfg.alpha_rna,
                alpha_ligand=cfg.alpha_ligand,
                atom_id_to_token_id=feats["atom_id_to_token_id"],
                x_exists=feats["x_exists"],
            ),
        ),
        "smooth_lddt_loss": (
            cfg.alpha_diffusion,
            smooth_lddt_loss(
                outputs["x_denoised"],
                feats["x_gt"],
                feats["x_exists"],
                max_clamp_distance=cfg.max_clamp_distance,
            ),
        ),
        "bond_loss": (
            cfg.alpha_diffusion * cfg.alpha_bond,
            bond_loss(
                outputs["x_denoised"],
                feats["x_gt"],
                feats["token_bonds"],
                outputs["t_hat"],
                sigma_data=sigma_data,
                token_id_to_centre_atom_id=feats["token_id_to_centre_atom_id"],
            ),
        ),
        "key_res_loss": (
            cfg.alpha_diffusion * cfg.alpha_bond,
            key_res_loss(
                outputs["x_denoised"],
                feats["x_gt"],
                outputs["t_hat"],
                is_ligand=feats["is_ligand"],
                is_key_res=feats["is_key_res"],
                sigma_data=sigma_data,
                token_id_to_centre_atom_id=feats["token_id_to_centre_atom_id"],
            ),
        ),
        "distogram_loss": (
            cfg.alpha_distogram,
            distogram_loss(
                outputs["p_distogram"],
                feats["x_gt"],
                feats["x_exists"],
                feats["token_id_to_pseudo_beta_atom_id"],
                min_bin=cfg.distogram_min_bin,
                max_bin=cfg.distogram_max_bin,
                no_bins=cfg.distogram_no_bins,
            ),
        ),
    }
    cum = 0.0
    logs = {}
    for name, (weight, value) in terms.items():
        value = _nan_to_zero(value)
        cum = cum + weight * value
        logs[name] = value
    logs["loss"] = cum
    return cum, logs


def clamp_distance_loss(
    x_denoised, x_gt, x_exists, *, max_clamp_distance: float = 16.0
):
    """Mean |pair-distance error| below the GT clamp (training-era variant;
    loss_module.py:160-184)."""
    d_pred = jnp.linalg.norm(
        x_denoised[..., None, :] - x_denoised[..., None, :, :] + 1e-12, axis=-1
    )
    d_gt = jnp.linalg.norm(x_gt[..., None, :] - x_gt[..., None, :, :] + 1e-12, axis=-1)
    mask = (
        (d_gt < max_clamp_distance) * x_exists[..., None] * x_exists[..., None, :]
    )[..., None, :, :]
    err = jnp.abs(d_pred - d_gt[..., None, :, :])
    return jnp.mean(masked_mean(mask, err, axis=(-1, -2)))


def rffold_loss(
    outputs: Batch,
    feats: Batch,
    cfg: LossConfig,
    sigma_data: float = 16.0,
    use_mini_rollout: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Training-era aggregate (RFFoldLoss; loss_module3.py:573-628):
    the release set plus optional mini-rollout confidence losses when the
    model emits p_plddt/p_pae/p_pde and x_pred."""
    cum, logs = physdock_loss(outputs, feats, cfg, sigma_data)
    if use_mini_rollout and "p_plddt" in outputs:
        extra = {
            "plddt_loss": (
                cfg.alpha_confidence,
                plddt_loss(
                    outputs["p_plddt"],
                    outputs["x_pred"],
                    feats["x_gt"],
                    feats["x_exists"],
                    no_bins=cfg.plddt_no_bins,
                    is_dna=feats["is_dna"],
                    is_rna=feats["is_rna"],
                    is_ligand=feats["is_ligand"],
                    token_id_to_centre_atom_id=feats["token_id_to_centre_atom_id"],
                ),
            ),
            "pae_loss": (
                cfg.alpha_confidence * cfg.alpha_pae,
                pae_loss(
                    outputs["p_pae"],
                    outputs["x_pred"],
                    feats["x_gt"],
                    feats["x_exists"],
                    token_id_to_centre_atom_id=feats["token_id_to_centre_atom_id"],
                    token_id_to_frame_atom_id_0=feats["token_id_to_frame_atom_id_0"],
                    token_id_to_frame_atom_id_1=feats["token_id_to_frame_atom_id_1"],
                    token_id_to_frame_atom_id_2=feats["token_id_to_frame_atom_id_2"],
                    min_bin=cfg.pae_min_bin,
                    max_bin=cfg.pae_max_bin,
                    no_bins=cfg.pae_no_bins,
                ),
            ),
            "pde_loss": (
                cfg.alpha_confidence,
                pde_loss(
                    outputs["p_pde"],
                    outputs["x_pred"],
                    feats["x_gt"],
                    feats["x_exists"],
                    token_id_to_centre_atom_id=feats["token_id_to_centre_atom_id"],
                    min_bin=cfg.pde_min_bin,
                    max_bin=cfg.pde_max_bin,
                    no_bins=cfg.pde_no_bins,
                ),
            ),
        }
        for name, (w, v) in extra.items():
            v = _nan_to_zero(v)
            cum = cum + w * v
            logs[name] = v
        logs["loss"] = cum
    return cum, logs
