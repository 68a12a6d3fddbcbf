"""The PhysDock model: conditioning trunk + AF3DiT denoiser + distogram head.

Re-implementation of reference PhysDock/models/model.py:56-115 as a flax
module with three entry points:

  * `__call__(batch, key)`   — training forward: run conditioning once,
    EDM-noise `num_augmentation_sample` augmented copies of x_gt, denoise
    all, return {x_denoised, x_hat, t_hat, p_distogram} (model.py:99-115).
  * `conditioning(batch)`    — (a, ap, s, z), run once per system.
  * `denoise(batch, x_hat, t_hat, a, ap, s, z)` — one denoiser call; the
    EDM reverse loop in model/diffusion.py scans this.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from physdock_tpu.config import ModelConfig
from physdock_tpu.model.compact import expand_batch
from physdock_tpu.nn.conditioning import DiffusionConditioning
from physdock_tpu.nn.confidence import ConfidenceModule
from physdock_tpu.nn.primitives import Linear
from physdock_tpu.nn.transformers import AF3DiT
from physdock_tpu.utils.geometry import centre_random_augmentation

Batch = Dict[str, jnp.ndarray]


def prepare_batch(batch: Batch) -> Batch:
    """Expand compact int8 transport features + derive pair masks (both
    no-ops when the batch already carries the fat f32 forms)."""
    return _ensure_pair_masks(expand_batch(batch))


def _ensure_pair_masks(batch: Batch) -> Batch:
    """Derive z_mask/ap_mask on device when absent.

    The pair masks are outer products of the 1-D masks; shipping them from
    the host costs ~16 MB per system at atom crop 2048 (a real tax over the
    remote-device link) for data XLA can rebuild in-register."""
    if "z_mask" in batch and "ap_mask" in batch:
        return batch
    batch = dict(batch)
    if "z_mask" not in batch:
        s = batch["s_mask"].astype(jnp.float32)
        batch["z_mask"] = s[..., :, None] * s[..., None, :]
    if "ap_mask" not in batch:
        a = batch["a_mask"].astype(jnp.float32)
        batch["ap_mask"] = a[..., :, None] * a[..., None, :]
    return batch


class PhysDock(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    with_confidence: bool = False

    def setup(self):
        c = self.cfg
        self.diffusion_conditioning = DiffusionConditioning(
            ref_dim=c.ref_dim,
            target_dim=c.target_dim,
            msa_dim=c.msa_dim,
            c_a=c.c_a,
            c_ap=c.c_ap,
            c_s=c.c_s,
            c_m=c.c_m,
            c_z=c.c_z,
            no_blocks_atom=c.no_blocks_atom,
            no_blocks_evoformer=c.no_blocks_evoformer,
            no_blocks_pairformer=c.no_blocks_pairformer,
            no_blocks_template=c.no_blocks_template,
            num_recycles=c.num_recycles,
            inf=c.inf,
            eps=c.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        self.dit = AF3DiT(
            c_a=c.c_a,
            c_ap=c.c_ap,
            c_s=c.c_s,
            c_z=c.c_z,
            no_blocks_atom=c.no_blocks_atom,
            no_blocks_dit=c.no_blocks_dit,
            sigma_data=c.sigma_data,
            inf=c.inf,
            eps=c.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        self.linear_distogram = Linear(
            c.no_distogram_bins, init="final", dtype=self.dtype
        )
        if self.with_confidence:
            # optional PAE/PDE/pLDDT head (commented out of the released
            # module tree — reference model.py:15,68 — but wired in the
            # training config; enables fused VS ranking when trained)
            self.confidence_module = ConfidenceModule(
                c_a=c.c_a,
                c_ap=c.c_ap,
                c_z=c.c_z,
                no_blocks_heads=c.no_blocks_heads,
                no_blocks_atom=c.no_blocks_atom,
                inf=c.inf,
                eps=c.eps,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
            )

    def conditioning(self, batch: Batch):
        return self.diffusion_conditioning(prepare_batch(batch))

    def denoise(self, batch: Batch, x_hat, t_hat, a, ap, s, z, bias_cache=None):
        batch = prepare_batch(batch)
        return self.dit(
            x_hat,
            t_hat,
            a,
            ap,
            s,
            z,
            batch["ap_mask"],
            batch["z_mask"],
            batch["token_id_to_chunk_sizes"],
            batch["atom_id_to_token_id"],
            bias_cache=bias_cache,
        )

    def denoise_bias_cache(self, batch: Batch, ap, z):
        """Per-block DiT attention biases, computed once per round and
        reused across every diffusion step (HBM-traffic optimization; the
        reference recomputes per block x step)."""
        batch = prepare_batch(batch)
        return self.dit.compute_bias_cache(
            ap, z, batch["ap_mask"], batch["z_mask"]
        )

    def init_all(self, batch: Batch, key):
        """Initialization entry creating ALL params (incl. the optional
        confidence head, which the training forward alone doesn't touch)."""
        batch = prepare_batch(batch)
        out = self(batch, key)
        if self.with_confidence:
            a, ap, s, z = self.diffusion_conditioning(batch)
            out["p_pae"], out["p_pde"], out["p_plddt"] = self.confidence_module(
                batch, s, z, out["x_denoised"][:1]
            )
        return out

    def confidence(self, batch: Batch, s, z, x_pred):
        """PAE/PDE/pLDDT logits from conditioning + predicted coords
        (requires with_confidence=True)."""
        return self.confidence_module(prepare_batch(batch), s, z, x_pred)

    def distogram(self, z):
        p = self.linear_distogram(z).astype(jnp.float32)
        return p + jnp.swapaxes(p, -2, -3)

    def augmentation_diffuse(self, batch: Batch, key) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """EDM training noising: sigma ~ exp(N(-1.2, 1.5^2)) * sigma_data over
        `num_augmentation_sample` SE(3)-augmented copies of x_gt
        (model.py:87-97)."""
        n = self.cfg.num_augmentation_sample
        x_gt = batch["x_gt"]
        k_t, k_n, k_aug = jax.random.split(key, 3)
        t_hat = (
            jnp.exp(jax.random.normal(k_t, (n,), dtype=jnp.float32) * 1.5 - 1.2)
            * self.cfg.sigma_data
        )
        x = jnp.repeat(x_gt[None], n, axis=0)
        x = x + jax.random.normal(k_n, x.shape, x.dtype) * t_hat[:, None, None]
        x_hat = centre_random_augmentation(k_aug, x, batch["x_exists"])
        return jax.lax.stop_gradient(x_hat), jax.lax.stop_gradient(t_hat)

    def __call__(
        self, batch: Batch, key, return_conditioning: bool = False
    ) -> Dict[str, jnp.ndarray]:
        batch = prepare_batch(batch)
        a, ap, s, z = self.diffusion_conditioning(batch)
        x_hat, t_hat = self.augmentation_diffuse(batch, key)
        x_denoised = self.denoise(batch, x_hat, t_hat, a, ap, s, z)
        out = {
            "x_denoised": x_denoised,
            "x_hat": x_hat,
            "t_hat": t_hat,
            "p_distogram": self.distogram(z),
        }
        if return_conditioning:
            # reused by the mini-rollout confidence path (train/step.py)
            # so the trunk runs once per train step
            out["conditioning"] = (a, ap, s, z)
        return out
