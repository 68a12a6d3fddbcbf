"""Diffusion conditioning trunk: atom/token/template/relpos embedders.

Re-implementation of reference PhysDock/models/layers/diffusion_conditioning.py.
Produces the four conditioning tensors (a, ap, s, z) consumed by the AF3DiT
denoiser; runs once per system (not per diffusion step).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from physdock_tpu.nn.primitives import FeedForward, Linear, RMSNorm
from physdock_tpu.nn.transformers import (
    AtomTransformer,
    Evoformer,
    Pairformer,
    Triangleformer,
    segment_mean_pool,
)
from physdock_tpu.utils.geometry import one_hot_nearest

Dtype = Any
Batch = Dict[str, jnp.ndarray]


class TemplatePairEmbedder(nn.Module):
    """GT-distogram template injection (diffusion_conditioning.py:12-50).

    templ_feat is a 40-channel (39-bin distogram + pseudo-beta mask)
    protein-protein pair feature; the whole update is gated by the scalar
    t_mask and an intra-chain mask.
    """

    c_z: int
    no_blocks: int = 2
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, z, templ_feat, asym_id, t_mask, z_mask):
        chain_same = (asym_id[None, :] == asym_id[:, None]).astype(templ_feat.dtype)
        tz_mask = z_mask * templ_feat[..., 39] * chain_same

        # norm_in uses the RMSNorm default eps (reference passes no eps here).
        z = Linear(self.c_z, use_bias=False, dtype=self.dtype, name="linear_in")(
            RMSNorm(eps=1e-6, dtype=self.dtype, name="norm_in")(z)
        ) + Linear(self.c_z, use_bias=False, dtype=self.dtype, name="linear_templ_feat")(
            templ_feat.astype(self.dtype)
        )

        z = Triangleformer(
            no_blocks=self.no_blocks,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="triangleformer",
        )(z, tz_mask, pad_mask=z_mask)

        z = Linear(self.c_z, use_bias=False, dtype=self.dtype, name="linear_out")(
            jax.nn.relu(RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_out")(z))
        )
        return z.astype(jnp.float32) * t_mask


class RelPosEmbedder(nn.Module):
    """AF3 relative-position features + 42-dim ligand rel_tok_feat
    (diffusion_conditioning.py:53-94).  c_rel_feat = 66 + 42 + 1 + 6 = 115.
    """

    c_z: int
    r_max: int = 32
    s_max: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, asym_id, sym_id, entity_id, residue_index, rel_tok_feat):
        chain_same = asym_id[..., None] == asym_id[..., None, :]
        entity_same = entity_id[..., None] == entity_id[..., None, :]

        residue_offset = residue_index[..., None] - residue_index[..., None, :] + self.r_max
        clipped = jnp.clip(residue_offset, 0, 2 * self.r_max)
        d_res = jnp.where(chain_same, clipped, 2 * self.r_max + 1)
        rel_pos_feat = one_hot_nearest(
            d_res.astype(jnp.float32), jnp.arange(0, 2 * self.r_max + 2, dtype=jnp.float32)
        )

        chain_offset = sym_id[..., None] - sym_id[..., None, :] + self.s_max
        clipped_chain = jnp.clip(chain_offset, 0, 2 * self.s_max)
        d_chain = jnp.where(chain_same | ~entity_same, 2 * self.s_max + 1, clipped_chain)
        rel_chain_feat = one_hot_nearest(
            d_chain.astype(jnp.float32), jnp.arange(0, 2 * self.s_max + 2, dtype=jnp.float32)
        )

        rel_feat = jnp.concatenate(
            [
                rel_pos_feat,
                rel_tok_feat.astype(jnp.float32),
                entity_same[..., None].astype(jnp.float32),
                rel_chain_feat,
            ],
            axis=-1,
        )
        return Linear(self.c_z, use_bias=False, dtype=self.dtype, name="linear")(
            rel_feat.astype(self.dtype)
        )


class AtomEmbedder(nn.Module):
    """Atom-level conditioning from reference-conformer features
    (diffusion_conditioning.py:97-128)."""

    c_a: int
    c_ap: int
    no_blocks_atom: int
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, ref_feat, ref_pos, ref_space_uid, ap_mask):
        d = (ref_pos[:, None, :] - ref_pos[None, :, :]).astype(jnp.float32)
        v = (ref_space_uid[:, None] == ref_space_uid[None, :]).astype(jnp.float32)
        v3 = v[:, :, None]

        a = Linear(self.c_a, use_bias=False, dtype=self.dtype, name="linear_c")(
            ref_feat.astype(self.dtype)
        )
        p = Linear(self.c_ap, use_bias=False, dtype=self.dtype, name="linear_p")(
            d.astype(self.dtype)
        ) * v3
        inv_d = 1.0 / (1.0 + jnp.linalg.norm(d, axis=-1)[:, :, None])
        p = p + Linear(self.c_ap, use_bias=False, dtype=self.dtype, name="linear_d")(
            inv_d.astype(self.dtype)
        ) * v3
        p = p + Linear(self.c_ap, use_bias=False, dtype=self.dtype, name="linear_v")(
            v3.astype(self.dtype)
        ) * v3

        ap = (
            Linear(self.c_ap, use_bias=False, dtype=self.dtype, name="linear_c_l")(
                jax.nn.relu(a)
            )[:, None, :]
            + Linear(self.c_ap, use_bias=False, dtype=self.dtype, name="linear_c_m")(
                jax.nn.relu(a)
            )[None, :, :]
        )
        ap = ap + p
        ap = ap + FeedForward(dtype=self.dtype, name="ffn")(ap)
        a = AtomTransformer(
            no_blocks=self.no_blocks_atom,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="atom_transformer",
        )(a, ap, ap_mask)
        return a, ap


class TokenEmbedder(nn.Module):
    """Token-level conditioning: pooled atoms + target/key-res/pocket feats,
    pair init + relpos + bonds, MSA -> Evoformer -> template -> Pairformer
    (diffusion_conditioning.py:131-202)."""

    target_dim: int
    msa_dim: int
    c_s: int
    c_m: int
    c_z: int
    no_blocks_evoformer: int
    no_blocks_pairformer: int
    no_blocks_template: int = 2
    num_recycles: int = 0
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, batch: Batch, a):
        z_mask = batch["z_mask"]

        pooled = segment_mean_pool(
            jax.nn.silu(Linear(self.c_s, dtype=self.dtype, name="linear_a")(a)),
            batch["token_id_to_chunk_sizes"],
        )
        s0 = (
            pooled
            + Linear(self.c_s, use_bias=False, dtype=self.dtype, name="linear_target_feat")(
                batch["target_feat"].astype(self.dtype)
            )
            + Linear(self.c_s, use_bias=False, dtype=self.dtype, name="linear_key_res_feat")(
                batch["key_res_feat"].astype(self.dtype)
            )
            + Linear(self.c_s, use_bias=False, dtype=self.dtype, name="linear_pocket_res_feat")(
                batch["pocket_res_feat"][..., None].astype(self.dtype)
            )
        )

        z0 = (
            Linear(self.c_z, dtype=self.dtype, name="linear_s_i")(s0)[:, None, :]
            + Linear(self.c_z, dtype=self.dtype, name="linear_s_j")(s0)[None, :, :]
            + RelPosEmbedder(c_z=self.c_z, dtype=self.dtype, name="rel_pos_embedder")(
                batch["asym_id"],
                batch["sym_id"],
                batch["entity_id"],
                batch["residue_index"],
                batch["rel_tok_feat"],
            )
            + Linear(self.c_z, use_bias=False, dtype=self.dtype, name="linear_bonds")(
                batch["token_bonds_feature"][..., None].astype(self.dtype)
            )
        )

        # submodule INSTANCES (created once; repeated calls share params —
        # the recycle loop reuses the same trunk)
        linear_msa_feat = Linear(
            self.c_m, use_bias=False, dtype=self.dtype, name="linear_msa_feat"
        )
        linear_s_input = Linear(self.c_m, dtype=self.dtype, name="linear_s_input")
        evoformer = Evoformer(
            c_z=self.c_z,
            no_blocks=self.no_blocks_evoformer,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="evoformer",
        )
        template_embedder = TemplatePairEmbedder(
            c_z=self.c_z,
            no_blocks=self.no_blocks_template,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="template_pair_embedder",
        )
        linear_m = Linear(self.c_s, use_bias=False, dtype=self.dtype, name="linear_m")
        linear_s2 = Linear(self.c_s, use_bias=False, dtype=self.dtype, name="linear_s")
        pairformer = Pairformer(
            no_blocks=self.no_blocks_pairformer,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="pairformer",
        )
        if self.num_recycles > 0:
            # training-era capability (configs_old.py num_recycles); the
            # reference repo never shipped its recycling code, so this is the
            # AF2-style recycle embedder: zero-init projection of the
            # previous iteration's (s, z), detached between iterations.
            # New params only exist when num_recycles > 0 — released-weight
            # conversion (num_recycles=0) is unaffected.
            rec_norm_s = RMSNorm(eps=self.eps, dtype=self.dtype, name="recycle_norm_s")
            rec_lin_s = Linear(
                self.c_s, init="final", use_bias=False, dtype=self.dtype,
                name="recycle_linear_s",
            )
            rec_norm_z = RMSNorm(eps=self.eps, dtype=self.dtype, name="recycle_norm_z")
            rec_lin_z = Linear(
                self.c_z, init="final", use_bias=False, dtype=self.dtype,
                name="recycle_linear_z",
            )

        s_out = z_out = None
        msa = batch["msa_feat"].astype(self.dtype)
        for r in range(self.num_recycles + 1):
            s_in, z_in = s0, z0
            if r > 0:
                s_in = s0 + rec_lin_s(rec_norm_s(jax.lax.stop_gradient(s_out)))
                z_in = z0 + rec_lin_z(rec_norm_z(jax.lax.stop_gradient(z_out)))
            m = linear_msa_feat(msa) + linear_s_input(s_in)
            m, z = evoformer(m, z_in, z_mask)
            z = z + template_embedder(
                z, batch["templ_feat"], batch["asym_id"], batch["t_mask"], z_mask
            )
            s = linear_m(m[0]) + linear_s2(s_in)
            s_out, z_out = pairformer(s, z, z_mask)

        return s_out, z_out


class DiffusionConditioning(nn.Module):
    """Top conditioning module -> (a, ap, s, z)
    (diffusion_conditioning.py:205-238)."""

    ref_dim: int
    target_dim: int
    msa_dim: int
    c_a: int
    c_ap: int
    c_s: int
    c_m: int
    c_z: int
    no_blocks_atom: int
    no_blocks_evoformer: int
    no_blocks_pairformer: int
    no_blocks_template: int = 2
    num_recycles: int = 0
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, batch: Batch):
        tok_of_atom = batch["atom_id_to_token_id"]
        a, ap = AtomEmbedder(
            c_a=self.c_a,
            c_ap=self.c_ap,
            no_blocks_atom=self.no_blocks_atom,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="atom_embedder",
        )(batch["ref_feat"], batch["ref_pos"], batch["ref_space_uid"], batch["ap_mask"])

        s, z = TokenEmbedder(
            target_dim=self.target_dim,
            msa_dim=self.msa_dim,
            c_s=self.c_s,
            c_m=self.c_m,
            c_z=self.c_z,
            no_blocks_evoformer=self.no_blocks_evoformer,
            no_blocks_pairformer=self.no_blocks_pairformer,
            no_blocks_template=self.no_blocks_template,
            num_recycles=self.num_recycles,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="token_embedder",
        )(batch, a)

        a = a + jnp.take(
            Linear(self.c_a, use_bias=False, dtype=self.dtype, name="linear_s")(
                RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_s")(s)
            ),
            tok_of_atom,
            axis=-2,
        )
        zp = Linear(self.c_ap, use_bias=False, dtype=self.dtype, name="linear_z")(
            RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_z")(z)
        )
        ap = ap + jnp.take(jnp.take(zp, tok_of_atom, axis=-3), tok_of_atom, axis=-2)
        return a, ap, s, z
