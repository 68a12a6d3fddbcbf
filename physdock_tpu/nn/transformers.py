"""Transformer stacks: AtomTransformer, Triangleformer, Evoformer, Pairformer,
DiT, and the AF3DiT diffusion denoiser.

Re-designs of reference PhysDock/models/layers/transformers.py for XLA:
every stack is a `nn.scan` over one block's (stacked) parameters with
`nn.remat` applied to the block body — one compilation of the block instead
of N, and rematerialized activations in the backward pass (replacing the
reference's per-block `torch.utils.checkpoint` at transformers.py:35,68,
108,145,174).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from physdock_tpu.nn.attentions import (
    AttentionWithPairBias,
    DiTAttention,
    MSAColumnAttention,
    MSARowAttentionWithPairBias,
    TriangleAttention,
    TriangleUpdate,
)
from physdock_tpu.nn.primitives import (
    DiTTransition,
    LayerNorm,
    Linear,
    TimestepEmbeddings,
    Transition,
)
from physdock_tpu.parallel.tp import shard_rows

Dtype = Any


def _res(x, delta):
    """Residual add in the carry's dtype.

    Sub-modules return fp32 (mirroring the reference's `.float()` casts) but
    the residual STREAMS are carried in the compute dtype: at bf16 on TPU
    this halves the HBM traffic of every read-modify-write of the [S, S,
    c_z] pair / [N_msa, S, c_m] MSA / [B, A, c_a] diffusion streams, which
    is where an HBM-bound trunk spends its time.  With fp32 compute (CPU
    parity tests) the cast is the identity.
    """
    return x + delta.astype(x.dtype)


def _unroll_for_cost() -> bool:
    """XLA HLO cost analysis counts a scan body ONCE regardless of trip
    count; the FLOP counter (utils/flops.py) sets this env so every block
    lands in the lowered module.  Never set in production (the rolled scan
    is the one-compilation memory strategy)."""
    import os

    return os.environ.get("PHYSDOCK_UNROLL_SCANS") == "1"


def _scan_stack(block_cls, length: int, remat: bool = True, **block_kw):
    """Stack `length` copies of a carry->carry block as a lax.scan."""
    cls = nn.remat(block_cls, prevent_cse=False) if remat else block_cls
    return nn.scan(
        cls,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=length,
        in_axes=nn.broadcast,
        out_axes=0,
        metadata_params={nn.meta.PARTITION_NAME: None},
        unroll=length if _unroll_for_cost() else 1,
    )(**block_kw)


# ------------------------------- Atom stack --------------------------------


class AtomBlock(nn.Module):
    """AttentionWithPairBias + Transition over the full atom pair grid
    (transformers.py:13-22).  Full N_atom x N_atom attention — no AF3-style
    32x128 local windows, matching the reference."""

    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, a, ap, ap_mask):
        a = _res(a, AttentionWithPairBias(
            inf=self.inf, eps=self.eps, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attention",
        )(a, ap, ap_mask))
        a = _res(a, Transition(eps=self.eps, dtype=self.dtype, name="transition")(a))
        return a, None


class AtomTransformer(nn.Module):
    no_blocks: int
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, a, ap, ap_mask):
        stack = _scan_stack(
            AtomBlock,
            self.no_blocks,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="blocks",
        )
        a, _ = stack(a.astype(self.dtype), ap, ap_mask)
        return a


# ----------------------------- Triangle stack ------------------------------


class TriangleBlock(nn.Module):
    """tri-mult row/col + tri-attn row/col + transition (transformers.py:39-56)."""

    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, z, z_mask, pad_mask=None):
        z = shard_rows(z)  # identity unless a tp mesh is active
        kw = dict(eps=self.eps, dtype=self.dtype)
        z = _res(z, TriangleUpdate(name="triangle_row_update", **kw)(z, z_mask))
        z = _res(z, TriangleUpdate(transpose=True, name="triangle_col_update", **kw)(z, z_mask))
        akw = dict(inf=self.inf, eps=self.eps, dtype=self.dtype, attn_impl=self.attn_impl)
        z = _res(z, TriangleAttention(name="triangle_row_attention", **akw)(z, z_mask, pad_mask))
        z = _res(z, TriangleAttention(transpose=True, name="triangle_col_attention", **akw)(z, z_mask, pad_mask))
        z = _res(z, Transition(eps=self.eps, dtype=self.dtype, name="pair_transition")(z))
        return z, None


class Triangleformer(nn.Module):
    no_blocks: int
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, z, z_mask, pad_mask=None):
        stack = _scan_stack(
            TriangleBlock,
            self.no_blocks,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="blocks",
        )
        z, _ = stack(z.astype(self.dtype), z_mask, pad_mask)
        return z


# ----------------------------- Evoformer stack -----------------------------


class EvoformerBlock(nn.Module):
    """MSA row/col attention + transition + OPM + triangle set
    (transformers.py:72-96)."""

    c_z: int
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, carry, z_mask):
        from physdock_tpu.nn.primitives import OuterProductMean

        m, z = carry
        z = shard_rows(z)  # identity unless a tp mesh is active
        akw = dict(inf=self.inf, eps=self.eps, dtype=self.dtype, attn_impl=self.attn_impl)
        kw = dict(eps=self.eps, dtype=self.dtype)
        m = _res(m, MSARowAttentionWithPairBias(name="msa_row_attention", **akw)(m, z, z_mask))
        m = _res(m, MSAColumnAttention(name="msa_col_attention", **akw)(m))
        m = _res(m, Transition(name="msa_transition", **kw)(m))
        z = _res(z, OuterProductMean(c_z=self.c_z, name="opm", **kw)(m))
        z = _res(z, TriangleUpdate(name="triangle_row_update", **kw)(z, z_mask))
        z = _res(z, TriangleUpdate(transpose=True, name="triangle_col_update", **kw)(z, z_mask))
        z = _res(z, TriangleAttention(name="triangle_row_attention", **akw)(z, z_mask))
        z = _res(z, TriangleAttention(transpose=True, name="triangle_col_attention", **akw)(z, z_mask))
        z = _res(z, Transition(name="pair_transition", **kw)(z))
        return (m, z), None


class Evoformer(nn.Module):
    c_z: int
    no_blocks: int = 4
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, m, z, z_mask):
        stack = _scan_stack(
            EvoformerBlock,
            self.no_blocks,
            c_z=self.c_z,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="blocks",
        )
        (m, z), _ = stack((m.astype(self.dtype), z.astype(self.dtype)), z_mask)
        return m, z


# ----------------------------- Pairformer stack ----------------------------


class PairFormerBlock(nn.Module):
    """Triangle set + single attention with pair bias (transformers.py:112-136)."""

    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, carry, z_mask):
        s, z = carry
        z = shard_rows(z)  # identity unless a tp mesh is active
        akw = dict(inf=self.inf, eps=self.eps, dtype=self.dtype, attn_impl=self.attn_impl)
        kw = dict(eps=self.eps, dtype=self.dtype)
        z = _res(z, TriangleUpdate(name="triangle_row_update", **kw)(z, z_mask))
        z = _res(z, TriangleUpdate(transpose=True, name="triangle_col_update", **kw)(z, z_mask))
        z = _res(z, TriangleAttention(name="triangle_row_attention", **akw)(z, z_mask))
        z = _res(z, TriangleAttention(transpose=True, name="triangle_col_attention", **akw)(z, z_mask))
        z = _res(z, Transition(name="pair_transition", **kw)(z))
        s = _res(s, AttentionWithPairBias(name="attention", **akw)(s, z, z_mask))
        s = _res(s, Transition(name="transition", **kw)(s))
        return (s, z), None


class Pairformer(nn.Module):
    no_blocks: int = 24
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, s, z, z_mask):
        stack = _scan_stack(
            PairFormerBlock,
            self.no_blocks,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="blocks",
        )
        (s, z), _ = stack((s.astype(self.dtype), z.astype(self.dtype)), z_mask)
        return s, z


# -------------------------------- DiT stack --------------------------------


class DiTBlock(nn.Module):
    """AdaLN-Zero DiT block (transformers.py:149-162).

    The attention's pair bias is always consumed precomputed (`bias`), so
    the per-step scan never touches the [S, S, c_z] pair tensor; `bias_only`
    is the companion scanned method that produces it once per round."""

    c_s: int
    c_z: int
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        self.attention = DiTAttention(
            c_s=self.c_s,
            c_z=self.c_z,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
        )
        self.transition = DiTTransition(eps=self.eps, dtype=self.dtype)

    def __call__(self, bs, t, beta, bias):
        bs = _res(bs, self.attention(bs, None, t, None, beta, cached_bias=bias))
        bs = _res(bs, self.transition(bs, t))
        return bs, None

    def bias_only(self, carry, z, z_mask):
        # cached bias is [H, S_q, S_k]: shard the query rows over tp so the
        # per-step sampler attention partitions without materializing the
        # full bias per device
        return carry, shard_rows(self.attention.compute_bias(z, z_mask), row_axis=-2)


class DiT(nn.Module):
    c_s: int
    c_z: int
    no_blocks: int = 12
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        scan_kw = dict(
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.no_blocks,
            out_axes=0,
            metadata_params={nn.meta.PARTITION_NAME: None},
            unroll=self.no_blocks if _unroll_for_cost() else 1,
        )
        cls = nn.remat(DiTBlock, prevent_cse=False, methods=["__call__", "bias_only"])
        self.blocks = nn.scan(
            cls,
            methods={
                "__call__": dict(
                    in_axes=(nn.broadcast, nn.broadcast, 0), **scan_kw
                ),
                "bias_only": dict(in_axes=nn.broadcast, **scan_kw),
            },
        )(
            c_s=self.c_s,
            c_z=self.c_z,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
        )

    def compute_bias(self, z, z_mask):
        """Per-block pair biases [no_blocks, H, S, S] (cache once per round)."""
        _, bias = self.blocks.bias_only(None, z, z_mask)
        return bias

    def __call__(self, bs, z, t, z_mask, beta=None, cached_bias=None):
        if cached_bias is None:
            cached_bias = self.compute_bias(z, z_mask)
        bs, _ = self.blocks(bs.astype(self.dtype), t, beta, cached_bias)
        return bs


# --------------------------------- AF3DiT ----------------------------------


def segment_mean_pool(x, token_id_to_chunk_sizes, eps: float = 1e-3):
    """Mean-pool atom features into token features via the cumsum-diff trick
    (transformers.py:205-212; also TokenEmbedder.downscale).

    x: [..., A, C]; token_id_to_chunk_sizes: [T] int (0 for padded tokens).
    Padded tokens produce zeros (diff of equal cumsums).
    """
    x_cumsum = jnp.cumsum(x.astype(jnp.float32), axis=-2)
    inds = jnp.cumsum(token_id_to_chunk_sizes, axis=-1) - 1
    value = jnp.take(x_cumsum, inds, axis=-2)
    first = value[..., :1, :]
    x_tok = jnp.concatenate([first, jnp.diff(value, axis=-2)], axis=-2)
    sizes = token_id_to_chunk_sizes.astype(x.dtype)
    return x_tok / (sizes[..., None] + eps)


class AF3DiT(nn.Module):
    """EDM-preconditioned atom->token->atom DiT denoiser
    (transformers.py:178-262).

    Atom-DiT encoder -> cumsum-diff downscale -> token-DiT -> broadcast
    upscale -> atom-DiT decoder -> linear to coordinate update, wrapped in
    EDM c_in/c_skip/c_out preconditioning (precond :218-226, denoise
    :228-233).

    `compute_bias_cache` precomputes the per-block attention biases from
    (ap, z) once; the sampler reuses them over all diffusion steps (the
    reference recomputes them every block x step).
    """

    c_a: int
    c_ap: int
    c_s: int
    c_z: int
    no_blocks_atom: int
    no_blocks_dit: int
    sigma_data: float = 16.0
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        akw = dict(
            inf=self.inf, eps=self.eps, dtype=self.dtype, attn_impl=self.attn_impl
        )
        self.linear_x = Linear(self.c_a, dtype=self.dtype)
        self.linear_downscale = Linear(self.c_s, dtype=self.dtype)
        self.linear_upscale = Linear(self.c_a, dtype=self.dtype)
        self.time_embedder = TimestepEmbeddings(dtype=self.dtype)
        self.atom_dit_encoder = DiT(
            c_s=self.c_a, c_z=self.c_ap, no_blocks=self.no_blocks_atom, **akw
        )
        self.token_dit = DiT(
            c_s=self.c_s, c_z=self.c_z, no_blocks=self.no_blocks_dit, **akw
        )
        self.atom_dit_decoder = DiT(
            c_s=self.c_a, c_z=self.c_ap, no_blocks=self.no_blocks_atom, **akw
        )
        self.norm_r = LayerNorm(eps=self.eps, dtype=self.dtype)
        self.linear_r = Linear(3, use_bias=False, dtype=self.dtype)

    def compute_bias_cache(self, ap, z, ap_mask, z_mask):
        """Per-stack cached attention biases (once per round)."""
        return {
            "atom_enc": self.atom_dit_encoder.compute_bias(ap, ap_mask),
            "token": self.token_dit.compute_bias(z, z_mask),
            "atom_dec": self.atom_dit_decoder.compute_bias(ap, ap_mask),
        }

    def __call__(
        self,
        x_hat,  # [B, A, 3] noisy coords (B = diffusion samples)
        t_hat,  # [B] noise levels
        a,  # [A, c_a] atom single conditioning
        ap,  # [A, A, c_ap] atom pair conditioning
        s,  # [T, c_s] token single conditioning
        z,  # [T, T, c_z] token pair conditioning
        ap_mask,  # [A, A]
        z_mask,  # [T, T]
        token_id_to_chunk_sizes,  # [T]
        atom_id_to_token_id,  # [A]
        bias_cache=None,
    ):
        if bias_cache is None:
            bias_cache = self.compute_bias_cache(ap, z, ap_mask, z_mask)

        # precond (:218-226)
        c_in = 1.0 / jnp.sqrt(t_hat[:, None, None] ** 2 + self.sigma_data**2)
        c_noise = jnp.log(t_hat / self.sigma_data) / 4.0
        ba = self.linear_x((x_hat * c_in).astype(self.dtype)) + a[None].astype(
            self.dtype
        )
        t = self.time_embedder(t_hat * c_noise)
        beta = None

        ba = self.atom_dit_encoder(
            ba, None, t, None, beta, cached_bias=bias_cache["atom_enc"]
        )

        # downscale (:205-212)
        pooled = segment_mean_pool(
            jax.nn.silu(self.linear_downscale(ba)), token_id_to_chunk_sizes
        )
        bs = pooled + s[None].astype(pooled.dtype)

        bs = self.token_dit(
            bs, None, t, None, None, cached_bias=bias_cache["token"]
        )

        # upscale (:214-216)
        ba = ba + jnp.take(
            self.linear_upscale(bs), atom_id_to_token_id, axis=-2
        ).astype(jnp.float32)

        ba = self.atom_dit_decoder(
            ba, None, t, None, beta, cached_bias=bias_cache["atom_dec"]
        )

        # denoise (:228-233)
        r = self.linear_r(self.norm_r(ba)).astype(jnp.float32)
        c_skip = (self.sigma_data**2 / (self.sigma_data**2 + t_hat**2))[:, None, None]
        c_out = (
            self.sigma_data * t_hat / jnp.sqrt(self.sigma_data**2 + t_hat**2)
        )[:, None, None]
        return c_skip * x_hat + c_out * r
