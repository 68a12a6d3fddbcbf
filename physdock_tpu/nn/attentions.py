"""Attention-variant modules.

Re-implementations of the reference's six attention primitives
(reference: PhysDock/models/primitives/attentions.py).  Head dim is fixed at
32 with heads = channels/32 throughout; outputs are gated by a *linear*
(sigmoid-free) gate except where noted, and always cast back to fp32
(matching the `.float()` at every reference return).

All SDPA calls route through physdock_tpu.ops.dot_product_attention so the
Pallas flash kernel can take over on TPU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from physdock_tpu.nn.primitives import (
    AdaLayerNormZero,
    LayerNorm,
    Linear,
    RMSNorm,
)
from physdock_tpu.ops.attention import dot_product_attention
from physdock_tpu.utils.geometry import gen_attn_mask

Dtype = Any
C_HIDDEN = 32  # per-head dim (attentions.py: fixed 32 everywhere)


def _split_heads(x, h):
    # [..., S, H*D] -> [..., H, S, D]
    *lead, s, hd = x.shape
    return jnp.swapaxes(x.reshape(*lead, s, h, hd // h), -2, -3)


def _merge_heads(x):
    # [..., H, S, D] -> [..., S, H*D]
    y = jnp.swapaxes(x, -2, -3)
    *lead, s, h, d = y.shape
    return y.reshape(*lead, s, h * d)


class AttentionWithPairBias(nn.Module):
    """Single-rep attention with pair bias (attentions.py:12-53).

    s: [S, c_s]; z: [S, S, c_z]; z_mask: [S, S].
    """

    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, s, z, z_mask):
        c_s = s.shape[-1]
        h = c_s // C_HIDDEN
        s_norm = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_s")(s)
        z_norm = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_z")(z)

        q = _split_heads(Linear(c_s, use_bias=False, dtype=self.dtype, name="linear_q")(s_norm), h)
        k = _split_heads(Linear(c_s, use_bias=False, dtype=self.dtype, name="linear_k")(s_norm), h)
        v = _split_heads(Linear(c_s, use_bias=False, dtype=self.dtype, name="linear_v")(s_norm), h)
        g = Linear(c_s, dtype=self.dtype, name="linear_g")(s_norm)

        bias = jnp.moveaxis(
            Linear(h, use_bias=False, dtype=self.dtype, name="linear_z")(z_norm), -1, -3
        )
        bias = bias + gen_attn_mask(z_mask.astype(jnp.float32), -self.inf)[None]

        o = _merge_heads(dot_product_attention(q, k, v, bias, impl=self.attn_impl))
        o = Linear(c_s, dtype=self.dtype, name="linear_o")(o) * g
        return o.astype(jnp.float32)


class MSARowAttentionWithPairBias(nn.Module):
    """Row-wise MSA attention with pair bias (attentions.py:56-97).

    m: [B, S, c_m]; z: [S, S, c_z]; z_mask: [S, S].
    """

    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, m, z, z_mask):
        c_m = m.shape[-1]
        h = c_m // C_HIDDEN
        m_norm = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_m")(m)
        z_norm = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_z")(z)

        q = _split_heads(Linear(c_m, use_bias=False, dtype=self.dtype, name="linear_q")(m_norm), h)
        k = _split_heads(Linear(c_m, use_bias=False, dtype=self.dtype, name="linear_k")(m_norm), h)
        v = _split_heads(Linear(c_m, use_bias=False, dtype=self.dtype, name="linear_v")(m_norm), h)
        g = Linear(c_m, dtype=self.dtype, name="linear_g")(m_norm)

        bias = jnp.moveaxis(
            Linear(h, use_bias=False, dtype=self.dtype, name="linear_z")(z_norm), -1, -3
        )[None]
        bias = bias + gen_attn_mask(z_mask.astype(jnp.float32), -self.inf)[None, None]

        o = _merge_heads(dot_product_attention(q, k, v, bias, impl=self.attn_impl))
        o = Linear(c_m, dtype=self.dtype, name="linear_o")(o) * g
        return o.astype(jnp.float32)


class MSAColumnAttention(nn.Module):
    """Column-wise MSA attention, no bias (attentions.py:100-136)."""

    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, m):
        m = jnp.swapaxes(m, -2, -3)  # attend along the sequence axis per column
        c_m = m.shape[-1]
        h = c_m // C_HIDDEN
        m_norm = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_m")(m)

        q = _split_heads(Linear(c_m, use_bias=False, dtype=self.dtype, name="linear_q")(m_norm), h)
        k = _split_heads(Linear(c_m, use_bias=False, dtype=self.dtype, name="linear_k")(m_norm), h)
        v = _split_heads(Linear(c_m, use_bias=False, dtype=self.dtype, name="linear_v")(m_norm), h)
        g = Linear(c_m, dtype=self.dtype, name="linear_g")(m_norm)

        o = _merge_heads(dot_product_attention(q, k, v, None, impl=self.attn_impl))
        o = Linear(c_m, dtype=self.dtype, name="linear_o")(o) * g
        return jnp.swapaxes(o, -2, -3).astype(jnp.float32)


class TriangleUpdate(nn.Module):
    """Combined incoming/outgoing triangular multiplicative update
    (attentions.py:139-171).

    The outgoing/incoming distinction is a transpose flag on z rather than
    two weight sets.  Core contraction: einsum("...ijc,...Ijc->...iIc", q, k)
    — a batched matmul over the 32 hidden channels, which XLA maps directly
    onto the MXU.
    """

    transpose: bool = False
    eps: float = 1e-8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, z_mask):
        # The incoming (transpose=True) variant is algebraically the outgoing
        # one applied to z^T.  Every stage except the contraction is
        # position-wise and therefore commutes with the (i, j) swap, so
        # instead of materializing z^T on entry and o^T on exit (two full
        # [S, S, c_z] HBM copies per call at crop 256) the swap is folded
        # into the einsum index order below; XLA handles the layout inside
        # the batched matmul on the much smaller [S, S, 32] projections.
        c_z = z.shape[-1]
        z = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_in")(z)
        mask = z_mask[..., None].astype(z.dtype)
        q = (
            Linear(C_HIDDEN, dtype=self.dtype, name="linear_qx")(z)
            * jax.nn.sigmoid(Linear(C_HIDDEN, dtype=self.dtype, name="linear_q")(z))
            * mask
        )
        k = (
            Linear(C_HIDDEN, dtype=self.dtype, name="linear_kx")(z)
            * jax.nn.sigmoid(Linear(C_HIDDEN, dtype=self.dtype, name="linear_k")(z))
            * mask
        )
        g = jax.nn.sigmoid(Linear(c_z, init="gating", dtype=self.dtype, name="linear_g")(z))
        if self.transpose:
            # out[i,k,c] = sum_j k[j,i,c] * q[j,k,c]  (== swap-in/swap-out)
            prod = jnp.einsum("...jic,...jkc->...ikc", k, q)
        else:
            prod = jnp.einsum("...ijc,...kjc->...ikc", q, k)
        prod = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_out")(prod)
        o = Linear(c_z, init="final", dtype=self.dtype, name="linear_z")(prod) * g
        return o.astype(jnp.float32)


class TriangleAttention(nn.Module):
    """Triangle attention around starting/ending node (attentions.py:174-217).

    transpose=False: starting node (rows attend within rows, bias from z).

    `pad_mask` (optional) marks statically-padded tokens with a second,
    much stronger mask tier.  Rationale: when a row of `z_mask` is fully
    masked (e.g. ligand rows of the template mask), softmax(-inf + bias)
    degenerates to attention by bias alone over ALL keys — the reference
    runs unpadded at inference so only real keys participate; under static
    padding the pad keys must vanish *relative to* other masked keys, which
    a single mask level cannot express.
    """

    transpose: bool = False
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, z, z_mask, pad_mask=None):
        if self.transpose:
            z = jnp.swapaxes(z, -2, -3)
            z_mask = jnp.swapaxes(z_mask, -1, -2)
            if pad_mask is not None:
                pad_mask = jnp.swapaxes(pad_mask, -1, -2)
        c_z = z.shape[-1]
        h = c_z // C_HIDDEN
        z_norm = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm")(z)

        q = _split_heads(Linear(c_z, use_bias=False, dtype=self.dtype, name="linear_q")(z_norm), h)
        k = _split_heads(Linear(c_z, use_bias=False, dtype=self.dtype, name="linear_k")(z_norm), h)
        v = _split_heads(Linear(c_z, use_bias=False, dtype=self.dtype, name="linear_v")(z_norm), h)
        g = Linear(c_z, dtype=self.dtype, name="linear_g")(z_norm)

        bias = jnp.moveaxis(
            Linear(h, use_bias=False, dtype=self.dtype, name="linear_z")(z_norm), -1, -3
        )[None]
        bias = bias + gen_attn_mask(z_mask.astype(jnp.float32), -self.inf)[None, None]
        if pad_mask is not None:
            bias = bias + gen_attn_mask(
                pad_mask.astype(jnp.float32), -2.0 * self.inf
            )[None, None]

        o = _merge_heads(dot_product_attention(q, k, v, bias, impl=self.attn_impl))
        o = Linear(c_z, dtype=self.dtype, name="linear_o")(o) * g
        if self.transpose:
            o = jnp.swapaxes(o, -2, -3)
        return o.astype(jnp.float32)


class DiTAttention(nn.Module):
    """AdaLN-Zero-modulated attention with pair bias and q/k RMSNorm
    (attentions.py:220-265).

    bs: [B, S, c_s] (B = diffusion samples); z: [S, S, c_z]; t: [B, 256].

    setup-style so `compute_bias` can run separately from `__call__`:
    the pair bias (norm_z -> linear_z -> +mask) depends only on the
    conditioning, so the sampler precomputes it ONCE per round instead of
    re-reading the [S, S, c_z] pair tensor every block x diffusion step
    (the reference recomputes per step — attentions.py:252-255; at 2048
    atoms that is ~134 MB of HBM reads per block-step)."""

    c_s: int
    c_z: int
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        h = self.c_s // C_HIDDEN
        self.norm_s = AdaLayerNormZero(eps=self.eps, dtype=self.dtype)
        self.norm_z = LayerNorm(dtype=self.dtype)
        self.linear_q = Linear(self.c_s, use_bias=False, dtype=self.dtype)
        self.linear_k = Linear(self.c_s, use_bias=False, dtype=self.dtype)
        self.linear_v = Linear(self.c_s, use_bias=False, dtype=self.dtype)
        self.linear_z = Linear(h, use_bias=False, dtype=self.dtype)
        self.norm_q = RMSNorm(eps=self.eps, dtype=self.dtype)
        self.norm_k = RMSNorm(eps=self.eps, dtype=self.dtype)
        self.linear_o = Linear(self.c_s, dtype=self.dtype)

    def compute_bias(self, z, z_mask):
        """[H, S, S] pair bias incl. the additive mask (cacheable).

        Stored in the compute dtype: bf16 halves the per-step HBM read of
        the cached biases (-1e9 mask values are exactly representable
        enough — softmax only needs them <<-1e4)."""
        bias = jnp.moveaxis(self.linear_z(self.norm_z(z)), -1, -3)
        return (
            bias.astype(jnp.float32)
            + gen_attn_mask(z_mask.astype(jnp.float32), -self.inf)[None]
        ).astype(self.dtype)

    def __call__(self, bs, z, t, z_mask, beta=None, cached_bias=None):
        h = self.c_s // C_HIDDEN
        bs_norm, gate = self.norm_s(bs, t)

        q = self.norm_q(_split_heads(self.linear_q(bs_norm), h))
        k = self.norm_k(_split_heads(self.linear_k(bs_norm), h))
        v = _split_heads(self.linear_v(bs_norm), h)

        bias = cached_bias if cached_bias is not None else self.compute_bias(z, z_mask)
        if beta is not None:
            bias = bias[None] + beta[:, None, :, :].astype(bias.dtype)
        # else: keep the shared [H, S, S] bias 3-D so the dispatcher can pick
        # the sample-grouped kernel (bias loaded once for all samples)

        o = _merge_heads(dot_product_attention(q, k, v, bias, impl=self.attn_impl))
        o = self.linear_o(o).astype(jnp.float32)
        return o * gate.astype(jnp.float32)
