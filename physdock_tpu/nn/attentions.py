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
    LinearParams,
    RMSNorm,
    fused_linear,
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

        # q/k/v/g share s_norm: one fused matmul (one read of s_norm)
        q, k, v, g = fused_linear(
            s_norm,
            [
                LinearParams(c_s, use_bias=False, name="linear_q")(c_s),
                LinearParams(c_s, use_bias=False, name="linear_k")(c_s),
                LinearParams(c_s, use_bias=False, name="linear_v")(c_s),
                LinearParams(c_s, name="linear_g")(c_s),
            ],
            self.dtype,
        )
        q, k, v = _split_heads(q, h), _split_heads(k, h), _split_heads(v, h)

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

        q, k, v, g = fused_linear(
            m_norm,
            [
                LinearParams(c_m, use_bias=False, name="linear_q")(c_m),
                LinearParams(c_m, use_bias=False, name="linear_k")(c_m),
                LinearParams(c_m, use_bias=False, name="linear_v")(c_m),
                LinearParams(c_m, name="linear_g")(c_m),
            ],
            self.dtype,
        )
        q, k, v = _split_heads(q, h), _split_heads(k, h), _split_heads(v, h)

        # 3-D [h, S, S] bias shared by all MSA rows -> grouped-kernel path
        bias = jnp.moveaxis(
            Linear(h, use_bias=False, dtype=self.dtype, name="linear_z")(z_norm), -1, -3
        )
        bias = bias + gen_attn_mask(z_mask.astype(jnp.float32), -self.inf)[..., None, :, :]

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

        q, k, v, g = fused_linear(
            m_norm,
            [
                LinearParams(c_m, use_bias=False, name="linear_q")(c_m),
                LinearParams(c_m, use_bias=False, name="linear_k")(c_m),
                LinearParams(c_m, use_bias=False, name="linear_v")(c_m),
                LinearParams(c_m, name="linear_g")(c_m),
            ],
            self.dtype,
        )
        q, k, v = _split_heads(q, h), _split_heads(k, h), _split_heads(v, h)

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
        # all five projections share z_norm: one fused matmul
        qx, qs, kx, ks, gl = fused_linear(
            z,
            [
                LinearParams(C_HIDDEN, name="linear_qx")(c_z),
                LinearParams(C_HIDDEN, name="linear_q")(c_z),
                LinearParams(C_HIDDEN, name="linear_kx")(c_z),
                LinearParams(C_HIDDEN, name="linear_k")(c_z),
                LinearParams(c_z, init="gating", name="linear_g")(c_z),
            ],
            self.dtype,
        )
        q = qx * jax.nn.sigmoid(qs) * mask
        k = kx * jax.nn.sigmoid(ks) * mask
        g = jax.nn.sigmoid(gl)
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

        # q/k/v/g/bias all share z_norm: one fused matmul over the pair rep
        q, k, v, g, bias_raw = fused_linear(
            z_norm,
            [
                LinearParams(c_z, use_bias=False, name="linear_q")(c_z),
                LinearParams(c_z, use_bias=False, name="linear_k")(c_z),
                LinearParams(c_z, use_bias=False, name="linear_v")(c_z),
                LinearParams(c_z, name="linear_g")(c_z),
                LinearParams(h, use_bias=False, name="linear_z")(c_z),
            ],
            self.dtype,
        )
        q, k, v = _split_heads(q, h), _split_heads(k, h), _split_heads(v, h)

        # bias stays 3-D [h, S, S] (no broadcast batch dim): the dispatcher
        # then selects the sample-grouped/head-folded kernels, which load
        # the row-shared bias ONCE per group instead of once per row
        bias = jnp.moveaxis(bias_raw, -1, -3)
        bias = bias + gen_attn_mask(z_mask.astype(jnp.float32), -self.inf)[..., None, :, :]
        if pad_mask is not None:
            bias = bias + gen_attn_mask(
                pad_mask.astype(jnp.float32), -2.0 * self.inf
            )[..., None, :, :]

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
        self.linear_q = LinearParams(self.c_s, use_bias=False)
        self.linear_k = LinearParams(self.c_s, use_bias=False)
        self.linear_v = LinearParams(self.c_s, use_bias=False)
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

        # q/k/v share bs_norm: one fused matmul per block-step
        qf, kf, vf = fused_linear(
            bs_norm,
            [
                self.linear_q(self.c_s),
                self.linear_k(self.c_s),
                self.linear_v(self.c_s),
            ],
            self.dtype,
        )
        q = self.norm_q(_split_heads(qf, h))
        k = self.norm_k(_split_heads(kf, h))
        v = _split_heads(vf, h)

        bias = cached_bias if cached_bias is not None else self.compute_bias(z, z_mask)
        if beta is not None:
            bias = bias[None] + beta[:, None, :, :].astype(bias.dtype)
        # else: keep the shared [H, S, S] bias 3-D so the dispatcher can pick
        # the sample-grouped kernel (bias loaded once for all samples)

        o = _merge_heads(dot_product_attention(q, k, v, bias, impl=self.attn_impl))
        o = self.linear_o(o).astype(jnp.float32)
        return o * gate.astype(jnp.float32)
