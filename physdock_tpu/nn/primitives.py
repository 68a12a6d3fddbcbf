"""Core NN primitives (flax.linen).

Functional re-implementations of the reference primitives
(reference: PhysDock/models/primitives/*.py) with an explicit dtype policy:
parameters live in fp32, matmuls run in `dtype` (fp32 or bf16), and all
normalization statistics are computed in fp32 (the reference forces the same
via `.float()` casts — rms_norm.py:17-19, layer_norm.py FP32LayerNorm).

Module/parameter names mirror the reference so a torch `state_dict` maps
1:1 onto the param pytree (see physdock_tpu/model/import_weights.py).
The init zoo matches primitives/linear.py:96-145:
  default  -> LeCun fan-in truncated normal
  relu     -> He truncated normal
  glorot   -> fan-avg Glorot uniform
  gating   -> weight 0, bias 1
  normal   -> N(0, 1/fan_in)
  final    -> weight 0, bias 0
  bias_fill_-2 -> default weight, bias -2
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

TRUNC_STD = 0.87962566103423978  # std of the standard truncated normal on [-2, 2]


def _trunc_normal_init(scale: float, fan: str = "fan_in"):
    def init(key, shape, dtype=jnp.float32):
        # shape = (in_dim, out_dim) for a Dense kernel
        fan_in, fan_out = shape[0], shape[-1]
        f = {"fan_in": fan_in, "fan_out": fan_out, "fan_avg": (fan_in + fan_out) / 2}[fan]
        std = math.sqrt(scale / max(1, f)) / TRUNC_STD
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std

    return init


def _normal_init():
    def init(key, shape, dtype=jnp.float32):
        std = math.sqrt(1.0 / max(1, shape[0]))
        return jax.random.normal(key, shape, dtype) * std

    return init


_INIT_ZOO = {
    "default": lambda: _trunc_normal_init(1.0),
    "relu": lambda: _trunc_normal_init(2.0),
    "glorot": lambda: nn.initializers.xavier_uniform(),
    "gating": lambda: nn.initializers.zeros_init(),
    "normal": _normal_init,
    "final": lambda: nn.initializers.zeros_init(),
    "bias_fill_-2": lambda: _trunc_normal_init(1.0),
}

_BIAS_FILL = {"gating": 1.0, "bias_fill_-2": -2.0}


class Linear(nn.Module):
    """Dense layer with the AF-style initializer zoo (primitives/linear.py)."""

    features: int
    use_bias: bool = True
    init: str = "default"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel_init = _INIT_ZOO[self.init]()
        bias_fill = _BIAS_FILL.get(self.init, 0.0)
        kernel = self.param(
            "weight", kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        y = jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.constant(bias_fill), (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class LinearParams(nn.Module):
    """Parameter-only twin of `Linear`: owns the identical {weight, bias}
    params (same names, shapes, initializers) but returns them instead of
    applying, so callers can CONCATENATE several projections that share one
    input into a single matmul via `fused_linear` — one HBM read of the
    activation instead of N.  Param pytree paths are indistinguishable from
    `Linear`, keeping the torch weight-conversion contract intact."""

    features: int
    use_bias: bool = True
    init: str = "default"

    @nn.compact
    def __call__(self, in_dim: int):
        kernel_init = _INIT_ZOO[self.init]()
        bias_fill = _BIAS_FILL.get(self.init, 0.0)
        kernel = self.param("weight", kernel_init, (in_dim, self.features), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.constant(bias_fill), (self.features,), jnp.float32
            )
        return kernel, bias


# Measured on-chip (scripts/tpu_proj_ab.py, same-process interleaved A/B at
# medium dims): the concatenated dot is 8% SLOWER per Pairformer block than
# separate dots (4.61 vs 4.28 ms) — XLA already merges/fuses the per-dot
# epilogues, and the wide fused product forces a materialized intermediate.
# Default off; the flag stays so the A/B remains reproducible per-arch.
FUSE_PROJECTIONS = False


def fused_linear(x, parts, dtype):
    """Apply several Linears sharing the input `x` as ONE matmul.

    parts: [(kernel [in, f_i], bias [f_i] | None), ...] from `LinearParams`.
    Returns the per-part outputs (slices of the fused product).  Per output
    column the math is identical to separate matmuls (same contraction)."""
    xd = x.astype(dtype)
    if not FUSE_PROJECTIONS:
        return [
            jnp.matmul(xd, k.astype(dtype))
            + (0 if b is None else b.astype(dtype))
            for k, b in parts
        ]
    W = jnp.concatenate([k for k, _ in parts], axis=1).astype(dtype)
    y = jnp.matmul(xd, W)
    outs = []
    off = 0
    for k, b in parts:
        n = k.shape[1]
        o = y[..., off : off + n]
        if b is not None:
            o = o + b.astype(dtype)
        off += n
        outs.append(o)
    return outs


class RMSNorm(nn.Module):
    """LLaMA-style RMSNorm; stats in fp32 (primitives/rms_norm.py:8-20)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones_init(), (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (y * weight).astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics (primitives/layer_norm.py)."""

    eps: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            weight = self.param(
                "weight", nn.initializers.ones_init(), (x.shape[-1],), jnp.float32
            )
            y = y * weight
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (x.shape[-1],), jnp.float32
            )
            y = y + bias
        return y.astype(self.dtype)


class AdaLayerNormZero(nn.Module):
    """AdaLN-Zero: t(256) -> (shift, scale, gate); affine-free LayerNorm
    (primitives/adaptive_layer_norm_zero.py:12-21)."""

    eps: float = 1e-8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dim = x.shape[-1]
        mod = Linear(3 * dim, dtype=self.dtype, name="linear")(
            jax.nn.silu(t[..., None, :])
        )
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        x = LayerNorm(
            eps=self.eps, use_scale=False, use_bias=False, dtype=self.dtype, name="norm"
        )(x)
        return x * (1 + scale) + shift, gate


class FeedForward(nn.Module):
    """LLaMA SwiGLU MLP; hidden = 2/3 * 4d rounded up to 128
    (primitives/feed_forward.py:17-31)."""

    hidden_dim: Optional[int] = None
    multiple_of: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        hidden = self.hidden_dim if self.hidden_dim is not None else 4 * dim
        hidden = int(2 * hidden / 3)
        hidden = self.multiple_of * ((hidden + self.multiple_of - 1) // self.multiple_of)
        # w1/w3 share x: one fused matmul (one HBM read of x, not two)
        w1, w3 = fused_linear(
            x,
            [
                LinearParams(hidden, use_bias=False, name="w1")(dim),
                LinearParams(hidden, use_bias=False, name="w3")(dim),
            ],
            self.dtype,
        )
        return Linear(dim, use_bias=False, dtype=self.dtype, name="w2")(
            jax.nn.silu(w1) * w3
        )


class Transition(nn.Module):
    """RMSNorm + SwiGLU transition (primitives/transitions.py:10-18)."""

    eps: float = 1e-8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x_norm = RMSNorm(eps=self.eps, dtype=self.dtype, name="ffn_norm")(x)
        return FeedForward(dtype=self.dtype, name="feed_forward")(x_norm)


class DiTTransition(nn.Module):
    """AdaLN-Zero-modulated transition (primitives/transitions.py:21-31)."""

    eps: float = 1e-8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        x_norm, gate = AdaLayerNormZero(eps=self.eps, dtype=self.dtype, name="ffn_norm")(x, t)
        return FeedForward(dtype=self.dtype, name="feed_forward")(x_norm) * gate


class OuterProductMean(nn.Module):
    """MSA -> pair outer-product update (primitives/outer_product_mean.py).

    Note: despite the name this is an outer-product *sum* over MSA rows
    (einsum "...bic,...bjd->...ijcd" contracts b without normalization),
    followed by a zero-init projection and RMSNorm — reproduced exactly.
    """

    c_z: int
    c_hidden: int = 32
    eps: float = 1e-8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, m):
        m_norm = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_in")(m)
        q = Linear(self.c_hidden, dtype=self.dtype, name="linear_q")(m_norm)
        k = Linear(self.c_hidden, dtype=self.dtype, name="linear_k")(m_norm)
        outer = jnp.einsum("...bic,...bjd->...ijcd", q, k)
        outer = outer.reshape(outer.shape[:-2] + (self.c_hidden * self.c_hidden,))
        outer = Linear(self.c_z, init="final", dtype=self.dtype, name="linear_o")(outer)
        return RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_out")(outer)


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int = 256,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Diffusers-lineage sinusoidal embedding
    (primitives/timestep_embeddings.py:36-90 with flip_sin_to_cos=True,
    shift=0 as instantiated at :156-166)."""
    half = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class TimestepEmbeddings(nn.Module):
    """Sinusoidal projection + 2-layer MLP (timestep_embeddings.py:156-166)."""

    embedding_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps):
        proj = sinusoidal_timestep_embedding(timesteps, self.embedding_dim)
        h = Linear(self.embedding_dim, dtype=self.dtype, name="linear_1")(
            proj.astype(self.dtype)
        )
        return Linear(self.embedding_dim, dtype=self.dtype, name="linear_2")(
            jax.nn.silu(h)
        )
