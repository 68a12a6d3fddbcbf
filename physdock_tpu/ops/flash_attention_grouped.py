"""Sample-grouped Pallas flash attention: shared bias, batched samples.

The diffusion denoiser runs B samples through attention whose pair bias is
IDENTICAL across samples (one [H, S, S] bias per block).  The plain flash
kernel (ops/flash_attention.py) re-reads the bias tile for every sample —
at 20 samples x 2048 atoms that bias traffic dominates sampler HBM time.

This kernel grids over (sample_chunks, heads, q_tiles); each program loads
one bias tile and loops over G samples in VMEM, cutting bias reads by G.
G is chosen to fit VMEM — note the lane dim pads D=32 up to 128, so a
[G, S, D] block really costs G*S*128*itemsize.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128
_VMEM_BUDGET = 10_000_000  # leave headroom under the 16MB scoped limit


def _pick_bk(s_k: int) -> int:
    for bk in (512, 256, 128):
        if s_k % bk == 0:
            return bk
    raise ValueError(f"s_k={s_k} must be a multiple of 128")


def pick_group_size(n_batch: int, s_k: int, d: int, itemsize: int = 2) -> int:
    """Largest divisor of n_batch whose buffers fit the VMEM budget."""
    d_padded = max(d, 128)  # lane padding
    bias_cost = 2 * BQ * s_k * itemsize  # double-buffered bias tile

    def cost(g):
        kv = 2 * 2 * g * s_k * d_padded * itemsize  # k+v, double-buffered
        qo = 2 * 2 * g * BQ * d_padded * itemsize  # q + out blocks
        return kv + qo + bias_cost

    for g in sorted(
        {x for x in range(1, n_batch + 1) if n_batch % x == 0}, reverse=True
    ):
        if cost(g) < _VMEM_BUDGET:
            return g
    return 0


def _kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, s_k, bk, group):
    BK = bk
    num_k = s_k // BK

    def per_sample(s, _):
        q = q_ref[s, 0].astype(jnp.float32)  # [BQ, D]

        def body(i, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[s, 0, pl.ds(i * BK, BK), :].astype(jnp.float32)
            v = v_ref[s, 0, pl.ds(i * BK, BK), :].astype(jnp.float32)
            b = b_ref[0, :, pl.ds(i * BK, BK)].astype(jnp.float32)
            logits = (
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + b
            )
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.dot(p, v, preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        d = q.shape[-1]
        acc0 = jnp.zeros((BQ, d), jnp.float32)
        m0 = jnp.full((BQ, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((BQ, 1), jnp.float32)
        acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
        o_ref[s, 0] = (acc / l).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per_sample, 0)


def flash_sdpa_grouped(q, k, v, bias, interpret: bool = False):
    """q, k, v: [B, H, S, D]; bias: [H, S_q, S_k] shared across B.

    Returns [B, H, S_q, D] in q.dtype.
    """
    n_batch, h, s_q, d = q.shape
    s_k = k.shape[-2]
    assert bias.shape == (h, s_q, s_k), (bias.shape, (h, s_q, s_k))
    group = pick_group_size(n_batch, s_k, d, q.dtype.itemsize)
    if group == 0:
        raise ValueError("no sample group size fits VMEM")

    grid = (n_batch // group, h, s_q // BQ)
    bk = _pick_bk(s_k)
    kernel = functools.partial(
        _kernel, scale=1.0 / math.sqrt(d), s_k=s_k, bk=bk, group=group
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (group, 1, BQ, d), lambda g, hh, i: (g, hh, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, 1, s_k, d), lambda g, hh, i: (g, hh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, 1, s_k, d), lambda g, hh, i: (g, hh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BQ, s_k), lambda g, hh, i: (hh, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (group, 1, BQ, d), lambda g, hh, i: (g, hh, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_batch, h, s_q, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)
