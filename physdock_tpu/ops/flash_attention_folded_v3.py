"""Stacked-head folded flash attention: zero per-head masking of k/v.

The v1 folded kernel (flash_attention_folded.py) is VPU-bound, not
HBM-bound.  A deleted manual-DMA experiment ("v2": bias tile DMA'd once
per q-tile into VMEM scratch and kept resident across batch groups,
eliminating ~90% of bias HBM traffic) measured the SAME ~3.0 ms at the
production shape (B=20, S=2048, H=4, D=32, bf16) — negative result: the
bottleneck is the per-head inner loop, which masks k AND v with the
head's lane mask on every k-step (h * 2 * s_k * hd multiplies per sample
per q-tile) and runs h sequential small matmuls.

v3 restructures so the lane mask is applied ONCE to q:

    q_stack [h*bq, hd]   row-block hh = q * lane_mask_hh   (tiny VPU)
    logits  [h*bq, bk]   = q_stack @ k^T      -- ONE matmul, k unmasked
    p       [h*bq, bk]   = online softmax rows (+ bias reshaped to rows)
    acc     [h*bq, hd]  += p @ v              -- ONE matmul, v unmasked
    o       [bq, hd]     = concat_h acc[hh*bq:(hh+1)*bq, hh*d:(hh+1)*d]

Lane masking q zeroes the cross-head contraction terms exactly as
masking k did (the contraction is bilinear), and the diagonal-block
extraction at the END picks each head's true output columns.  MXU work
is unchanged (the 4x lane redundancy is the price of the folded layout);
the per-k-step VPU work drops to softmax only.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physdock_tpu.ops.flash_attention_folded import _pick_bk


def _kernel_v3(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, s_k, bk,
               group, h, d):
    hd = h * d
    bq = q_ref.shape[1]
    num_k = s_k // bk
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1)

    def per_sample(s, _):
        q = q_ref[s].astype(jnp.float32)  # [bq, hd]
        # stacked lane-masked q: row block hh only keeps head hh's lanes
        head = jax.lax.broadcasted_iota(jnp.int32, (h, 1, 1), 0)
        mask = ((lane[None] >= head * d) & (lane[None] < (head + 1) * d))
        q_stack = (q[None] * mask.astype(jnp.float32)).reshape(h * bq, hd)

        def body(i, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[s, pl.ds(i * bk, bk), :].astype(jnp.float32)
            v = v_ref[s, pl.ds(i * bk, bk), :].astype(jnp.float32)
            b = (
                b_ref[:, :, pl.ds(i * bk, bk)]
                .astype(jnp.float32)
                .reshape(h * bq, bk)
            )
            logits = (
                jax.lax.dot_general(
                    q_stack, k, (((1,), (1,)), ((), ())),
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
            acc = acc * corr + jnp.dot(
                p, v, preferred_element_type=jnp.float32
            )
            return acc, m_new, l_new

        acc0 = jnp.zeros((h * bq, hd), jnp.float32)
        m0 = jnp.full((h * bq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((h * bq, 1), jnp.float32)
        acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
        acc = acc / l
        # diagonal-block extraction: head hh's output columns live in row
        # block hh; zero the rest and sum the blocks
        acc = acc.reshape(h, bq, hd)
        o = jnp.sum(jnp.where(mask, acc, 0.0), axis=0)
        o_ref[s] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per_sample, 0)


def pick_tiles_folded_v3(n_batch, s_q, s_k, hd, h, itemsize: int = 2):
    """(bq, group): VMEM = double-buffered bias/kv/qo blocks + the
    fp32 stacked accumulator/logits scratch (h*bq rows).

    bq128/g4 measured fastest at the production shape (2.77 ms vs v1's
    2.96 at B=20, S=2048; on-chip tune, round 3) — larger bq blows VMEM
    with the h*bq-row stacked accumulator."""
    for bq, group in ((128, 4), (128, 2), (128, 1)):
        if s_q % bq or n_batch % group:
            continue
        bias = 2 * h * bq * s_k * itemsize
        kv = 2 * 2 * group * s_k * hd * itemsize
        qo = 2 * 2 * group * bq * hd * itemsize
        stacked = 4 * h * bq * (hd + 512)  # fp32 acc + one logits tile
        if bias + kv + qo + stacked < 13_500_000:
            return bq, group
    return 0, 0


def flash_sdpa_folded_v3(
    q, k, v, bias, n_heads: int, interpret: bool = False,
    bq: int = 0, group: int = 0,
):
    """q, k, v: [B, S, H*D] folded; bias [H, S_q, S_k] shared across B."""
    n_batch, s_q, hd = q.shape
    s_k = k.shape[-2]
    h = n_heads
    d = hd // h
    assert h * d == hd
    assert bias.shape == (h, s_q, s_k), (bias.shape, (h, s_q, s_k))
    if not (bq and group):
        bq, group = pick_tiles_folded_v3(
            n_batch, s_q, s_k, hd, h, q.dtype.itemsize
        )
    if group == 0:
        raise ValueError("no v3 tiling fits VMEM")
    bk = _pick_bk(s_k)
    kernel = functools.partial(
        _kernel_v3, scale=1.0 / math.sqrt(d), s_k=s_k, bk=bk, group=group,
        h=h, d=d,
    )
    grid = (n_batch // group, s_q // bq)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, bq, hd), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s_k, hd), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s_k, hd), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, bq, s_k), lambda g, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, bq, hd), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_batch, s_q, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)
