"""Head-folded flash attention (round-2 candidate kernel).

HBM stores [..., S, 32]-wide per-head tensors tile-padded to 128 lanes —
4x wasted q/k/v read bandwidth in the other kernels.  This variant keeps
q/k/v in their natural projection layout [B, S, H*D] (H*D is 128 or 512
here — no padding), slices per-head lanes INSIDE VMEM, and shares the
[H, S, S] bias across the sample batch like the grouped kernel.

STATUS (round 1): passes interpreter-mode parity but Mosaic REJECTS the
32-wide lane slices on real TPU ("cannot statically prove that index in
dimension 2 is a multiple of 128" — lane slicing must be 128-aligned).
Round-2 redesign: per-head logits via masked full-K matmuls
(q_full @ (k_full * head_mask)^T), which also fills the MXU's K dimension.
Not wired into the dispatcher.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128
_VMEM_BUDGET = 10_000_000


def _pick_bk(s_k: int) -> int:
    for bk in (512, 256, 128):
        if s_k % bk == 0:
            return bk
    raise ValueError(f"s_k={s_k} must be a multiple of 128")


def pick_group_size(n_batch: int, s_k: int, hd: int, itemsize: int = 2) -> int:
    """Largest divisor of n_batch fitting VMEM with folded [*, S, H*D] blocks."""
    bias_cost = 2 * BQ * s_k * itemsize

    def cost(g):
        kv = 2 * 2 * g * s_k * hd * itemsize
        qo = 2 * 2 * g * BQ * hd * itemsize
        return kv + qo + bias_cost

    for g in sorted(
        {x for x in range(1, n_batch + 1) if n_batch % x == 0}, reverse=True
    ):
        if cost(g) < _VMEM_BUDGET:
            return g
    return 0


def flash_sdpa_folded(q, k, v, bias, num_heads: int, interpret: bool = False):
    """q, k, v: [B, S, H*D] folded; bias: [H, S_q, S_k] shared across B.

    Returns [B, S_q, H*D] in q.dtype.

    NOTE: the current grid is (sample_chunks, q_tiles) with the full [H,
    BQ, S_k] bias block resident; per-head bias slicing happens inside.
    """
    n_batch, s_q, hd = q.shape
    h = num_heads
    d = hd // h
    s_k = k.shape[-2]
    assert bias.shape == (h, s_q, s_k)
    group = pick_group_size(n_batch, s_k, hd, q.dtype.itemsize)
    if group == 0:
        raise ValueError("no group size fits VMEM")

    # heads iterate FASTEST so the revisited q/out blocks stay resident and
    # flush once per (chunk, q-tile) with every head's lanes written; k/v
    # blocks (indexed by chunk only) are fetched once per chunk.
    grid = (n_batch // group, s_q // BQ, h)
    bk = _pick_bk(s_k)

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
        BK = bk
        num_k = s_k // BK
        hh = pl.program_id(2)

        def per_sample(s, _):
            q_t = q_ref[s, :, pl.ds(hh * d, d)].astype(jnp.float32)

            def body(i, carry):
                acc, m_prev, l_prev = carry
                k_t = k_ref[s, pl.ds(i * BK, BK), pl.ds(hh * d, d)].astype(jnp.float32)
                v_t = v_ref[s, pl.ds(i * BK, BK), pl.ds(hh * d, d)].astype(jnp.float32)
                b_t = b_ref[0, :, pl.ds(i * BK, BK)].astype(jnp.float32)
                logits = (
                    jax.lax.dot_general(
                        q_t, k_t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * (1.0 / math.sqrt(d))
                    + b_t
                )
                m_cur = jnp.max(logits, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(logits - m_new)
                corr = jnp.exp(m_prev - m_new)
                l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
                acc = acc * corr + jnp.dot(
                    p, v_t, preferred_element_type=jnp.float32
                )
                return acc, m_new, l_new

            acc0 = jnp.zeros((BQ, d), jnp.float32)
            m0 = jnp.full((BQ, 1), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((BQ, 1), jnp.float32)
            acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
            o_ref[s, :, pl.ds(hh * d, d)] = (acc / l).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, group, per_sample, 0)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (group, BQ, hd), lambda g, i, hh: (g, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, s_k, hd), lambda g, i, hh: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, s_k, hd), lambda g, i, hh: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BQ, s_k), lambda g, i, hh: (hh, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (group, BQ, hd), lambda g, i, hh: (g, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_batch, s_q, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)
