"""Head-folded Pallas flash attention: q/k/v in [B, S, H*D] layout.

Motivation (round-1 finding): with per-head layout [B, H, S, D] and D=32,
every k/v tile pads 32 real lanes to 128 — 4x wasted HBM traffic — and the
grid revisits k/v once per head.  Folding the heads into the lane axis
(H*D = 128 for the model's head_dim=32, 4-head stacks) makes every byte
read real AND loads k/v once for ALL heads.

Mosaic cannot slice 32-lane sub-ranges (128-lane minimum granularity), so
per-head attention uses MASKED FULL-WIDTH matmuls:

    logits_h = q @ (k * lane_mask_h)^T       # contributions of other
    acc_h   += p_h @ (v * lane_mask_h)       # heads' lanes are zeroed

The MXU contracts all 128 lanes either way (it would for padded D=32
too), so the masked matmuls cost the SAME MXU time as the per-head
kernel while reading 4x less.  Each head's output lands in its own lane
range, so the per-head accumulators sum into one folded [BQ, H*D] tile.

The folded layout is also the NATIVE output of the qkv projections
(Linear emits [.., S, H*D] before any head split), so callers can skip
the split/transpose entirely.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128
# single VMEM budget shared by the dispatcher gate and the runtime tile
# picker (ADVICE r2: two different cost models made flash_sdpa_folded raise
# "no group size fits VMEM" at trace time for shapes the gate admitted)
_VMEM_BUDGET = 13_500_000


def _pick_bk(s_k: int) -> int:
    for bk in (512, 256, 128):
        if s_k % bk == 0:
            return bk
    raise ValueError(f"s_k={s_k} must be a multiple of 128")


def _vmem_cost(bq: int, group: int, s_k: int, hd: int, h: int, itemsize: int) -> int:
    """Double-buffered VMEM footprint of one grid cell."""
    bias = 2 * h * bq * s_k * itemsize
    kv = 2 * 2 * group * s_k * hd * itemsize
    qo = 2 * 2 * group * bq * hd * itemsize
    return bias + kv + qo


def pick_tiles_folded(
    n_batch: int, s_q: int, s_k: int, hd: int, h: int, itemsize: int = 2
):
    """(bq, group) by on-chip tuning (scripts/folded_tune_tpu.py at B=20,
    S=2048, bf16: bq256/g2 2.94 ms vs bq128/g4 3.61 ms; larger configs
    exceed VMEM and fail Mosaic compilation).

    Short sequences (the trunk's S=256 triangle attention) keep the
    max-group BQ=128 tiling the trunk was measured with (65 ms trunk)."""
    if s_k < 1024:
        group = pick_group_size_folded(n_batch, s_k, hd, h, itemsize)
        if group and s_q % BQ == 0:
            return BQ, group
        return 0, 0
    for bq, group in ((256, 2), (128, 4), (128, 2), (128, 1)):
        if (
            s_q % bq == 0
            and group <= n_batch
            and n_batch % group == 0
            and _vmem_cost(bq, group, s_k, hd, h, itemsize) < _VMEM_BUDGET
        ):
            return bq, group
    return 0, 0


def pick_group_size_folded(
    n_batch: int, s_k: int, hd: int, h: int, itemsize: int = 2
) -> int:
    """Largest divisor of n_batch whose folded buffers fit VMEM (same
    `_vmem_cost` model and budget as `pick_tiles_folded`)."""
    for g in sorted(
        {x for x in range(1, n_batch + 1) if n_batch % x == 0}, reverse=True
    ):
        if _vmem_cost(BQ, g, s_k, hd, h, itemsize) < _VMEM_BUDGET:
            return g
    return 0


def _kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, s_k, bk, group, h, d):
    BK = bk
    hd = h * d
    bq = q_ref.shape[1]
    num_k = s_k // BK
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1)

    def per_sample(s, _):
        q = q_ref[s].astype(jnp.float32)  # [bq, HD]
        o = jnp.zeros((bq, hd), jnp.float32)
        for hh in range(h):  # static unroll; H is small (4)
            mask = ((lane >= hh * d) & (lane < (hh + 1) * d)).astype(jnp.float32)

            def body(i, carry):
                acc, m_prev, l_prev = carry
                k = k_ref[s, pl.ds(i * BK, BK), :].astype(jnp.float32) * mask
                v = v_ref[s, pl.ds(i * BK, BK), :].astype(jnp.float32) * mask
                b = b_ref[hh, :, pl.ds(i * BK, BK)].astype(jnp.float32)
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
                acc = acc * corr + jnp.dot(
                    p, v, preferred_element_type=jnp.float32
                )
                return acc, m_new, l_new

            acc0 = jnp.zeros((bq, hd), jnp.float32)
            m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((bq, 1), jnp.float32)
            acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
            # head hh's lanes are the only nonzero columns of acc
            o = o + acc / l
        o_ref[s] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per_sample, 0)


def flash_sdpa_folded(
    q, k, v, bias, n_heads: int, interpret: bool = False,
    bq: int = BQ, group: int = 0, swap_grid: bool = False,
):
    """q, k, v: [B, S, H*D] folded layout; bias: [H, S_q, S_k] shared
    across B.  Returns [B, S_q, H*D] in q.dtype.

    bq/group/swap_grid are tuning knobs (scripts/folded_tune_tpu.py):
    swap_grid makes the q-tile axis OUTER so the shared bias tile is
    fetched once per q-tile (k/v then re-fetch per group step); default
    keeps k/v constant across the inner q-tile axis."""
    n_batch, s_q, hd = q.shape
    s_k = k.shape[-2]
    h = n_heads
    d = hd // h
    assert h * d == hd
    assert bias.shape == (h, s_q, s_k), (bias.shape, (h, s_q, s_k))
    if not group:
        bq, group = pick_tiles_folded(
            n_batch, s_q, s_k, hd, h, q.dtype.itemsize
        )
    if group == 0:
        raise ValueError("no group size fits VMEM")

    bk = _pick_bk(s_k)
    kernel = functools.partial(
        _kernel, scale=1.0 / math.sqrt(d), s_k=s_k, bk=bk, group=group,
        h=h, d=d,
    )
    if swap_grid:
        grid = (s_q // bq, n_batch // group)
        ix_q = lambda i, g: (g, i, 0)
        ix_kv = lambda i, g: (g, 0, 0)
        ix_b = lambda i, g: (0, i, 0)
    else:
        grid = (n_batch // group, s_q // bq)
        ix_q = lambda g, i: (g, i, 0)
        ix_kv = lambda g, i: (g, 0, 0)
        ix_b = lambda g, i: (0, i, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, bq, hd), ix_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s_k, hd), ix_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((group, s_k, hd), ix_kv, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, bq, s_k), ix_b, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, bq, hd), ix_q, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_batch, s_q, hd), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def flash_sdpa_folded_from_split(q, k, v, bias, interpret: bool = False):
    """Drop-in wrapper for per-head [B, H, S, D] inputs: folds, runs the
    folded kernel, unfolds.  (The fold transposes are one O(S*HD) pass —
    far cheaper than the per-head kernel's repeated padded reads.)"""
    n_batch, h, s_q, d = q.shape
    s_k = k.shape[-2]

    def fold(x, s):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(n_batch, s, h * d)

    o = flash_sdpa_folded(
        fold(q, s_q), fold(k, s_k), fold(v, s_k), bias, h, interpret=interpret
    )
    return jnp.transpose(o.reshape(n_batch, s_q, h, d), (0, 2, 1, 3))
