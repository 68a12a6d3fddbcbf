"""Manual-DMA head-folded flash attention: bias tile resident across the
batch axis.

Traffic analysis of v1 (flash_attention_folded.py) at its production
shape (B=20, S=2048, H=4, D=32, bf16):

    bias [H, S, S] re-fetched per (group, q-tile) cell:  ~670 MB / call
    k/v / q / o:                                          ~60 MB / call

i.e. the SHARED bias dominates HBM traffic 10:1 — the kernel measured
2.94 ms is ~3x off its roofline because the same bias bytes stream in
B/group times.  Mosaic's block pipeline does not elide re-fetches of a
revisited block (measured round 2: swap_grid made no difference), so v2
forces residency by hand:

  * grid is (q_tiles, batch_groups): q OUTER, so one bias q-slab serves
    all batch groups before moving on;
  * bias lives in ANY (HBM) and is DMA'd once per q-tile into a VMEM
    scratch at group==0 — groups > 0 reuse the resident tile;
  * k/v/q/o use ordinary pipelined BlockSpecs (they are the cheap axis).

Expected traffic: bias 67 MB + k/v ~170 MB + q/o ~40 MB => ~2.5x less.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physdock_tpu.ops.flash_attention_folded import _pick_bk


def _kernel_v2(
    q_ref, k_ref, v_ref, b_hbm, o_ref, b_vmem, sem, *, scale, s_k, bk,
    group, h, d, bq,
):
    i = pl.program_id(0)  # q-tile index (outer)
    hd = h * d
    num_k = s_k // bk
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1)

    @pl.when(pl.program_id(1) == 0)
    def _load_bias():
        dma = pltpu.make_async_copy(
            b_hbm.at[:, pl.ds(i * bq, bq), :], b_vmem, sem
        )
        dma.start()
        dma.wait()

    def per_sample(s, _):
        q = q_ref[s].astype(jnp.float32)  # [bq, HD]
        o = jnp.zeros((bq, hd), jnp.float32)
        for hh in range(h):  # static unroll; H is small (4)
            mask = ((lane >= hh * d) & (lane < (hh + 1) * d)).astype(
                jnp.float32
            )

            def body(kk, carry):
                acc, m_prev, l_prev = carry
                k = k_ref[s, pl.ds(kk * bk, bk), :].astype(jnp.float32) * mask
                v = v_ref[s, pl.ds(kk * bk, bk), :].astype(jnp.float32) * mask
                b = b_vmem[hh, :, pl.ds(kk * bk, bk)].astype(jnp.float32)
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
            o = o + acc / l
        o_ref[s] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, per_sample, 0)


def pick_tiles_folded_v2(n_batch, s_q, s_k, hd, h, itemsize: int = 2):
    """(bq, group) for the manual-DMA kernel.  VMEM: resident bias scratch
    (not double-buffered — manual DMA) + pipelined k/v/q/o blocks."""
    for bq, group in ((256, 2), (256, 1), (128, 4), (128, 2), (128, 1)):
        if s_q % bq or n_batch % group:
            continue
        bias = h * bq * s_k * itemsize  # resident scratch, single copy
        kv = 2 * 2 * group * s_k * hd * itemsize
        qo = 2 * 2 * group * bq * hd * itemsize
        if bias + kv + qo < 13_500_000:
            return bq, group
    return 0, 0


def flash_sdpa_folded_v2(
    q, k, v, bias, n_heads: int, interpret: bool = False,
    bq: int = 0, group: int = 0,
):
    """q, k, v: [B, S, H*D] folded layout; bias: [H, S_q, S_k] shared
    across B.  Returns [B, S_q, H*D] in q.dtype."""
    n_batch, s_q, hd = q.shape
    s_k = k.shape[-2]
    h = n_heads
    d = hd // h
    assert h * d == hd
    assert bias.shape == (h, s_q, s_k), (bias.shape, (h, s_q, s_k))
    if not (bq and group):
        bq, group = pick_tiles_folded_v2(
            n_batch, s_q, s_k, hd, h, q.dtype.itemsize
        )
    if group == 0:
        raise ValueError("no v2 tiling fits VMEM")
    bk = _pick_bk(s_k)

    kernel = functools.partial(
        _kernel_v2, scale=1.0 / math.sqrt(d), s_k=s_k, bk=bk, group=group,
        h=h, d=d, bq=bq,
    )
    grid = (s_q // bq, n_batch // group)  # q OUTER, batch-group inner
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (group, bq, hd), lambda i, g: (g, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, s_k, hd), lambda i, g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group, s_k, hd), lambda i, g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # bias stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (group, bq, hd), lambda i, g: (g, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_batch, s_q, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, bq, s_k), bias.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(q, k, v, bias)
