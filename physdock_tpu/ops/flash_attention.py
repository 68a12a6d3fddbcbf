"""Pallas TPU fused attention kernel with additive bias.

Fuses logits = qk^T/sqrt(D) + bias, fp32 softmax, and the value matmul in
VMEM, so the [S, S] probability matrix never round-trips to HBM (the main
HBM-bandwidth cost of the atom-level attention stacks, where the reference
materializes full 2048x2048 SDPA probs per head —
PhysDock/models/layers/transformers.py:25-36).

The kernel tiles queries (grid over [batch*heads, S_q/BQ]) and streams keys
in BK-sized chunks with an online (running max / running sum) softmax, so
VMEM usage is O(BQ*BK + BQ*D) regardless of sequence length.

Bias may be per-(batch*head) or shared across a leading broadcast axis
(e.g. one [H, S, S] pair bias shared by many diffusion samples) — pass it
with that smaller leading axis and the index map replays it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128  # query tile


def _pick_bk(s_k: int) -> int:
    for bk in (512, 256, 128):
        if s_k % bk == 0:
            return bk
    raise ValueError(f"s_k={s_k} must be a multiple of 128")


def _flash_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, s_k, bk):
    BK = bk
    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    num_k = s_k // BK

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * BK, BK), :].astype(jnp.float32)  # [BK, D]
        v = v_ref[0, pl.ds(i * BK, BK), :].astype(jnp.float32)
        b = b_ref[0, :, pl.ds(i * BK, BK)].astype(jnp.float32)  # [BQ, BK]
        logits = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
            + b
        )
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q.shape[-1]
    acc0 = jnp.zeros((BQ, d), jnp.float32)
    m0 = jnp.full((BQ, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_sdpa(q, k, v, bias, interpret: bool = False):
    """q, k, v: [..., H, S, D]; bias broadcastable to [..., H, S, S].

    Returns [..., H, S_q, D] in q.dtype.
    """
    *batch, h, s_q, d = q.shape
    s_k = k.shape[-2]
    bh = math.prod(batch) * h
    qf = q.reshape(bh, s_q, d)
    kf = k.reshape(bh, s_k, d)
    vf = v.reshape(bh, s_k, d)

    # Collapse bias leading dims; keep a smaller leading axis if the bias is
    # broadcast over leading batch dims (e.g. one [H,S,S] pair bias shared by
    # all diffusion samples) so we don't materialize copies in HBM.
    if bias.ndim < 3:
        bias = jnp.broadcast_to(bias, (1, s_q, s_k))
    lead = math.prod(bias.shape[:-2])
    if bh % lead != 0:
        bias = jnp.broadcast_to(bias, tuple(batch) + (h, s_q, s_k))
        lead = bh
    bf = bias.reshape(lead, s_q, s_k)
    n_rep = bh // lead  # bias replays every `lead` heads

    grid = (bh, s_q // BQ)
    bk = _pick_bk(s_k)
    kernel = functools.partial(
        _flash_kernel, scale=1.0 / math.sqrt(d), s_k=s_k, bk=bk
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_k, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, BQ, s_k), lambda b, i: (b % lead if n_rep > 1 else b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, BQ, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bf)
    return out.reshape(*batch, h, s_q, d)
