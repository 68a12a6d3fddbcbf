"""Pallas flash-attention BACKWARD (dq, dk, dv, dbias) for the shared-bias
sample-batched case.

The training step previously re-ran attention through XLA semantics in the
backward pass, materializing [B, H, S, S] fp32 probabilities in HBM twice
— at 48 diffusion samples x 2048 atoms that is ~3 GB per materialization
and dominates training HBM traffic.  This kernel recomputes probability
tiles in VMEM from (q, k, bias, lse) like the forward, so nothing S x S
ever reaches HBM:

    D_i   = sum_d dO_id O_id
    P_ij  = exp(q_i k_j / sqrt(d) + b_ij - lse_i)
    dV_j  = sum_i P_ij dO_i
    dS_ij = P_ij * (dO_i . v_j - D_i)
    dQ_i  = sum_j dS_ij k_j / sqrt(d)
    dK_j  = sum_i dS_ij q_i / sqrt(d)
    dB_ij = sum_batch dS_ij              (bias shared across the batch)

Two kernels over per-head layout [B, H, S, D]:
  * _bwd_q: grid (B, H, S_q/BQ)  -> dq tiles + dbias partials
  * _bwd_kv: grid (B, H, S_k/BK) -> dk, dv tiles
dbias accumulates across the batch grid axis by revisiting the same
output block (sequential TPU grid; initialized on the first visit).
The forward pass additionally returns lse = m + log(l) per row.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128
BK = 128


def flash_fwd_lse(q, k, v, bias, interpret: bool = False):
    """Forward with softmax stats. q/k/v: [B, H, S, D]; bias [H, S, S].

    Returns (o [B,H,S,D], m [B,H,S], l [B,H,S]): the row max and row
    normalizer SEPARATELY, not fused as lse = m + log(l).  The backward
    recomputes p = exp(logits - m) / l; with -1e9 mask biases the m
    subtraction cancels the -1e9 exactly (both operands round to the same
    fp32), whereas a fused lse loses log(l) below ulp(1e9) = 64 and the
    recomputed p explodes to 1 instead of 1/l on fully-masked rows —
    which poisoned every gradient at padded atom buckets (round-5
    256/2048 training plateau).
    """
    n_batch, h, s_q, d = q.shape
    s_k = k.shape[-2]
    assert bias.shape == (h, s_q, s_k)
    scale = 1.0 / math.sqrt(d)

    def kernel(q_ref, k_ref, v_ref, b_ref, o_ref, m_ref, l_ref):
        q_ = q_ref[0, 0].astype(jnp.float32)
        num_k = s_k // BK

        def body(i, carry):
            acc, m_prev, l_prev = carry
            k_ = k_ref[0, 0, pl.ds(i * BK, BK), :].astype(jnp.float32)
            v_ = v_ref[0, 0, pl.ds(i * BK, BK), :].astype(jnp.float32)
            b_ = b_ref[0, :, pl.ds(i * BK, BK)].astype(jnp.float32)
            logits = (
                jax.lax.dot_general(
                    q_, k_, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
                + b_
            )
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.dot(p, v_, preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        acc0 = jnp.zeros((BQ, d), jnp.float32)
        m0 = jnp.full((BQ, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((BQ, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
        o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
        m_ref[0, 0] = m.astype(jnp.float32)
        l_ref[0, 0] = l.astype(jnp.float32)

    o, m, l = pl.pallas_call(
        kernel,
        grid=(n_batch, h, s_q // BQ),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, d), lambda b, hh, i: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_k, d), lambda b, hh, i: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_k, d), lambda b, hh, i: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, s_k), lambda b, hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BQ, d), lambda b, hh, i: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, hh, i: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, hh, i: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_batch, h, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((n_batch, h, s_q, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_batch, h, s_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias)
    return o, m[..., 0], l[..., 0]


def _bwd_q_kernel(
    q_ref, k_ref, v_ref, b_ref, do_ref, m_ref, l_ref, delta_ref,
    dq_ref, db_ref, *, scale, s_k, n_batch,
):
    # grid is (h, q_tiles, batch) with batch FASTEST so the dbias block
    # stays resident in VMEM while the batch reduction accumulates into it
    b_idx = pl.program_id(2)
    q_ = q_ref[0, 0].astype(jnp.float32)
    do_ = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0].astype(jnp.float32)
    l_inv = 1.0 / l_ref[0, 0].astype(jnp.float32)
    delta = delta_ref[0, 0].astype(jnp.float32)
    num_k = s_k // BK

    @pl.when(b_idx == 0)
    def _init():
        db_ref[0] = jnp.zeros_like(db_ref[0])

    def body(i, dq):
        k_ = k_ref[0, 0, pl.ds(i * BK, BK), :].astype(jnp.float32)
        v_ = v_ref[0, 0, pl.ds(i * BK, BK), :].astype(jnp.float32)
        b_ = b_ref[0, :, pl.ds(i * BK, BK)].astype(jnp.float32)
        logits = (
            jax.lax.dot_general(
                q_, k_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + b_
        )
        # p = exp(logits - m) / l, NOT exp(logits - lse): subtracting the
        # stored row max cancels -1e9 mask biases exactly (see
        # flash_fwd_lse docstring)
        p = jnp.exp(logits - m) * l_inv
        dp = jax.lax.dot_general(
            do_, v_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        db_ref[0, :, pl.ds(i * BK, BK)] += ds.astype(db_ref.dtype)
        return dq + jnp.dot(ds, k_, preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, num_k, body, jnp.zeros_like(q_))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_kv_kernel(
    q_ref, k_ref, v_ref, b_ref, do_ref, m_ref, l_ref, delta_ref,
    dk_ref, dv_ref, *, scale, s_q,
):
    k_ = k_ref[0, 0].astype(jnp.float32)
    v_ = v_ref[0, 0].astype(jnp.float32)
    num_q = s_q // BQ

    def body(i, carry):
        dk, dv = carry
        q_ = q_ref[0, 0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        do_ = do_ref[0, 0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        m = m_ref[0, 0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        l_inv = 1.0 / l_ref[0, 0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        delta = delta_ref[0, 0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        b_ = b_ref[0, pl.ds(i * BQ, BQ), :].astype(jnp.float32)
        logits = (
            jax.lax.dot_general(
                q_, k_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + b_
        )
        p = jnp.exp(logits - m) * l_inv  # [BQ, BKblk]
        # dV += P^T dO
        dv = dv + jax.lax.dot_general(
            p, do_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_, v_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, q_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return dk, dv

    dk0 = jnp.zeros_like(k_)
    dv0 = jnp.zeros_like(v_)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def flash_bwd(q, k, v, bias, o, m, l, do, interpret: bool = False):
    """Backward for shared-bias attention.  Returns (dq, dk, dv, dbias).

    q/k/v/o/do: [B, H, S, D]; bias: [H, S_q, S_k]; m/l: [B, H, S_q] — the
    softmax row max and normalizer from flash_fwd_lse (kept separate so
    the probability recompute survives -1e9 mask biases).
    """
    n_batch, h, s_q, d = q.shape
    s_k = k.shape[-2]
    scale = 1.0 / math.sqrt(d)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [B, H, S_q, 1]
    m4 = m[..., None].astype(jnp.float32)
    l4 = l[..., None].astype(jnp.float32)

    kernel_q = functools.partial(
        _bwd_q_kernel, scale=scale, s_k=s_k, n_batch=n_batch
    )
    dq, dbias = pl.pallas_call(
        kernel_q,
        grid=(h, s_q // BQ, n_batch),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, d), lambda hh, i, b: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_k, d), lambda hh, i, b: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_k, d), lambda hh, i, b: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, s_k), lambda hh, i, b: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, d), lambda hh, i, b: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), lambda hh, i, b: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), lambda hh, i, b: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BQ, 1), lambda hh, i, b: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BQ, d), lambda hh, i, b: (b, hh, i, 0),
                         memory_space=pltpu.VMEM),
            # same dbias block across the (fastest) batch axis: accumulates
            pl.BlockSpec((1, BQ, s_k), lambda hh, i, b: (hh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_batch, h, s_q, d), q.dtype),
            jax.ShapeDtypeStruct((h, s_q, s_k), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias, do, m4, l4, delta)

    kernel_kv = functools.partial(_bwd_kv_kernel, scale=scale, s_q=s_q)
    dk, dv = pl.pallas_call(
        kernel_kv,
        grid=(n_batch, h, s_k // BK),
        in_specs=[
            pl.BlockSpec((1, 1, s_q, d), lambda b, hh, j: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, d), lambda b, hh, j: (b, hh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, d), lambda b, hh, j: (b, hh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_q, BK), lambda b, hh, j: (hh, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_q, d), lambda b, hh, j: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_q, 1), lambda b, hh, j: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_q, 1), lambda b, hh, j: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_q, 1), lambda b, hh, j: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, BK, d), lambda b, hh, j: (b, hh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, d), lambda b, hh, j: (b, hh, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_batch, h, s_k, d), q.dtype),
            jax.ShapeDtypeStruct((n_batch, h, s_k, d), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v, bias, do, m4, l4, delta)
    return dq, dk, dv, dbias
