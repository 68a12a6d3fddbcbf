"""Pallas flash-attention kernel correctness (interpreter mode on CPU).

The on-chip validation lives in scripts/check_flash_tpu.py; this test runs
the same kernel through the Pallas interpreter so CI (CPU) covers the
kernel logic: online-softmax accumulation, bias broadcast replay, key
tiling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physdock_tpu.ops.attention import sdpa_xla
from physdock_tpu.ops.flash_attention import flash_sdpa


@pytest.mark.parametrize(
    "shape,bias_lead",
    [
        ((1, 2, 128, 128, 32), "full"),
        ((2, 2, 128, 256, 32), "shared"),  # bias [H,S,S] shared over batch
        ((1, 1, 256, 512, 64), "full"),   # multiple key tiles
    ],
)
def test_flash_matches_xla_interpret(shape, bias_lead):
    b, h, sq, sk, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, sk, d), jnp.float32)
    if bias_lead == "full":
        bias = jax.random.normal(ks[3], (b, h, sq, sk), jnp.float32)
    else:
        bias = jax.random.normal(ks[3], (h, sq, sk), jnp.float32)
    ref = sdpa_xla(q, k, v, bias)
    out = flash_sdpa(q, k, v, bias, interpret=True)
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=2e-5), (
        np.abs(np.asarray(ref) - np.asarray(out)).max()
    )


def test_flash_masked_rows_interpret():
    """-1e9 masked keys vanish; fully-masked rows stay finite."""
    b, h, s, d = 1, 1, 128, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    bias = jnp.zeros((b, h, s, s)).at[..., 64:].set(-1e9)
    out = flash_sdpa(q, k, v, bias, interpret=True)
    ref = sdpa_xla(q, k, v, bias)
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=2e-5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_grouped_flash_matches_xla_interpret():
    """Sample-grouped kernel: one [H,S,S] bias shared by a sample batch."""
    from physdock_tpu.ops.flash_attention_grouped import flash_sdpa_grouped

    b, h, s, d = 4, 2, 128, 32
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, s, s), jnp.float32)
    ref = sdpa_xla(q, k, v, bias)
    out = flash_sdpa_grouped(q, k, v, bias, interpret=True)
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=2e-5), (
        np.abs(np.asarray(ref) - np.asarray(out)).max()
    )


def test_folded_flash_matches_xla_interpret():
    """Head-folded v3 kernel ([B, S, H*D], masked full-width matmuls —
    Mosaic-compilable, unlike the round-1 lane-sliced version)."""
    from physdock_tpu.ops.flash_attention_folded import (
        flash_sdpa_folded_from_split,
    )

    b, h, s, d = 4, 4, 256, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    qh = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    kh = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    vh = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, s, s), jnp.float32)
    ref = sdpa_xla(qh, kh, vh, bias)
    out = flash_sdpa_folded_from_split(qh, kh, vh, bias, interpret=True)
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=2e-5), (
        np.abs(np.asarray(ref) - np.asarray(out)).max()
    )


def test_folded_flash_gradients_flow():
    """Dispatcher path: backward recomputes via XLA semantics."""
    from physdock_tpu.ops.attention import _folded_diff

    b, h, s, d = 2, 4, 256, 32
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    qh = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    kh = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    vh = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, s, s), jnp.float32)

    def loss_ref(q, k, v, bi):
        return jnp.sum(sdpa_xla(q, k, v, bi[None]) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 3))(qh, kh, vh, bias)
    # _folded_diff runs the Pallas kernel forward; on CPU that cannot
    # compile, so check the VJP wiring shape-level via eval_shape
    def loss_k(q, k, v, bi):
        return jnp.sum(_folded_diff(q, k, v, bi) ** 2)

    shapes = jax.eval_shape(jax.grad(loss_k, argnums=(0, 3)), qh, kh, vh, bias)
    assert shapes[0].shape == qh.shape and shapes[1].shape == bias.shape
    assert np.isfinite(np.asarray(g_ref[0])).all()


def test_pallas_backward_matches_vjp_interpret():
    """Fused Pallas backward (dq/dk/dv/dbias, batch-reduced bias grad)
    against jax.vjp of the XLA reference, interpret mode."""
    from physdock_tpu.ops.flash_attention_bwd import flash_bwd, flash_fwd_lse

    b, h, s, d = 3, 2, 256, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, s, s), jnp.float32)
    do = jax.random.normal(ks[4], (b, h, s, d), jnp.float32)

    o, m, l = flash_fwd_lse(q, k, v, bias, interpret=True)
    ref = sdpa_xla(q, k, v, bias[None])
    assert np.abs(np.asarray(o - ref)).max() < 2e-5

    dq, dk, dv, db = flash_bwd(q, k, v, bias, o, m, l, do, interpret=True)
    _, vjp = jax.vjp(lambda a, b_, c, d_: sdpa_xla(a, b_, c, d_[None]), q, k, v, bias)
    rq, rk, rv, rb = vjp(do)
    for name, a, r in [("dq", dq, rq), ("dk", dk, rk), ("dv", dv, rv), ("dbias", db, rb)]:
        err = np.abs(np.asarray(a) - np.asarray(r)).max()
        assert err < 5e-4, (name, err)


def test_folded_v3_stacked_heads_matches_xla_interpret():
    """Stacked-head folded kernel (lane-masked q, unmasked k/v, diagonal
    block extraction) vs the XLA reference, interpret mode."""
    from physdock_tpu.ops.flash_attention_folded_v3 import flash_sdpa_folded_v3

    b, h, s, d = 4, 4, 256, 32
    hd = h * d
    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    q = jax.random.normal(ks[0], (b, s, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, hd), jnp.float32)
    bias = jax.random.normal(ks[3], (h, s, s), jnp.float32)

    def split(x):
        return jnp.transpose(x.reshape(b, s, h, d), (0, 2, 1, 3))

    ref = jnp.transpose(
        sdpa_xla(split(q), split(k), split(v), bias[None]), (0, 2, 1, 3)
    ).reshape(b, s, hd)
    got = flash_sdpa_folded_v3(q, k, v, bias, h, interpret=True, bq=128, group=2)
    assert np.abs(np.asarray(got - ref)).max() < 2e-5


def test_pallas_backward_masked_rows_interpret():
    """Regression: fully-masked query rows (padding atoms, -1e9 bias) must
    not blow up the fused backward.  The old backward recomputed
    p = exp(logits - lse) with lse = m + log(l) fused in one fp32; at
    m = -1e9 the log(l) term is below ulp(1e9) = 64, the cancellation
    loses it, and p came out ~1 instead of 1/l — gradients 10-60x too
    big wherever padding existed, which silently poisoned every training
    step at padded atom buckets (round-5 256/2048 plateau)."""
    from physdock_tpu.ops.flash_attention_bwd import flash_bwd, flash_fwd_lse

    b, h, s, d = 2, 2, 256, 32
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    bias = 0.5 * jax.random.normal(ks[3], (h, s, s), jnp.float32)
    pad = np.zeros((s,), np.float32)
    pad[-8:] = 1.0  # last 8 positions are padding
    bias = bias - 1e9 * pad[None, None, :]  # masked keys
    bias = bias - 1e9 * pad[None, :, None]  # masked query rows (fully)
    do = jax.random.normal(ks[4], (b, h, s, d), jnp.float32)

    o, m, l = flash_fwd_lse(q, k, v, bias, interpret=True)
    dq, dk, dv, db = flash_bwd(q, k, v, bias, o, m, l, do, interpret=True)
    _, vjp = jax.vjp(
        lambda a, b_, c, d_: sdpa_xla(a, b_, c, d_[None]), q, k, v, bias
    )
    for name, a, r in zip(("dq", "dk", "dv", "dbias"), (dq, dk, dv, db), vjp(do)):
        err = np.abs(np.asarray(a) - np.asarray(r)).max()
        assert err < 5e-4, (name, err)
