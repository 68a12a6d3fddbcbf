"""Unit tests for trunk block algebra.

Locks two TPU-side optimizations to the reference semantics:
  * TriangleUpdate's transpose variant is expressed by re-indexing the
    triangle einsum instead of materializing z^T (attentions.py:139-171 in
    the reference transposes the tensor); the two forms must agree exactly.
  * Residual streams carried in compute dtype (bf16 on TPU) must stay close
    to the fp32 carry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physdock_tpu.nn.attentions import TriangleUpdate
from physdock_tpu.nn.transformers import Pairformer


def test_triangle_update_transpose_equivalence():
    """transpose=True == swap-in -> transpose=False -> swap-out (same params)."""
    S, C = 12, 64
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(S, S, C)), jnp.float32)
    mask = jnp.asarray((rng.random((S, S)) > 0.2), jnp.float32)

    mod_t = TriangleUpdate(transpose=True)
    mod_r = TriangleUpdate(transpose=False)
    params = mod_t.init(jax.random.PRNGKey(0), z, mask)
    # same module class & names -> params apply to both variants
    out_t = mod_t.apply(params, z, mask)
    ref = jnp.swapaxes(
        mod_r.apply(params, jnp.swapaxes(z, -2, -3), jnp.swapaxes(mask, -1, -2)),
        -2,
        -3,
    )
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref), atol=2e-5)


def test_triangle_update_transpose_equivalence_batched():
    """The einsum re-indexing must respect leading batch dims (vmapped VS)."""
    B, S, C = 2, 8, 32
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(B, S, S, C)), jnp.float32)
    mask = jnp.ones((B, S, S), jnp.float32)
    mod_t = TriangleUpdate(transpose=True)
    mod_r = TriangleUpdate(transpose=False)
    params = mod_t.init(jax.random.PRNGKey(0), z[0], mask[0])
    out_t = jax.vmap(lambda zz, mm: mod_t.apply(params, zz, mm))(z, mask)
    ref = jnp.swapaxes(
        jax.vmap(lambda zz, mm: mod_r.apply(params, zz, mm))(
            jnp.swapaxes(z, -2, -3), jnp.swapaxes(mask, -1, -2)
        ),
        -2,
        -3,
    )
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("seed", [0])
def test_bf16_residual_stream_close_to_fp32(seed):
    """Pairformer with bf16 compute/carry tracks the fp32 result.

    Guards the compute-dtype residual carry (nn/transformers.py::_res):
    a pathological divergence (e.g. accidental mask corruption or inf
    overflow in bf16) would blow well past this tolerance."""
    S, c_s, c_z = 16, 64, 32
    rng = np.random.default_rng(seed)
    s = jnp.asarray(rng.normal(size=(S, c_s)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(S, S, c_z)), jnp.float32)
    mask = jnp.ones((S, S), jnp.float32)

    pf32 = Pairformer(no_blocks=2, dtype=jnp.float32, attn_impl="xla")
    pf16 = Pairformer(no_blocks=2, dtype=jnp.bfloat16, attn_impl="xla")
    params = jax.jit(pf32.init)(jax.random.PRNGKey(0), s, z, mask)
    s32, z32 = jax.jit(pf32.apply)(params, s, z, mask)
    s16, z16 = jax.jit(pf16.apply)(params, s, z, mask)
    # bf16 has ~3 decimal digits; random-init activations are O(1)
    assert np.max(np.abs(np.asarray(s16, np.float32) - np.asarray(s32))) < 0.15
    assert np.max(np.abs(np.asarray(z16, np.float32) - np.asarray(z32))) < 0.15
