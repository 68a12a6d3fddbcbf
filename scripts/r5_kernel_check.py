"""On-chip forward parity of the REAL attention dispatch path vs XLA at the
round-5 plateau shapes (toy/medium training at crop 256 / atom buckets
1344-1920, aug=8, bf16).

Training's custom-vjp kernels use jax.vjp(sdpa_xla) for backward, so a
wrong FORWARD at these shapes silently corrupts training while every
smaller-shape test stays green.  Checks _flash_pick (what training uses)
and each kernel individually, fp32 and bf16.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from physdock_tpu.ops.attention import _flash_pick, dot_product_attention, sdpa_xla

key = jax.random.PRNGKey(0)
fails = 0
for s in (1024, 1344, 1792, 1856, 1920, 2048):
    for dt in (jnp.float32, jnp.bfloat16):
        b, h, d = 8, 4, 32  # aug=8 samples, h*d = c_a = 128 (folded path)
        ks = jax.random.split(jax.random.fold_in(key, s), 4)
        q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32).astype(dt)
        k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32).astype(dt)
        v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32).astype(dt)
        bias = 0.5 * jax.random.normal(ks[3], (h, s, s), jnp.float32).astype(dt)
        ref = np.asarray(jax.jit(sdpa_xla)(q, k, v, bias), np.float32)
        got = {
            "dispatch": np.asarray(
                jax.jit(lambda *a: dot_product_attention(*a, impl="auto"))(
                    q, k, v, bias
                ),
                np.float32,
            )
        }
        if s % 128 == 0:  # _flash_pick requires pre-validated tileability
            got["pick"] = np.asarray(
                jax.jit(_flash_pick)(q, k, v, bias), np.float32
            )
        # catastrophic-error hunt (the 256/2048 training plateau), not a
        # precision audit: TPU fp32 matmuls are themselves ~3e-3 off a
        # float64 reference at these sizes
        tol = 3e-2 if dt == jnp.bfloat16 else 1e-2
        for name, g in got.items():
            err = float(np.abs(ref - g).max())
            ok = err < tol
            fails += 0 if ok else 1
            print(
                f"s={s} {np.dtype(dt).name:9s} {name:8s} "
                f"max_err={err:.3e} {'OK' if ok else 'FAIL'}",
                flush=True,
            )
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
