"""On-chip gradient parity of the fused Pallas attention backward
(flash_fwd_lse + flash_bwd — the TRAINING path at folded-eligible shapes)
vs jax.vjp(sdpa_xla), at the shapes that bracket the round-5 plateau:
healthy runs trained through it at s<=1024; stuck runs at s=1792/1920.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from physdock_tpu.ops.attention import sdpa_xla
from physdock_tpu.ops.flash_attention_bwd import flash_bwd, flash_fwd_lse

key = jax.random.PRNGKey(0)
fails = 0
for s in (896, 1024, 1792, 1920, 2048):
    for dt in (jnp.bfloat16, jnp.float32):
        b, h, d = 8, 4, 32
        ks = jax.random.split(jax.random.fold_in(key, s), 5)
        q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32).astype(dt)
        k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32).astype(dt)
        v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32).astype(dt)
        bias = 0.5 * jax.random.normal(ks[3], (h, s, s), jnp.float32).astype(dt)
        do = jax.random.normal(ks[4], (b, h, s, d), jnp.float32).astype(dt)

        o_ref, vjp = jax.vjp(sdpa_xla, q, k, v, bias)
        refs = vjp(do)

        @jax.jit
        def fused(q, k, v, bias, do):
            o, m, l = flash_fwd_lse(q, k, v, bias)
            return o, flash_bwd(q, k, v, bias, o, m, l, do)

        o_p, grads = fused(q, k, v, bias, do)
        err_o = float(jnp.abs(o_p.astype(jnp.float32) - o_ref.astype(jnp.float32)).max())
        line = [f"s={s} {np.dtype(dt).name:9s} fwd={err_o:.3e}"]
        tol = 5e-2 if dt == jnp.bfloat16 else 1e-2
        bad = err_o > tol
        for name, g, r in zip(("dq", "dk", "dv", "db"), grads, refs):
            # grads scale with s (db sums over batch); compare relative to
            # the reference's own magnitude
            r32 = np.asarray(r, np.float32)
            scale = np.abs(r32).max() + 1e-6
            err = float(np.abs(np.asarray(g, np.float32) - r32).max() / scale)
            line.append(f"{name}={err:.3e}")
            bad = bad or err > tol
        fails += 1 if bad else 0
        print(" ".join(line) + ("  FAIL" if bad else "  OK"), flush=True)
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
