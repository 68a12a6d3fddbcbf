"""Parity check: Pallas flash attention vs XLA SDPA on the real TPU."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from physdock_tpu.ops.attention import sdpa_xla
from physdock_tpu.ops.flash_attention import flash_sdpa

key = jax.random.PRNGKey(0)
for (b, h, sq, sk, d), bias_lead in [
    ((1, 4, 256, 256, 32), "full"),
    ((2, 4, 512, 512, 32), "shared"),   # bias [H,S,S] shared over batch
    ((1, 8, 2048, 2048, 32), "full"),
]:
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.float32)
    kk = jax.random.normal(ks[1], (b, h, sk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, sk, d), jnp.float32)
    if bias_lead == "full":
        bias = jax.random.normal(ks[3], (b, h, sq, sk), jnp.float32)
    else:
        bias = jax.random.normal(ks[3], (h, sq, sk), jnp.float32)
    ref = jax.jit(sdpa_xla)(q, kk, v, bias)
    out = jax.jit(flash_sdpa)(q, kk, v, bias)
    err = float(jnp.max(jnp.abs(ref - out)))
    print(f"shape {(b,h,sq,sk,d)} bias={bias_lead}: max err {err:.2e}")
    assert err < 2e-2, "flash kernel mismatch"
print("flash kernel parity OK")

# timing at atom-stack shape
import time
q = jax.random.normal(ks[0], (1, 4, 2048, 32), jnp.bfloat16)
kk = jax.random.normal(ks[1], (1, 4, 2048, 32), jnp.bfloat16)
v = jax.random.normal(ks[2], (1, 4, 2048, 32), jnp.bfloat16)
bias = jax.random.normal(ks[3], (4, 2048, 2048), jnp.float32)
for name, fn in [("xla", jax.jit(sdpa_xla)), ("flash", jax.jit(flash_sdpa))]:
    fn(q, kk, v, bias).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        r = fn(q, kk, v, bias)
    r.block_until_ready()
    print(f"{name}: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
