import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from physdock_tpu.ops.attention import sdpa_xla
from physdock_tpu.ops.flash_attention import flash_sdpa
from physdock_tpu.ops.flash_attention_grouped import flash_sdpa_grouped

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
def force(x): return float(jnp.sum(jnp.asarray(x, jnp.float32)))

ks = jax.random.split(jax.random.PRNGKey(0), 4)
B, H, S, D = 20, 4, 2048, 32
q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
bias = jax.random.normal(ks[3], (H, S, S), jnp.bfloat16)

ref = jax.jit(sdpa_xla)(q, k, v, bias)
out = jax.jit(flash_sdpa_grouped)(q, k, v, bias)
err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
log(f"grouped parity max err {err:.2e}")
assert err < 5e-2

for name, fn in [("xla", jax.jit(sdpa_xla)), ("flash", jax.jit(flash_sdpa)),
                 ("grouped", jax.jit(flash_sdpa_grouped))]:
    force(fn(q, k, v, bias))
    t0 = time.perf_counter()
    for _ in range(10):
        r = fn(q, k, v, bias)
    force(r)
    log(f"{name}: {(time.perf_counter()-t0)/10*1e3:.2f} ms (B=20,H=4,S=2048)")
