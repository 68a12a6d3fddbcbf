import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from physdock_tpu.ops.attention import sdpa_xla
from physdock_tpu.ops.flash_attention import flash_sdpa
from physdock_tpu.ops.flash_attention_grouped import flash_sdpa_grouped
from physdock_tpu.ops.flash_attention_folded import flash_sdpa_folded

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
def force(x): return float(jnp.sum(jnp.asarray(x, jnp.float32)))

B, H, S, D = 20, 4, 2048, 32
ks = jax.random.split(jax.random.PRNGKey(0), 4)
qh = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16)
kh = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16)
vh = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16)
bias = jax.random.normal(ks[3], (H, S, S), jnp.bfloat16)
qf = jnp.swapaxes(qh, 1, 2).reshape(B, S, H * D)
kf = jnp.swapaxes(kh, 1, 2).reshape(B, S, H * D)
vf = jnp.swapaxes(vh, 1, 2).reshape(B, S, H * D)

folded = jax.jit(lambda q, k, v, b: flash_sdpa_folded(q, k, v, b, num_heads=H))
ref = jax.jit(sdpa_xla)(qh, kh, vh, bias)
out = folded(qf, kf, vf, bias)
out4 = jnp.swapaxes(out.reshape(B, S, H, D), 1, 2)
err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out4.astype(jnp.float32))))
log(f"folded parity max err {err:.2e}")
assert err < 5e-2

# timing: folded consumes folded inputs (its real usage — projections emit folded)
for name, fn, args in [
    ("xla", jax.jit(sdpa_xla), (qh, kh, vh, bias)),
    ("flash", jax.jit(flash_sdpa), (qh, kh, vh, bias)),
    ("grouped", jax.jit(flash_sdpa_grouped), (qh, kh, vh, bias)),
    ("folded", folded, (qf, kf, vf, bias)),
]:
    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(10):
        r = fn(*args)
    force(r)
    log(f"{name}: {(time.perf_counter()-t0)/10*1e3:.2f} ms (B={B},H={H},S={S})")
