import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
import jax, jax.numpy as jnp
from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.synthetic import make_synthetic_batch
from physdock_tpu.model.physdock import PhysDock
from physdock_tpu.model.diffusion import sample_diffusion

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

cfg = PhysDockConfig.named("medium", bf16=True, num_augmentation_sample=2)
model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype, attn_impl=impl)
batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
    n_tokens=256, n_atoms=2048, n_msa=128, n_ligand_tokens=16).items()}
log(f"impl={impl}; init...")
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
jax.block_until_ready(params)
log("init done; conditioning...")
cond = jax.jit(lambda p, b: model.apply(p, b, method="conditioning"))
conditioning = cond(params, batch)
jax.block_until_ready(conditioning)
log("conditioning done; denoise compile (conditioning as ARGS)...")
den = jax.jit(
    lambda p, b, x, t, c: model.apply(p, b, x, t, *c, method="denoise")
)
x = jax.random.normal(jax.random.PRNGKey(2), (5, 2048, 3))
t = jnp.full((5,), 16.0)
t0 = time.time()
jax.block_until_ready(den(params, batch, x, t, conditioning))
log(f"denoise compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(3):
    jax.block_until_ready(den(params, batch, x, t, conditioning))
log(f"denoise steady: {(time.time()-t0)/3:.3f}s/call (5 samples)")

log("full 40-step sampler jit...")
samp = jax.jit(lambda p, b, k, c: sample_diffusion(
    model, p, b, k, num_sample=5, steps=40, karras_rho=1000.0, conditioning=c))
t0 = time.time()
out = samp(params, batch, jax.random.PRNGKey(3), conditioning)
jax.block_until_ready(out)
log(f"sampler compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
jax.block_until_ready(samp(params, batch, jax.random.PRNGKey(4), conditioning))
dt = time.time()-t0
log(f"sampler steady: {dt:.3f}s -> {5/dt:.3f} poses/s (excl. conditioning)")
