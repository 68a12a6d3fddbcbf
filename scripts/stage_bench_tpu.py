"""Staged TPU timing: locate compile/runtime cost per model stage."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.synthetic import make_synthetic_batch
from physdock_tpu.model.physdock import PhysDock

def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

n_tokens, n_atoms, n_msa = 256, 2048, 128
cfg = PhysDockConfig.named("medium", bf16=True, num_augmentation_sample=2)
model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
    n_tokens=n_tokens, n_atoms=n_atoms, n_msa=n_msa, n_ligand_tokens=16).items()}
log("batch on device")

t0 = time.time()
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
jax.block_until_ready(params)
log(f"init compile+run: {time.time()-t0:.1f}s")

cond = jax.jit(lambda p, b: model.apply(p, b, method="conditioning"))
t0 = time.time()
a, ap, s, z = cond(params, batch)
jax.block_until_ready(z)
log(f"conditioning compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
jax.block_until_ready(cond(params, batch))
log(f"conditioning steady: {time.time()-t0:.3f}s")

den = jax.jit(lambda p, b, x, t: model.apply(p, b, x, t, a, ap, s, z, method="denoise"))
x = jax.random.normal(jax.random.PRNGKey(2), (5, n_atoms, 3))
t = jnp.full((5,), 16.0)
t0 = time.time()
jax.block_until_ready(den(params, batch, x, t))
log(f"denoise compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
jax.block_until_ready(den(params, batch, x, t))
log(f"denoise steady (5 samples): {time.time()-t0:.3f}s")

from physdock_tpu.model.diffusion import sample_diffusion
samp = jax.jit(lambda p, b, k: sample_diffusion(model, p, b, k, num_sample=5, steps=40, karras_rho=1000.0))
t0 = time.time()
out = samp(params, batch, jax.random.PRNGKey(3))
jax.block_until_ready(out)
log(f"40-step sampler compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
jax.block_until_ready(samp(params, batch, jax.random.PRNGKey(4)))
dt = time.time()-t0
log(f"40-step sampler steady: {dt:.3f}s -> {5/dt:.3f} poses/s")
