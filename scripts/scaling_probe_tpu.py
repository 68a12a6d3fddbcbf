"""Throughput scaling probe: poses/s vs num_sample; cond vs sampler split."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.synthetic import make_synthetic_batch
from physdock_tpu.model.diffusion import sample_diffusion
from physdock_tpu.model.physdock import PhysDock

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
def force(x): return float(jnp.sum(jnp.asarray(x, jnp.float32)))

cfg = PhysDockConfig.named("medium", bf16=True, num_augmentation_sample=2)
model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
    n_tokens=256, n_atoms=2048, n_msa=128, n_ligand_tokens=16).items()}
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))
cond_fn = jax.jit(lambda p, b: model.apply(p, b, method="conditioning"))
c = cond_fn(params, batch); force(c[3])
t0 = time.perf_counter()
for _ in range(3):
    c = cond_fn(params, batch); force(c[3])
t_cond = (time.perf_counter() - t0) / 3
log(f"conditioning steady: {t_cond*1000:.1f} ms")

for ns in (5, 10, 20):
    fn = jax.jit(lambda p, b, k, cc, _ns=ns: sample_diffusion(
        model, p, b, k, num_sample=_ns, steps=40, karras_rho=1000.0, conditioning=cc))
    force(fn(params, batch, jax.random.PRNGKey(1), c))
    t0 = time.perf_counter()
    for i in range(2):
        force(fn(params, batch, jax.random.PRNGKey(2+i), c))
    dt = (time.perf_counter() - t0) / 2
    log(f"num_sample={ns}: {dt:.3f}s -> {ns/dt:.2f} poses/s (sampler only); incl cond: {ns/(dt+t_cond):.2f}")
