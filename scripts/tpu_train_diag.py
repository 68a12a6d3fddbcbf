"""Diagnose train-step timing: per-step forced timing + recompile detection."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_log_compiles", True)
from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.synthetic import make_synthetic_batch
from physdock_tpu.model.physdock import PhysDock
from physdock_tpu.parallel.mesh import make_mesh
from physdock_tpu.train.optim import make_optimizer
from physdock_tpu.train.step import init_train_state, make_train_step

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

cfg = PhysDockConfig.named("tiny", bf16=True, inference_mode=False, num_augmentation_sample=8)
mesh = make_mesh(dp=1)
model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
opt = make_optimizer()
single = make_synthetic_batch(n_tokens=64, n_atoms=256, n_msa=16)
batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in single.items()}
micro = {k: jnp.asarray(v) for k, v in single.items()}
params = jax.jit(model.init)(jax.random.PRNGKey(0), micro, jax.random.PRNGKey(1))
state = init_train_state(params, opt)
step = make_train_step(model, opt, cfg.loss, mesh, sigma_data=cfg.model.sigma_data)
for i in range(4):
    t0 = time.time()
    state, logs = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(3), i))
    loss = float(logs["loss"])  # forces execution
    log(f"step {i}: {time.time()-t0:.2f}s loss={loss:.3f}")
