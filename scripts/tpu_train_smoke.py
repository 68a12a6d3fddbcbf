"""One real training step on the TPU (toy model): grads, optimizer, EMA."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.synthetic import make_synthetic_batch
from physdock_tpu.model.physdock import PhysDock
from physdock_tpu.parallel.mesh import make_mesh
from physdock_tpu.train.optim import make_optimizer
from physdock_tpu.train.step import init_train_state, make_train_step

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

cfg = PhysDockConfig.named("tiny", bf16=True, inference_mode=False,
                           num_augmentation_sample=8)
mesh = make_mesh(dp=1)
model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
opt = make_optimizer()
single = make_synthetic_batch(n_tokens=64, n_atoms=256, n_msa=16)
batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in single.items()}
micro = {k: jnp.asarray(v) for k, v in single.items()}
params = jax.jit(model.init)(jax.random.PRNGKey(0), micro, jax.random.PRNGKey(1))
state = init_train_state(params, opt)
step = make_train_step(model, opt, cfg.loss, mesh, sigma_data=cfg.model.sigma_data)
t0 = time.time()
state, logs = step(state, batch, jax.random.PRNGKey(2))
loss0 = float(logs["loss"])
log(f"step 1 compile+run {time.time()-t0:.1f}s loss={loss0:.4f}")
t0 = time.time()
for i in range(5):
    state, logs = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(3), i))
loss5 = float(logs["loss"])
dt = (time.time()-t0)/5
log(f"steady {dt:.2f}s/step; loss {loss0:.4f} -> {loss5:.4f} over 6 steps")
assert np.isfinite(loss5)
log("train smoke OK")
