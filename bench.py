"""Benchmark: poses/sec/chip on the docking sampler (driver contract).

Runs the flagship inference workload: medium model at crop 256 / 2048
atoms, full 40-step EDM reverse pass, 5 poses per batch — structured like
the production pipeline (conditioning jit + sampling jit, conditioning
tensors passed as arguments; one jitted program each, NOT one fused giant
program — the remote-compile tunnel drops over-large payloads).
Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline targets BASELINE.json's ">=5x an A100 running the PyTorch
reference".  No reference throughput is published (SURVEY §6); we use a
conservative A100 estimate of 0.02 poses/s at this config, so
vs_baseline = poses_per_sec / (5 * 0.02).

Tunnel rules (memory: axon-tpu-tunnel-gotchas): single process, no
device-array closures in jit, scalar-readback timing, jitted init.
"""

from __future__ import annotations

import json
import time


A100_REFERENCE_POSES_PER_SEC = 0.02  # conservative estimate, see docstring
TARGET_MULTIPLIER = 5.0


def main():
    import jax
    import jax.numpy as jnp

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.diffusion import sample_diffusion
    from physdock_tpu.model.physdock import PhysDock

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    n_tokens, n_atoms, n_msa = (256, 2048, 128) if on_tpu else (32, 96, 8)
    num_sample = 20 if on_tpu else 2  # reference demo: 20 samples/round
    steps = 40 if on_tpu else 4
    model_name = "medium" if on_tpu else "toy"

    cfg = PhysDockConfig.named(model_name, bf16=on_tpu, num_augmentation_sample=2)
    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(
            n_tokens=n_tokens, n_atoms=n_atoms, n_msa=n_msa, n_ligand_tokens=16
        ).items()
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    cond_fn = jax.jit(lambda p, b: model.apply(p, b, method="conditioning"))

    def run(params, batch, key, conditioning):
        return sample_diffusion(
            model,
            params,
            batch,
            key,
            num_sample=num_sample,
            steps=steps,
            karras_rho=1000.0,
            conditioning=conditioning,
        )

    sample_fn = jax.jit(run)

    def force(x):
        # scalar readback: block_until_ready alone does not await execution
        # on async remote backends
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    # compile + warmup
    conditioning = cond_fn(params, batch)
    force(conditioning[3])
    force(sample_fn(params, batch, jax.random.PRNGKey(1), conditioning))

    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        conditioning = cond_fn(params, batch)
        force(sample_fn(params, batch, jax.random.PRNGKey(2 + i), conditioning))
    dt = (time.perf_counter() - t0) / n_iters

    poses_per_sec = num_sample / dt
    baseline = TARGET_MULTIPLIER * A100_REFERENCE_POSES_PER_SEC
    print(
        json.dumps(
            {
                "metric": f"poses/sec/chip ({model_name}, crop {n_tokens}/{n_atoms}, {steps} steps, {platform})",
                "value": round(poses_per_sec, 4),
                "unit": "poses/s",
                "vs_baseline": round(poses_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
