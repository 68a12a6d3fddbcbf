"""Isolate why warm featurizer loads slow ~10x when device work interleaves.

Each iteration: [device sampler burst] -> load A -> load B -> sleep 5 -> load C.
If A is slow but B/C fast, the slowdown is aftermath of device activity
(client polling threads); if all slow, it's persistent state.
"""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.utils.demo_assets import (
        redocking_features_dir,
        redocking_systems_dir,
    )

    cfg = PhysDockConfig.named("medium", crop_size=256, atom_crop_size=2048, bf16=True)
    fz = SystemFeaturizer(
        cfg.data,
        msa_features_dir=f"{redocking_features_dir()}/msa_features",
        uniprot_msa_features_dir=f"{redocking_features_dir()}/uniprot_msa_features",
        inference_mode=True, seed=0,
    )
    pkl = f"{redocking_systems_dir()}/5SAK_ZRY_A_1.pkl.gz"
    t0 = time.perf_counter(); fz.load(pkl, num_msa_rounds=2)
    print(f"cold load {time.perf_counter()-t0:.2f}s", flush=True)

    # a device burst: biggish matmul chain, forced readback
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2048, 2048)), jnp.bfloat16)

    @jax.jit
    def burst(x):
        for _ in range(60):
            x = jnp.tanh(x @ x) * 0.01
        return jnp.sum(x.astype(jnp.float32))

    float(burst(x))  # compile
    for it in range(2):
        t0 = time.perf_counter(); float(burst(x)); tb = time.perf_counter() - t0
        t0 = time.perf_counter(); fz.load(pkl, num_msa_rounds=2); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); fz.load(pkl, num_msa_rounds=2); tb2 = time.perf_counter() - t0
        time.sleep(5)
        t0 = time.perf_counter(); fz.load(pkl, num_msa_rounds=2); tc = time.perf_counter() - t0
        print(
            f"iter {it}: burst {tb:.2f}s  loadA {ta:.2f}s  loadB {tb2:.2f}s  "
            f"(sleep 5)  loadC {tc:.2f}s", flush=True,
        )


if __name__ == "__main__":
    main()
