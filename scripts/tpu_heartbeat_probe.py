"""Test whether keeping the axon tunnel warm (tiny device op every ~1s)
prevents the ~10x slowdown of host work that follows idle/device-phase
transitions in the TPU-client process."""

from __future__ import annotations

import threading
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

    one = jnp.ones((8, 128), jnp.float32)
    tick = jax.jit(lambda x: jnp.sum(x))
    float(tick(one))

    stop = threading.Event()

    def heartbeat():
        while not stop.is_set():
            float(tick(one))
            stop.wait(1.0)

    for use_hb in (False, True, False, True):
        hb = None
        if use_hb:
            stop.clear()
            hb = threading.Thread(target=heartbeat, daemon=True)
            hb.start()
        time.sleep(6)  # idle gap (heartbeat keeps tunnel warm if enabled)
        t0 = time.perf_counter(); fz.load(pkl, num_msa_rounds=2)
        dt = time.perf_counter() - t0
        if hb is not None:
            stop.set(); hb.join()
        print(f"heartbeat={use_hb}: load after 6s gap {dt:.2f}s", flush=True)


if __name__ == "__main__":
    main()
