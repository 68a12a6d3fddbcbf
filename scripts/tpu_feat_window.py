"""Break down the bench's 'feat_time' window on the TPU process: featurizer
load vs guidance build vs the host->device upload of the compact batch.

Run: PYTHONPATH=/root/repo:/root/.axon_site scripts/tpu_retry.sh LOG 900
     python scripts/tpu_feat_window.py
"""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
    from physdock_tpu.cli.common import load_params
    from physdock_tpu.model.compact import compact_batch_np
    from physdock_tpu.utils.demo_assets import (
        redocking_features_dir,
        redocking_systems_dir,
    )

    cfg = PhysDockConfig.named(
        "medium", crop_size=256, atom_crop_size=2048, bf16=True,
        infer_use_pocket=True, infer_use_key_res=True, num_augmentation_sample=2,
    )
    fz = SystemFeaturizer(
        cfg.data,
        msa_features_dir=f"{redocking_features_dir()}/msa_features",
        uniprot_msa_features_dir=f"{redocking_features_dir()}/uniprot_msa_features",
        inference_mode=True, seed=0,
    )
    params = load_params(None, cfg)
    pipe = DockingPipeline(cfg, params, fz, SamplerSettings(
        max_samples=40, num_samples_per_round=20, max_rounds=2, steps=40,
        enable_physics_correction=True, num_confs=128, enable_ranking=True,
    ))
    pkl = f"{redocking_systems_dir()}/5SAK_ZRY_A_1.pkl.gz"

    for it in range(3):
        t0 = time.perf_counter()
        feats, meta = fz.load(pkl, num_msa_rounds=2)
        t1 = time.perf_counter()
        compact = compact_batch_np(feats)
        t2 = time.perf_counter()
        batch = {k: jnp.asarray(v) for k, v in compact.items()}
        # force completion of every transfer
        s = sum(float(jnp.sum(v.astype(jnp.float32))) for v in batch.values())
        t3 = time.perf_counter()
        g, confs = pipe._build_guidance(batch, meta)
        t4 = time.perf_counter()
        print(
            f"iter {it}: load {t1-t0:.2f}s  compact {t2-t1:.2f}s  "
            f"upload+sync {t3-t2:.2f}s ({len(batch)} arrays)  "
            f"guidance {t4-t3:.2f}s"
        )

    # upload style comparison: per-array asarray vs one device_put call
    compact = compact_batch_np(feats)
    for tag in ("asarray-per-key", "device_put-tree"):
        t0 = time.perf_counter()
        if tag == "asarray-per-key":
            b = {k: jnp.asarray(v) for k, v in compact.items()}
        else:
            b = jax.device_put(compact)
        s = sum(float(jnp.sum(jnp.asarray(v).astype(jnp.float32))) for v in b.values())
        print(f"{tag}: {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
