"""Profile the host-side featurizer (the dominant e2e dock cost: feat_time
2.6-4.7 s/system vs ~1.4 s device time per 20-pose round).

CPU-only — no TPU client.  Run:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/feat_profile.py
"""

from __future__ import annotations

import cProfile
import pstats
import time


def main():
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.utils.demo_assets import (
        redocking_features_dir,
        redocking_systems_dir,
    )

    cfg = PhysDockConfig.named(
        "medium", crop_size=256, atom_crop_size=2048, bf16=False,
        infer_use_pocket=True, infer_use_key_res=True,
    )
    fz = SystemFeaturizer(
        cfg.data,
        msa_features_dir=f"{redocking_features_dir()}/msa_features",
        uniprot_msa_features_dir=f"{redocking_features_dir()}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    pkl = f"{redocking_systems_dir()}/5SAK_ZRY_A_1.pkl.gz"

    t0 = time.perf_counter()
    fz.load(pkl, num_msa_rounds=2)
    print(f"cold load: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    fz.load(pkl, num_msa_rounds=2)
    print(f"warm load: {time.perf_counter()-t0:.2f}s")

    prof = cProfile.Profile()
    prof.enable()
    fz.load(pkl, num_msa_rounds=2)
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
