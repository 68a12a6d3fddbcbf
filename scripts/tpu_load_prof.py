"""cProfile the warm featurizer load inside the TPU-client process (it is
~10x slower there than in a plain-CPU process; find which frames blow up)."""

from __future__ import annotations

import cProfile
import pstats
import time


def main():
    import jax  # noqa: F401  (forces the axon client up, as in the bench)

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
    print(f"cold {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter(); fz.load(pkl, num_msa_rounds=2)
    print(f"warm1 {time.perf_counter()-t0:.2f}s")

    prof = cProfile.Profile()
    prof.enable()
    fz.load(pkl, num_msa_rounds=2)
    prof.disable()
    pstats.Stats(prof).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
