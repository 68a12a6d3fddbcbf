"""Blind/no-crop docking on one chip (BASELINE config 5): dock a full
uncropped PoseBusters demo system, guided, and record shapes/timing/
recompile count.  Run: PYTHONPATH=/root/repo:/root/.axon_site
scripts/tpu_retry.sh LOG 1800 python scripts/tpu_nocrop_dock.py
"""

from __future__ import annotations

import time


def main():
    import jax

    from physdock_tpu.utils.compile_cache import enable as enable_cc
    from physdock_tpu.utils.demo_assets import (
        redocking_features_dir,
        redocking_systems_dir,
    )

    # persistent XLA cache: a second process re-docking the same buckets
    # must pay ~0 compile time (VERDICT r2 item 10 done-condition)
    enable_cc()

    from physdock_tpu.cli.common import load_params
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings

    on_tpu = jax.devices()[0].platform != "cpu"
    name = "medium" if on_tpu else "toy"
    cfg = PhysDockConfig.named(
        name, crop_size=None, atom_crop_size=None, bf16=on_tpu,
        infer_use_pocket=True, num_augmentation_sample=2,
    )
    fz = SystemFeaturizer(
        cfg.data,
        msa_features_dir=f"{redocking_features_dir()}/msa_features",
        uniprot_msa_features_dir=f"{redocking_features_dir()}/uniprot_msa_features",
        seed=0,
    )
    params = load_params(None, cfg)
    pipe = DockingPipeline(
        cfg, params, fz,
        SamplerSettings(
            max_samples=10, num_samples_per_round=5, max_rounds=2,
            steps=40 if on_tpu else 2, enable_physics_correction=True,
            num_confs=32, enable_ranking=True, seed=0,
        ),
    )
    compiles = [0]
    import jax._src.compiler as _comp

    orig = _comp.backend_compile_and_load

    def counted(*a, **kw):
        compiles[0] += 1
        return orig(*a, **kw)

    _comp.backend_compile_and_load = counted

    systems = [
        f"{redocking_systems_dir()}/5SAK_ZRY_A_1.pkl.gz",
        f"{redocking_systems_dir()}/5SD5_HWI_A_1.pkl.gz",
    ]
    for i, pkl in enumerate(systems):
        t0 = time.perf_counter()
        res = pipe.dock(pkl, output_dir=f"/tmp/nocrop_{i}", write_outputs=False)
        dt = time.perf_counter() - t0
        print(
            f"{res['system_id']}: {res['num_poses']} poses, rounds="
            f"{res['rounds']}, {dt:.1f}s, compiles so far={compiles[0]}, "
            f"top rmsd={None if not res['top5_rmsd'] else round(res['top5_rmsd'][0], 1)}"
        )
    print(f"total XLA compiles: {compiles[0]}")


if __name__ == "__main__":
    main()
