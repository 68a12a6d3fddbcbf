"""On-chip virtual-screening throughput: sequential vs batched ligands.

Measures pipe.screen over the same SMILES list with batch_size=1
(reference-style sequential) and batch_size=B (vmapped multi-ligand),
medium model, guided, demo receptor.  Run via scripts/tpu_retry.sh.
"""

from __future__ import annotations

import sys
import time

SMILES = [
    "CCOc1ccccc1",
    "CC(=O)Nc1ccc(O)cc1",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "CN1CCC[C@H]1c1cccnc1",
]


def main():
    import jax

    from physdock_tpu.cli.common import load_params
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
    from physdock_tpu.utils.demo_assets import screening_dir

    B = int(sys.argv[1]) if len(sys.argv) > 1 else len(SMILES)
    on_tpu = jax.devices()[0].platform != "cpu"
    model_name = "medium" if on_tpu else "toy"
    crop, atom_crop = (256, 2048) if on_tpu else (64, 256)
    steps, nspr = (40, 5) if on_tpu else (2, 2)

    cfg = PhysDockConfig.named(
        model_name, crop_size=crop, atom_crop_size=atom_crop, bf16=on_tpu,
        infer_use_pocket=True, num_augmentation_sample=2,
    )
    fz = SystemFeaturizer(cfg.data, inference_mode=True, seed=0)
    params = load_params(None, cfg)
    settings = SamplerSettings(
        max_samples=nspr, num_samples_per_round=nspr, max_rounds=2,
        steps=steps, enable_physics_correction=True,
        num_confs=32, enable_ranking=False, seed=0,
    )
    pipe = DockingPipeline(cfg, params, fz, settings)
    receptor = f"{screening_dir()}/6kzd.pkl.gz"

    # sequential (warm + timed)
    pipe.screen(receptor, SMILES[:1], "/tmp/vs_seq", write_outputs=False)
    t0 = time.perf_counter()
    r_seq = pipe.screen(receptor, SMILES, "/tmp/vs_seq", write_outputs=False)
    t_seq = time.perf_counter() - t0
    errs = [r for r in r_seq if "error" in r]
    print(f"sequential: {len(SMILES)} ligands in {t_seq:.1f}s "
          f"({len(SMILES)/t_seq:.3f} lig/s), errors={len(errs)}")

    # batched (warm + timed)
    pipe.screen(receptor, SMILES[:B], "/tmp/vs_bat", write_outputs=False,
                batch_size=B)
    t0 = time.perf_counter()
    r_bat = pipe.screen(receptor, SMILES, "/tmp/vs_bat", write_outputs=False,
                        batch_size=B)
    t_bat = time.perf_counter() - t0
    errs = [r for r in r_bat if "error" in r]
    print(f"batched(B={B}): {len(SMILES)} ligands in {t_bat:.1f}s "
          f"({len(SMILES)/t_bat:.3f} lig/s), errors={len(errs)}")
    print(f"speedup: {t_seq / t_bat:.2f}x")


if __name__ == "__main__":
    main()
