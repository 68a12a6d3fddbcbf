"""Measure bf16-carry drift on trained weights (ADVICE r2 medium #2).

The trunk/sampler carry residual streams in bf16 on TPU
(nn/transformers.py::_res) while the reference's .float() casts keep
fp32 carries; golden parity gates run fp32-on-CPU where the cast is
identity.  This probe runs the SAME trained params + batch + keys
through the full conditioning + sampler at bf16 compute vs fp32 compute
on the chip and reports per-pose coordinate / ligand-RMSD deltas — the
number that says whether bf16 carries are safe end-to-end.

Usage: python scripts/bf16_drift_tpu.py [CKPT_DIR_OR_NPZ]
           [--model toy] [--crop 128] [--atom_crop 1024]
(defaults to the overfit gate's latest checkpoint; pass --model medium
--crop 256 --atom_crop 2048 with the flagship npz to close VERDICT r4
weak #7 — 48-block-trunk drift at the flagship crop)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from physdock_tpu.utils.demo_assets import (
    redocking_features_dir,
    redocking_systems_dir,
)

DEMO_DIR = redocking_systems_dir()
DEMO_MSA = redocking_features_dir()


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feat_worker import FeaturizerWorker
    from physdock_tpu.model.diffusion import sample_diffusion
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.train import checkpoint as ckpt_lib

    p = argparse.ArgumentParser()
    p.add_argument("ckpt", nargs="?", default=None)
    p.add_argument("--model", default="toy")
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--atom_crop", type=int, default=1024)
    p.add_argument(
        "--num_sample", type=int, default=0,
        help="poses per pass (0 = auto: 8 for toy, 4 for larger configs "
        "whose fp32 reference pass is HBM-bound at the flagship crop)",
    )
    args = p.parse_args()
    if args.num_sample <= 0:
        args.num_sample = 8 if args.model == "toy" else 4

    ckpt = args.ckpt or ckpt_lib.latest_checkpoint("/root/repo/_overfit/ckpts")
    assert ckpt, "no checkpoint available"
    if ckpt.endswith(".npz"):
        params = ckpt_lib.load_params_npz(ckpt)
    else:
        params = ckpt_lib.restore_train_state(ckpt)["ema_params"]
    print(f"params from {ckpt}", flush=True)

    results = {}
    for bf16 in (False, True):
        cfg = PhysDockConfig.named(
            args.model, crop_size=args.crop, atom_crop_size=args.atom_crop,
            bf16=bf16, infer_use_pocket=True, infer_use_key_res=True,
        )
        worker = FeaturizerWorker(
            cfg.data,
            cache_dir="/root/repo/_overfit/featcache",
            msa_features_dir=f"{DEMO_MSA}/msa_features",
            uniprot_msa_features_dir=f"{DEMO_MSA}/uniprot_msa_features",
            inference_mode=True,
            seed=0,
        )
        model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
        sysp = sorted(
            os.path.join(DEMO_DIR, f) for f in os.listdir(DEMO_DIR)
        )[0]
        feats, meta, _ = worker.load(sysp, num_msa_rounds=1)
        worker.stop()
        batch = {k: jnp.asarray(v) for k, v in feats.items()}

        @jax.jit
        def run(params, batch, key):
            return sample_diffusion(
                model, params, batch, key, num_sample=args.num_sample,
                steps=40, karras_rho=1000.0,
            )

        x = np.asarray(
            run(params, batch, jax.random.PRNGKey(0)), np.float32
        )
        results[bf16] = (x, np.asarray(meta["ligand_atom_idx"]))
        print(f"bf16={bf16}: poses {x.shape} finite={np.isfinite(x).all()}",
              flush=True)

    x32, lig = results[False]
    x16, _ = results[True]
    coord = np.abs(x32 - x16)
    lig_rmsd = np.sqrt(
        np.mean(np.sum((x32[:, lig] - x16[:, lig]) ** 2, -1), -1)
    )
    print(
        f"coord |delta|: mean {coord.mean():.4f} A, p99 "
        f"{np.percentile(coord, 99):.4f} A, max {coord.max():.4f} A",
        flush=True,
    )
    print(
        f"per-pose ligand RMSD(fp32 vs bf16): "
        f"{[round(float(r), 4) for r in lig_rmsd]}",
        flush=True,
    )
    import json

    with open("/root/repo/BF16_DRIFT.json", "w") as f:
        json.dump(
            {
                "ckpt": ckpt,
                "model": args.model,
                "crop": args.crop,
                "atom_crop": args.atom_crop,
                "coord_abs_delta_mean_A": float(coord.mean()),
                "coord_abs_delta_p99_A": float(np.percentile(coord, 99)),
                "coord_abs_delta_max_A": float(coord.max()),
                "per_pose_ligand_rmsd_fp32_vs_bf16_A": [
                    float(r) for r in lig_rmsd
                ],
            },
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
