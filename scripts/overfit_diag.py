"""Diagnose the overfit-gate plateau: where does the trained model lose
the pose?

Loads the gate's checkpoint and reports, per demo system:
1. per-term training losses (the gate only logs the total),
2. denoiser memorization: x_gt + sigma*noise -> one denoiser call ->
   aligned all-atom + ligand RMSD vs x_gt, across sigma levels,
3. a full unguided 40-step sample -> pocket-aligned ligand RMSD
   (sampler-only view, no guidance/protocol).

Run: scripts/tpu_retry.sh /tmp/overfit_diag.log 3600 python scripts/overfit_diag.py
"""

import glob
import os
import sys
import time

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
    from physdock_tpu.model.losses import physdock_loss
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.train import checkpoint as ckpt_lib
    from physdock_tpu.utils.compile_cache import enable as enable_cc
    from physdock_tpu.utils.geometry import weighted_rigid_align

    enable_cc()
    ckpt = sys.argv[1] if len(sys.argv) > 1 else ckpt_lib.latest_checkpoint(
        "/root/repo/_overfit/ckpts"
    )
    restored = ckpt_lib.restore_train_state(ckpt)
    params = restored["ema_params"]
    print(f"ckpt {ckpt} (step {restored['step']})", flush=True)

    cfg = PhysDockConfig.named(
        "toy", crop_size=128, atom_crop_size=1024, bf16=True,
        infer_use_pocket=True, infer_use_key_res=True,
        num_augmentation_sample=8,
    )
    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    worker = FeaturizerWorker(
        cfg.data, cache_dir="/root/repo/_overfit/featcache",
        msa_features_dir=f"{DEMO_MSA}/msa_features",
        uniprot_msa_features_dir=f"{DEMO_MSA}/uniprot_msa_features",
        inference_mode=True, seed=0,
    )

    @jax.jit
    def loss_terms(params, batch, key):
        out = model.apply(params, batch, key)
        _, logs = physdock_loss(out, batch, cfg.loss, sigma_data=cfg.model.sigma_data)
        return logs

    @jax.jit
    def denoise_probe(params, batch, key, sigma):
        a, ap, s, z = model.apply(params, batch, method="conditioning")
        x_gt = batch["x_gt"]
        noise = jax.random.normal(key, x_gt.shape, jnp.float32) * sigma
        x_hat = (x_gt + noise)[None]
        xd = model.apply(
            params, batch, x_hat, jnp.full((1,), sigma, jnp.float32),
            a, ap, s, z, method="denoise",
        )
        return xd[0]

    @jax.jit
    def unguided_sample(params, batch, key):
        return sample_diffusion(
            model, params, batch, key, num_sample=8, steps=40,
            karras_rho=1000.0,
        )

    sigmas = [0.2, 1.0, 4.0, 16.0, 80.0]
    for sysp in sorted(glob.glob(f"{DEMO_DIR}/*.pkl.gz")):
        feats, meta, _ = worker.load(sysp, num_msa_rounds=1)
        batch = {k: jnp.asarray(v) for k, v in feats.items()}
        name = meta["system_id"]
        lig = np.asarray(meta["ligand_atom_idx"])
        x_gt = np.asarray(feats["x_gt"])
        mask = np.asarray(feats["x_exists"]) > 0

        logs = loss_terms(params, batch, jax.random.PRNGKey(0))
        logs = {k: round(float(v), 4) for k, v in logs.items()}
        print(f"{name} loss terms: {logs}", flush=True)

        w = np.asarray(mask, np.float32)

        def rmsds(x_pred):
            """Align GT onto the prediction frame; all-atom + ligand RMSD."""
            gt_a = np.asarray(
                weighted_rigid_align(
                    jnp.asarray(x_pred)[None], jnp.asarray(x_gt)[None],
                    jnp.asarray(w),  # [A]: batch dims empty, S=1
                )
            )[0]
            d2 = np.sum((x_pred - gt_a) ** 2, -1)
            rmsd_all = float(np.sqrt((d2 * w).sum() / w.sum()))
            rmsd_lig = float(np.sqrt(d2[lig].mean())) if len(lig) else float("nan")
            return rmsd_all, rmsd_lig

        for sig in sigmas:
            xd = np.asarray(
                denoise_probe(params, batch, jax.random.PRNGKey(1), jnp.float32(sig)),
                np.float32,
            )
            rmsd_all, rmsd_lig = rmsds(xd)
            print(
                f"  denoise sigma={sig:6.1f}: all-atom {rmsd_all:7.3f} A, "
                f"ligand {rmsd_lig:7.3f} A", flush=True,
            )

        t0 = time.time()
        xs = np.asarray(unguided_sample(params, batch, jax.random.PRNGKey(2)))
        lig_rmsds = [rmsds(x)[1] for x in xs]
        print(
            f"  unguided 40-step x8: ligand RMSD min {min(lig_rmsds):.3f} "
            f"median {sorted(lig_rmsds)[len(lig_rmsds)//2]:.3f} "
            f"({time.time()-t0:.1f}s)", flush=True,
        )
    worker.stop()


if __name__ == "__main__":
    main()
