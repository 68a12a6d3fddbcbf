"""Confirm the overfit-gate failure mechanism: the featurizer's persistent
rng stream (load() `rng or self.rng`) makes features load-ORDER-dependent,
so the gate's dock phase evaluated on different draws than training.

Replays the gate's exact featurization sequence (cache hits of the
training features), then per system:
1. loss terms with the trained EMA params (expect LOW for all 4 now),
2. unguided 40-step sample -> ligand RMSD,
3. full guided dock (DockingPipeline._dock_loaded) on the SAME features
   -> top5 RMSD (the gate's metric).

Run: scripts/tpu_retry.sh /tmp/overfit_diag2b.log 3600 python scripts/overfit_diag2.py
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
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
    from physdock_tpu.model.diffusion import sample_diffusion
    from physdock_tpu.model.losses import physdock_loss
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.train import checkpoint as ckpt_lib
    from physdock_tpu.utils.compile_cache import enable as enable_cc
    from physdock_tpu.utils.geometry import weighted_rigid_align

    enable_cc()
    ckpt = ckpt_lib.latest_checkpoint("/root/repo/_overfit/ckpts")
    restored = ckpt_lib.restore_train_state(ckpt)
    ema = restored["ema_params"]
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

    systems = sorted(glob.glob(f"{DEMO_DIR}/*.pkl.gz"))
    # replay the gate's featurization phase exactly: same order, same kwargs
    loads = []
    for s in systems:
        f, meta, _ = worker.load(s, num_msa_rounds=4)
        print(f"{meta['system_id']}: cache={meta.get('_feat_cache')}", flush=True)
        loads.append((f, meta))

    @jax.jit
    def loss_terms(params, batch, key):
        out = model.apply(params, batch, key)
        _, logs = physdock_loss(out, batch, cfg.loss, sigma_data=cfg.model.sigma_data)
        return logs

    @jax.jit
    def unguided_sample(params, batch, key):
        return sample_diffusion(
            model, params, batch, key, num_sample=8, steps=40,
            karras_rho=1000.0,
        )

    def lig_rmsds_vs_gt(xs, x_gt, w, lig):
        out = []
        for x in np.asarray(xs):
            gt_a = np.asarray(
                weighted_rigid_align(
                    jnp.asarray(x)[None], jnp.asarray(x_gt)[None],
                    jnp.asarray(w),
                )
            )[0]
            d2 = np.sum((x - gt_a) ** 2, -1)
            out.append(float(np.sqrt(d2[lig].mean())))
        return out

    for feats, meta in loads:
        name = meta["system_id"]
        batch = {k: jnp.asarray(v) for k, v in feats.items()}
        lig = np.asarray(meta["ligand_atom_idx"])
        x_gt = np.asarray(feats["x_gt"])
        w = (np.asarray(feats["x_exists"]) > 0).astype(np.float32)

        logs = loss_terms(ema, batch, jax.random.PRNGKey(0))
        print(f"{name} loss: { {k: round(float(v), 4) for k, v in logs.items()} }",
              flush=True)
        xs = unguided_sample(ema, batch, jax.random.PRNGKey(2))
        r = lig_rmsds_vs_gt(xs, x_gt, w, lig)
        print(f"  unguided x8 lig RMSD: min {min(r):.3f} med "
              f"{sorted(r)[len(r)//2]:.3f}", flush=True)

    # full guided dock on the SAME (training) features
    settings = SamplerSettings(
        max_samples=40, num_samples_per_round=20, max_rounds=2, steps=40,
        enable_physics_correction=True, num_confs=64, enable_ranking=True,
        seed=0,
    )
    pipe = DockingPipeline(cfg, ema, worker, settings)
    for feats, meta in loads:
        name = meta["system_id"]
        t0 = time.time()
        res = pipe._dock_loaded(
            (dict(feats), dict(meta)), f"/tmp/diag2_dock/{name}",
            remove_ligand=False, smi=None, write_outputs=False,
            t_start=t0,
        )
        print(f"{name} GUIDED top5_rmsd: "
              f"{[round(float(x), 3) for x in res['top5_rmsd'][:5]]} "
              f"({time.time()-t0:.1f}s)", flush=True)
    worker.stop()


if __name__ == "__main__":
    main()
