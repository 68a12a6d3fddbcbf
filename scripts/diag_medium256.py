"""Diagnose the crop-256 medium plateau (round 4).

The flagship gate window (resume at step 1500 from crop 128, train to
2842 at crop 256/2048) plateaued at loss ~100-200 with spikes to 2000
while the crop-128 window reached ~1.8.  This script attributes the
plateau: per-system, per-draw loss components with their sigma (t_hat),
for both params and EMA of the latest checkpoint — so we can see WHICH
term, WHICH system and WHICH noise band carries the 100.

Run: scripts/tpu_retry.sh /tmp/diag256.log 1800 python scripts/diag_medium256.py
CPU smoke: python scripts/diag_medium256.py --cpu --model toy --crop 64 \
    --atom_crop 512 --draws 2
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from physdock_tpu.utils.demo_assets import (
    redocking_features_dir,
    redocking_systems_dir,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="medium")
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--atom_crop", type=int, default=2048)
    p.add_argument("--draws", type=int, default=24)
    p.add_argument("--ckpt_dir", default="/root/repo/_overfit_medium/ckpts")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="/root/repo/_artifacts/diag_medium256.json")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.utils.compile_cache import enable as enable_cc

    enable_cc()
    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feat_worker import FeaturizerWorker
    from physdock_tpu.model.losses import physdock_loss
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.train import checkpoint as ckpt_lib
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state

    cfg = PhysDockConfig.named(
        args.model,
        crop_size=args.crop,
        atom_crop_size=args.atom_crop,
        bf16=on_tpu,
        infer_use_pocket=True,
        infer_use_key_res=True,
        num_augmentation_sample=1,  # one sigma per draw -> clean attribution
    )
    worker = FeaturizerWorker(
        cfg.data,
        cache_dir="/root/repo/_overfit_medium/featcache",
        msa_features_dir=f"{redocking_features_dir()}/msa_features",
        uniprot_msa_features_dir=f"{redocking_features_dir()}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    systems = sorted(glob.glob(f"{redocking_systems_dir()}/*.pkl.gz"))
    feats = {}
    for s in systems:
        f, meta, _ = worker.load(s, num_msa_rounds=1)
        feats[meta["system_id"]] = {k: jnp.asarray(v) for k, v in dict(f).items()}
    worker.stop()
    print(f"featurized {len(feats)} systems", flush=True)

    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    mb0 = next(iter(feats.values()))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), mb0, jax.random.PRNGKey(1))

    resume = ckpt_lib.latest_checkpoint(args.ckpt_dir)
    weights = {"raw_init": params}
    if resume:
        state = init_train_state(params, make_optimizer(1e-3, 100))
        restored = ckpt_lib.restore_train_state(
            resume,
            like={
                "step": np.asarray(0),
                "params": state.params,
                "opt_state": state.opt_state,
                "ema_params": state.ema_params,
            },
        )
        print(f"restored ckpt step {int(restored['step'])}: {resume}", flush=True)
        weights = {"params": restored["params"], "ema": restored["ema_params"]}
        del state

    @jax.jit
    def eval_one(w, mb, key):
        out = model.apply(w, mb, key)
        loss, logs = physdock_loss(out, mb, cfg.loss, sigma_data=cfg.model.sigma_data)
        logs = dict(logs)
        logs["t_hat"] = out["t_hat"][0]
        return logs

    report = {}
    t0 = time.time()
    for wname, w in weights.items():
        report[wname] = {}
        for sid, mb in feats.items():
            rows = []
            for d in range(args.draws):
                key = jax.random.fold_in(jax.random.PRNGKey(1234), d)
                logs = jax.device_get(eval_one(w, mb, key))
                rows.append({k: float(v) for k, v in logs.items()})
            comp = {
                k: float(np.mean([r[k] for r in rows]))
                for k in rows[0]
                if k != "t_hat"
            }
            worst = sorted(rows, key=lambda r: -r["loss"])[:4]
            report[wname][sid] = {"mean": comp, "worst_draws": worst}
            print(
                f"[{wname}] {sid}: loss {comp['loss']:.2f} "
                f"mse {comp['weighted_mse_loss']:.2f} "
                f"lddt {comp['smooth_lddt_loss']:.3f} "
                f"bond {comp['bond_loss']:.2f} "
                f"keyres {comp['key_res_loss']:.2f} "
                f"dgram {comp['distogram_loss']:.3f}",
                flush=True,
            )
            for r in worst[:2]:
                print(
                    f"    worst: loss {r['loss']:.1f} at t_hat {r['t_hat']:.2f} "
                    f"(mse {r['weighted_mse_loss']:.1f} bond {r['bond_loss']:.1f} "
                    f"keyres {r['key_res_loss']:.1f})",
                    flush=True,
                )
    print(f"eval in {time.time()-t0:.1f}s", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
