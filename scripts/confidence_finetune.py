"""Train the confidence head "in anger" on the overfit-gate systems and
use it for ranking (the fused-confidence path; VERDICT r2 weak #7).

Takes the gate's trained denoiser (scripts/overfit_gate.py checkpoint),
grafts a freshly-initialized ConfidenceModule next to it, and fine-tunes
ONLY the head (optax.masked zeroes every other update) through the
mini-rollout path: short no-grad EDM rollout -> PAE/PDE/pLDDT cross
entropies (reference loss_module3.py:599-610, train.sh --mini-rollout).
Then docks the 4 demo systems with confidence_ranking=True and reports
the per-pose (ranking_confidence, ligand RMSD) Spearman correlation —
a trained head must rank good poses above bad ones.

Writes CONFIDENCE_GATE.json.

Run (TPU, after the overfit gate):
  scripts/tpu_retry.sh /tmp/conf_ft.log 7200 python scripts/confidence_finetune.py
CPU smoke:
  python scripts/confidence_finetune.py --cpu --steps 2 --crop 64 \
      --atom_crop 512 --aug 2 --rollout 2 --dock_poses 3 --dock_steps 2
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

DEMO_DIR = redocking_systems_dir()
DEMO_MSA = redocking_features_dir()


def spearman(a, b):
    import numpy as np

    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    d = np.sqrt((ra**2).sum() * (rb**2).sum())
    return float((ra * rb).sum() / d) if d > 0 else 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument(
        "--alpha_pae", type=float, default=1.0,
        help="PAE loss weight (reference tasks/unicore_train/train.sh:109 "
        "sets --alpha-pae 1 for the mini-rollout recipe; the release "
        "LossConfig default of 0.0 gives the PAE head EXACTLY ZERO "
        "gradient, which left ipTM/ranking_confidence constant at the "
        "untrained value through every prior confidence gate)",
    )
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--atom_crop", type=int, default=1024)
    p.add_argument("--aug", type=int, default=8)
    p.add_argument("--rollout", type=int, default=12)
    p.add_argument("--model", default="toy")
    p.add_argument("--gate_dir", default="/root/repo/_overfit")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default="/root/repo/_confidence")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dock_steps", type=int, default=40)
    p.add_argument("--dock_poses", type=int, default=20)
    p.add_argument("--gate_out", default="/root/repo/CONFIDENCE_GATE.json")
    p.add_argument(
        "--deadline_ts", type=float, default=0.0,
        help="unix time; stop head TRAINING here and proceed to the dock + "
        "decoy-ladder gate (0 = no deadline), so a time-boxed TPU window "
        "always emits the gate artifact",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from physdock_tpu.utils.compile_cache import enable as enable_cc

    enable_cc()
    on_tpu = jax.devices()[0].platform != "cpu"

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feat_worker import FeaturizerWorker
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import make_mesh
    from physdock_tpu.train import checkpoint as ckpt_lib
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state, make_train_step

    import dataclasses

    cfg = PhysDockConfig.named(
        args.model,
        crop_size=args.crop,
        atom_crop_size=args.atom_crop,
        bf16=on_tpu,
        infer_use_pocket=True,
        infer_use_key_res=True,
        num_augmentation_sample=args.aug,
    )
    cfg = cfg.replace(loss=dataclasses.replace(cfg.loss, alpha_pae=args.alpha_pae))
    # ipTM/pTM/ranking_confidence are all PAE-derived (infer/metrics.py:109)
    # — a zero PAE weight makes the whole gate meaningless.
    assert cfg.loss.alpha_pae > 0, "confidence gate requires alpha_pae > 0"
    model = PhysDock(
        cfg=cfg.model, dtype=cfg.dtypes.compute_dtype, with_confidence=True
    )
    worker = FeaturizerWorker(
        cfg.data, cache_dir=os.path.join(args.gate_dir, "featcache"),
        msa_features_dir=f"{DEMO_MSA}/msa_features",
        uniprot_msa_features_dir=f"{DEMO_MSA}/uniprot_msa_features",
        inference_mode=True, seed=args.seed,
    )
    systems = sorted(glob.glob(f"{DEMO_DIR}/*.pkl.gz"))
    feats_list = []
    for s in systems:
        f, meta, _ = worker.load(s, num_msa_rounds=4)
        feats_list.append(dict(f))
        print(f"featurized {meta['system_id']}", flush=True)

    # shape-signature groups (static buckets), as in the gate
    groups: dict = {}
    for idx, f in enumerate(feats_list):
        sig = tuple(sorted((k, np.shape(v)) for k, v in f.items()))
        groups.setdefault(sig, []).append(idx)
    group_idx = list(groups.values())

    # graft: gate params for shared modules + fresh init for the head
    ckpt = args.ckpt or ckpt_lib.latest_checkpoint(
        os.path.join(args.gate_dir, "ckpts")
    )
    if ckpt is not None and ckpt.endswith(".npz"):
        gate = {"ema_params": ckpt_lib.load_params_npz(ckpt), "step": -1}
    elif ckpt is not None:
        gate = ckpt_lib.restore_train_state(ckpt)
    else:
        # machine restores wipe the gitignored orbax dirs; the committed
        # flat .npz EMA artifact is the restore-proof fallback
        npz = os.path.join(args.gate_dir, "ema_params.npz")
        if not os.path.exists(npz):
            sys.exit(f"no gate checkpoint in {args.gate_dir} (ckpts or npz)")
        gate = {"ema_params": ckpt_lib.load_params_npz(npz), "step": -1}
        ckpt = npz
    print(f"gate ckpt {ckpt} (step {gate['step']})", flush=True)
    micro0 = {k: jnp.asarray(v) for k, v in feats_list[0].items()}
    full_init = jax.jit(model.init, static_argnames=("method",))(
        jax.random.PRNGKey(args.seed), micro0, jax.random.PRNGKey(1),
        method="init_all",
    )
    merged = dict(full_init["params"])
    for k, v in gate["ema_params"]["params"].items():
        merged[k] = v
    params = {"params": merged}
    assert "confidence_module" in merged

    def labels(tree):
        # optax.masked would pass RAW grads through for unmasked leaves;
        # multi_transform lets the frozen partition be explicitly zeroed
        return jax.tree_util.tree_map_with_path(
            lambda path, _: (
                "head"
                if any(
                    getattr(k, "key", None) == "confidence_module"
                    for k in path
                )
                else "frozen"
            ),
            tree,
        )

    optimizer = optax.multi_transform(
        {
            "head": make_optimizer(args.lr, warmup_steps=50),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    mesh = make_mesh(dp=1)
    # a memorized denoiser's full rollouts are all near-GT, which trains
    # the head on constant "perfect" labels and it collapses to a constant
    # distribution (measured r3: pLDDT pinned at 97.0000, ipTM identical
    # to 7 decimals across systems — a constant PAE distribution makes
    # every masked mean equal).  The fix (VERDICT r3 item 3): half the
    # steps feed CORRUPTED-GT poses whose error magnitude is log-uniform
    # over 0.1-24 A (train/corrupt.py) so the lDDT/PAE/PDE labels span
    # their bins; rollout steps (long + short) keep the on-policy pose
    # distribution in the stream.
    step_corrupt = make_train_step(
        model, optimizer, cfg.loss, mesh, sigma_data=cfg.model.sigma_data,
        use_mini_rollout=True, corrupt_rollout_pose=True,
    )
    step_roll_long = make_train_step(
        model, optimizer, cfg.loss, mesh, sigma_data=cfg.model.sigma_data,
        use_mini_rollout=True, mini_rollout_steps=args.rollout,
    )
    step_roll_short = make_train_step(
        model, optimizer, cfg.loss, mesh, sigma_data=cfg.model.sigma_data,
        use_mini_rollout=True, mini_rollout_steps=2,
    )
    schedule = [step_corrupt, step_roll_long, step_corrupt, step_roll_short]
    rollouts = [args.rollout, 2]
    state = init_train_state(params, optimizer)

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    logs = {}
    steps_done = 0
    for step_i in range(args.steps):
        if args.deadline_ts and time.time() >= args.deadline_ts:
            print(
                f"deadline hit at step {step_i}/{args.steps}; "
                "proceeding to dock + gate",
                flush=True,
            )
            break
        members = group_idx[step_i % len(group_idx)]
        batch = {
            k: jnp.asarray(np.stack([feats_list[i][k] for i in members]))
            for k in feats_list[0]
        }
        key, k_step = jax.random.split(key)
        train_step = schedule[step_i % len(schedule)]
        state, logs = train_step(state, batch, k_step)
        steps_done = step_i + 1
        if (step_i + 1) % 25 == 0:
            msg = {
                k: round(float(v), 4)
                for k, v in logs.items()
                if k in ("loss", "plddt_loss", "pae_loss", "pde_loss")
            }
            print(
                f"step {step_i+1} {msg} "
                f"({(time.time()-t0)/(step_i+1):.2f}s/step)",
                flush=True,
            )

    # denoiser untouched: masked updates must leave non-head params equal
    for k in merged:
        if k == "confidence_module":
            continue
        same = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: jnp.array_equal(a, b),
                state.params["params"][k],
                params["params"][k],
            )
        )
        assert bool(same), f"non-head params moved: {k}"
    print("denoiser verified frozen", flush=True)

    os.makedirs(os.path.join(args.out, "ckpts"), exist_ok=True)
    ckpt_lib.save_train_state(os.path.join(args.out, "ckpts"), state, keep=1)
    npz_path = os.path.join(args.out, "ema_params_conf.npz")
    ckpt_lib.save_params_npz(npz_path, state.ema_params)
    print(
        f"npz artifact: {npz_path} "
        f"({os.path.getsize(npz_path)/1e6:.1f} MB)",
        flush=True,
    )

    # dock with KMeans (geometric) ranking as the baseline order and the
    # confidence head scored on every pose: conf-ranked top-1 must be at
    # least as good as the KMeans top-1 (VERDICT r3 item 3 criterion 2)
    settings = SamplerSettings(
        max_samples=2 * args.dock_poses,
        num_samples_per_round=args.dock_poses,
        max_rounds=2,
        steps=args.dock_steps,
        enable_physics_correction=True,
        num_confs=64 if on_tpu else 8,
        enable_ranking=True,
        enable_confidence=True,
        confidence_ranking=False,
        seed=args.seed,
    )
    pipe = DockingPipeline(cfg, state.ema_params, worker, settings)
    results = {}
    for s in systems:
        name = os.path.basename(s).replace(".pkl.gz", "")
        try:
            r = pipe.dock(
                s, os.path.join(args.out, "dock", name), write_outputs=True
            )
            scores = [m["ranking_confidence"] for m in r["confidence"]]
            rmsds = r["all_rmsd"]
            conf_top1 = float(rmsds[int(np.argmax(scores))])
            results[name] = {
                "top_rmsd": float(rmsds[0]),
                "top5_rmsd": [float(x) for x in rmsds[:5]],
                "kmeans_top1_rmsd": float(rmsds[0]),
                "conf_top1_rmsd": conf_top1,
                # over docked poses all RMSDs are near-identical on
                # memorized systems; reported, not gated (the gated
                # spearman is the decoy ladder below)
                "spearman_conf_vs_rmsd_docked": spearman(scores, rmsds),
                "mean_plddt_top": float(r["confidence"][0]["mean_plddt"]),
                "iptm_top": float(r["confidence"][0]["iptm"]),
            }
        except Exception as e:  # pragma: no cover - surface per-system
            results[name] = {"error": str(e)}
        print(f"  {name}: {results[name]}", flush=True)

    # --- ranker gate: decoy-ladder spearman (VERDICT r3 item 3 criterion 1)
    # Per system, score a ladder of poses spanning ligand RMSD (GT + rigid
    # shifts/rotations/jitter at 0.3-16 A in random directions): a real
    # ranker must anti-correlate confidence with RMSD over the ladder
    # (docked poses can't make this claim — on memorized systems they all
    # sit at ~0.1 A).  The old fixed-direction shifted-pose probe stays as
    # a smoke test.
    from physdock_tpu.infer import metrics as metrics_lib

    jit_cond = jax.jit(lambda p, b: model.apply(p, b, method="conditioning"))
    jit_conf = jax.jit(
        lambda p, b, s_emb, z_emb, x: model.apply(
            p, b, s_emb, z_emb, x, method="confidence"
        )
    )

    def ladder_decoys(x_gt, lig, rng):
        """[(pose, ligand_rmsd)] spanning ~0-16 A."""
        decoys = [(x_gt.copy(), 0.0)]
        for m in (0.3, 0.6, 1.0, 2.0, 4.0, 8.0, 16.0):
            for _ in range(2):
                x = x_gt.copy()
                lx = x[lig]
                c = lx.mean(0, keepdims=True)
                # random rotation blended toward identity for small m
                from physdock_tpu.utils.geometry import (
                    uniform_random_rotation_np,
                )

                R = uniform_random_rotation_np(rng, ())
                a_ = min(m / 8.0, 1.0)
                R = np.eye(3) + a_ * (R - np.eye(3))
                q, r_ = np.linalg.qr(R)
                R = q * np.sign(np.diag(r_))[None, :]
                d = rng.normal(size=3)
                d /= np.linalg.norm(d) + 1e-9
                lx = (lx - c) @ R.T + c + m * d
                lx = lx + 0.1 * m * rng.normal(size=lx.shape)
                x[lig] = lx.astype(np.float32)
                rmsd = float(
                    np.sqrt(((x[lig] - x_gt[lig]) ** 2).sum(-1).mean())
                )
                decoys.append((x, rmsd))
        return decoys

    ladder = {}
    discrimination = {}
    for sysp in systems:
        f, meta, _ = worker.load(sysp, num_msa_rounds=1)
        name = meta["system_id"]
        batch = {k: jnp.asarray(v) for k, v in f.items()}
        _, _, s_emb, z_emb = jit_cond(state.ema_params, batch)
        lig = np.asarray(meta["ligand_atom_idx"])
        x_gt = np.asarray(f["x_gt"], np.float32)

        rng = np.random.default_rng(args.seed + 100)
        confs_scores, rmsds_l = [], []
        for x, rmsd in ladder_decoys(x_gt, lig, rng):
            p_pae, _, p_plddt = jit_conf(
                state.ema_params, batch, s_emb, z_emb, jnp.asarray(x)[None]
            )
            m = metrics_lib.get_metrics(
                np.asarray(p_pae, np.float32),
                np.asarray(p_plddt, np.float32),
                x, f,
            )
            confs_scores.append(float(m["ranking_confidence"]))
            rmsds_l.append(rmsd)
        rho = spearman(confs_scores, rmsds_l)
        ladder[name] = {
            "spearman_conf_vs_rmsd": rho,
            "rmsds": [round(r, 2) for r in rmsds_l],
            "confidences": [round(c, 4) for c in confs_scores],
        }
        print(f"  ladder {name}: spearman {rho:.3f}", flush=True)

        # smoke probe (fixed-direction shifts)
        shift = np.array([1.0, 1.0, 1.0], np.float32) / np.sqrt(3.0)
        rc = []
        for dist in (0.0, 2.0, 5.0, 10.0):
            x = x_gt.copy()
            x[lig] = x[lig] + dist * shift
            p_pae, _, p_plddt = jit_conf(
                state.ema_params, batch, s_emb, z_emb, jnp.asarray(x)[None]
            )
            m = metrics_lib.get_metrics(
                np.asarray(p_pae, np.float32),
                np.asarray(p_plddt, np.float32),
                x, f,
            )
            rc.append(round(float(m["ranking_confidence"]), 4))
        discrimination[name] = {
            "ranking_confidence_by_shift": rc,
            "discriminates": bool(rc[0] > rc[2] > rc[3]),
        }
    worker.stop()

    # pass: (1) ladder spearman <= -0.5 per system (confidence
    # anti-correlates with RMSD), (2) conf-ranked top-1 at least as good
    # as KMeans top-1 (small slack: memorized poses differ by ~0.01 A),
    # (3) docked top-1 still < 2 A, (4) smoke probe discriminates
    ok_ladder = all(
        v["spearman_conf_vs_rmsd"] <= -0.5 for v in ladder.values()
    )
    ok_conf_rank = all(
        "conf_top1_rmsd" in v
        and v["conf_top1_rmsd"] <= v["kmeans_top1_rmsd"] + 0.05
        for v in results.values()
    )
    ok_dock = all(
        "top_rmsd" in v and v["top_rmsd"] < 2.0 for v in results.values()
    )
    ok = (
        ok_ladder
        and ok_conf_rank
        and ok_dock
        and all(d["discriminates"] for d in discrimination.values())
    )
    out = {
        "pass": ok,
        "pass_ladder_spearman": ok_ladder,
        "pass_conf_vs_kmeans_top1": ok_conf_rank,
        "steps": steps_done,
        "steps_requested": args.steps,
        "rollouts": rollouts,
        "corrupt_pose_mix": 0.5,
        "final_logs": {k: round(float(v), 4) for k, v in logs.items()},
        "results": results,
        "ladder": ladder,
        "discrimination": discrimination,
    }
    with open(args.gate_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
