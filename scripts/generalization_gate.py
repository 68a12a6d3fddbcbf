"""Held-out generalization gate (VERDICT r3 weak #8 / next-round item 5).

Every round-3 accuracy gate trains and docks the SAME 4 demo systems —
memorization.  This gate proves the framework LEARNS TO DOCK: synthesize
N training complexes and M held-out complexes with data/demo.py (varied
receptor sequences -> varied groove chemistry; varied ligand SMILES ->
varied sizes/shapes, embedded by the in-house chem stack), train a
small model on the training set only, then run the full guided pipeline
on the held-out systems it has never seen.  Gate: top-ranked ligand
RMSD < 2 A on every held-out system.

Run (TPU):  scripts/tpu_retry.sh /tmp/gen_gate.log 7200 \
                python scripts/generalization_gate.py
CPU smoke:  python scripts/generalization_gate.py --cpu --n_train 2 \
                --n_held 1 --steps 4 --dock_steps 2 --dock_poses 2

Writes GENERALIZATION_GATE.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Receptor sequences: helix-forming 28-mers with varied groove-facing
# chemistry (positions mutated across A/L/V/I/F/W/Y/S/T/N/Q/K/R/E/D/M/H).
_AA_POOL = "ALVIFWYSTNQKREDMH"

# Drug-like ligands the in-house chem stack parses+embeds exactly
# (subset style of tests/test_chem_roundtrip.py corpus; first 8 mirror
# the screening demo's size range)
_TRAIN_SMILES = [
    "CC(=O)Nc1ccc(O)cc1",           # paracetamol
    "CC(C)Cc1ccc(C(C)C(=O)O)cc1",   # ibuprofen
    "OC(=O)c1ccccc1OC(C)=O",        # aspirin
    "c1ccc2c(c1)ncc(CN)n2",         # aminomethyl-quinoxaline
    "CCOC(=O)c1ccc(N)cc1",          # benzocaine
    "CN1CCN(CC1)c1ccccc1",          # phenylpiperazine
    "OCC(O)c1ccc(O)c(O)c1",         # catechol diol
    "CC(N)Cc1ccccc1",               # amphetamine
    "Clc1ccc(CC(=O)O)cc1",          # chlorophenylacetic acid
    "COc1ccc(CCN)cc1",              # methoxyphenethylamine
    "CC(=O)OC1CCCCC1",              # cyclohexyl acetate
    "NC(=O)c1ccccc1O",              # salicylamide
    "CCN(CC)CCNC(=O)c1ccccc1",      # procainamide-like
    "CSc1ccccc1C(=O)O",             # thioanisole acid
    "OC(c1ccccc1)c1ccccc1",         # benzhydrol
    "CC1CCC(CC1)C(=O)O",            # methylcyclohexane acid
]
_HELD_SMILES = [
    "CC(C)NCC(O)c1ccc(O)cc1",       # synephrine-like (unseen)
    "COc1ccccc1OCCN",               # unseen ether-amine
    "CC(=O)Nc1ccccc1C(=O)O",        # unseen acetamido-benzoate
    "OCc1ccc(Cl)cc1CN",             # unseen chloro benzylamine
]


def _mutate_sequence(rng, template: str) -> str:
    seq = list(template)
    for i in rng.choice(len(seq), size=8, replace=False):
        seq[i] = _AA_POOL[rng.integers(len(_AA_POOL))]
    return "".join(seq)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_train", type=int, default=12)
    p.add_argument("--n_held", type=int, default=4)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--model", default="toy")
    p.add_argument("--crop", type=int, default=128)
    p.add_argument("--atom_crop", type=int, default=768)
    p.add_argument("--aug", type=int, default=8)
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--out", default="/root/repo/_generalization")
    p.add_argument("--gate_out", default="/root/repo/GENERALIZATION_GATE.json")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dock_steps", type=int, default=40)
    p.add_argument("--dock_rounds", type=int, default=1)
    p.add_argument("--dock_poses", type=int, default=10)
    p.add_argument("--deadline_ts", type=float, default=0.0)
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
    from physdock_tpu.data.demo import DEMO_SEQUENCE, make_demo_complex
    from physdock_tpu.data.feat_worker import FeaturizerWorker
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.parallel.mesh import make_mesh
    from physdock_tpu.train import checkpoint as ckpt_lib
    from physdock_tpu.train.optim import make_optimizer
    from physdock_tpu.train.step import init_train_state, make_train_step

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # ---- synthesize the two disjoint system sets
    def synth(tag, smiles_list, n):
        pkls = []
        for i in range(n):
            smi = smiles_list[i % len(smiles_list)]
            seq = _mutate_sequence(rng, DEMO_SEQUENCE)
            d = os.path.join(args.out, "systems", f"{tag}{i:02d}")
            try:
                pkl = make_demo_complex(
                    d, name=f"{tag}{i:02d}", sequence=seq, smiles=smi,
                    seed=int(rng.integers(1 << 30)),
                )
                pkls.append(pkl)
            except Exception as e:  # clash-free placement can fail for a seq
                print(f"  synth {tag}{i:02d} failed ({e}); skipping", flush=True)
        return pkls

    t0 = time.time()
    train_pkls = synth("train", _TRAIN_SMILES, args.n_train)
    held_pkls = synth("held", _HELD_SMILES, args.n_held)
    assert len(train_pkls) >= max(2, args.n_train - 2), "too many synth failures"
    assert len(held_pkls) >= 1
    print(
        f"synthesized {len(train_pkls)} train + {len(held_pkls)} held-out "
        f"in {time.time()-t0:.1f}s",
        flush=True,
    )

    cfg = PhysDockConfig.named(
        args.model,
        crop_size=args.crop,
        atom_crop_size=args.atom_crop,
        bf16=on_tpu,
        infer_use_pocket=True,
        infer_use_key_res=True,
        num_augmentation_sample=args.aug,
    )
    worker = FeaturizerWorker(
        cfg.data, cache_dir=os.path.join(args.out, "featcache"),
        inference_mode=True, seed=args.seed,
    )

    print("featurizing train set...", flush=True)
    feats_list, msa_variants = [], []
    for s in train_pkls:
        f, meta, _ = worker.load(s, num_msa_rounds=2)
        feats_list.append(dict(f))
        v = meta.get("batch_msa_feat")
        if v is None:
            v = []
        msa_variants.append([np.asarray(x) for x in v])

    keys0 = set(feats_list[0])
    groups: dict = {}
    for idx, f in enumerate(feats_list):
        sig = tuple(sorted((k, np.shape(v)) for k, v in f.items()))
        groups.setdefault(sig, []).append(idx)
    group_idx = list(groups.values())
    print(f"bucket groups: {[len(g) for g in group_idx]}", flush=True)

    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    optimizer = make_optimizer(args.lr, args.warmup)
    mesh = make_mesh(dp=1)
    micro0 = {k: jnp.asarray(v) for k, v in feats_list[0].items()}
    key = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)(key, micro0, jax.random.PRNGKey(1))
    state = init_train_state(params, optimizer)

    start_step = 0
    resume = ckpt_lib.latest_checkpoint(os.path.join(args.out, "ckpts"))
    if resume:
        restored = ckpt_lib.restore_train_state(
            resume,
            like={
                "step": np.asarray(0),
                "params": state.params,
                "opt_state": state.opt_state,
                "ema_params": state.ema_params,
            },
        )
        state = init_train_state(restored["params"], optimizer)._replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"],
        )
        start_step = int(restored["step"])
        print(f"resumed at step {start_step}", flush=True)

    train_step = make_train_step(
        model, optimizer, cfg.loss, mesh, sigma_data=cfg.model.sigma_data
    )
    key = jax.random.fold_in(key, start_step)
    nrng = np.random.default_rng((args.seed, start_step))

    def build_batch(step_i):
        members = group_idx[step_i % len(group_idx)]
        batch = {}
        for k in keys0:
            batch[k] = np.stack([np.asarray(feats_list[i][k]) for i in members])
        if all(len(msa_variants[i]) > 0 for i in members):
            batch["msa_feat"] = np.stack(
                [
                    msa_variants[i][nrng.integers(len(msa_variants[i]))]
                    for i in members
                ]
            )
        return {k: jnp.asarray(v) for k, v in batch.items()}

    print("training...", flush=True)
    t0 = time.time()
    losses = []
    steps_reached = start_step
    for step_i in range(start_step, args.steps):
        margin = 300.0 if step_i == start_step else 0.0
        if args.deadline_ts and time.time() > args.deadline_ts - margin:
            print(f"deadline at step {step_i}; stopping training", flush=True)
            break
        key, k_step = jax.random.split(key)
        state, logs = train_step(state, build_batch(step_i), k_step)
        steps_reached = step_i + 1
        losses.append(float(logs["loss"]))
        if (step_i + 1) % 50 == 0:
            print(
                f"step {step_i+1} loss {np.mean(losses[-50:]):.4f} "
                f"({(time.time()-t0)/max(step_i+1-start_step,1):.2f}s/step)",
                flush=True,
            )
        if (step_i + 1) % args.ckpt_every == 0:
            ckpt_lib.save_train_state(
                os.path.join(args.out, "ckpts"), state, keep=2
            )

    if steps_reached > start_step:
        ckpt_lib.save_train_state(os.path.join(args.out, "ckpts"), state, keep=2)
    ckpt_lib.save_params_npz(
        os.path.join(args.out, "ema_params_gen.npz"), state.ema_params
    )

    # ---- dock BOTH sets with the full guided pipeline (train-set results
    # are the sanity reference: held-out ~ train means generalization)
    settings = SamplerSettings(
        max_samples=2 * args.dock_poses,
        num_samples_per_round=args.dock_poses,
        max_rounds=args.dock_rounds,
        steps=args.dock_steps,
        enable_physics_correction=True,
        num_confs=64 if on_tpu else 8,
        enable_ranking=True,
        seed=args.seed,
    )
    pipe = DockingPipeline(cfg, state.ema_params, worker, settings)

    def dock_all(pkls, tag):
        out = {}
        for s in pkls:
            name = os.path.basename(s).replace(".pkl.gz", "")
            try:
                r = pipe.dock(
                    s, os.path.join(args.out, "dock", name), write_outputs=True
                )
                out[name] = {
                    "top_rmsd": float(r["top5_rmsd"][0]),
                    "top5_rmsd": [float(x) for x in r["top5_rmsd"][:5]],
                }
            except Exception as e:
                out[name] = {"error": str(e)}
            print(f"  {tag} {name}: {out[name]}", flush=True)
        return out

    print("docking held-out systems (never trained on)...", flush=True)
    held_results = dock_all(held_pkls, "held")
    print("docking 4 train systems (sanity)...", flush=True)
    train_results = dock_all(train_pkls[:4], "train")
    worker.stop()

    ok = all(
        "top_rmsd" in v and v["top_rmsd"] < 2.0 for v in held_results.values()
    )
    out = {
        "pass": ok,
        "steps": steps_reached,
        "steps_requested": args.steps,
        "model": args.model,
        "n_train_systems": len(train_pkls),
        "n_held_systems": len(held_pkls),
        "final_loss": float(np.mean(losses[-50:])) if losses else None,
        "held_out": held_results,
        "train_sanity": train_results,
    }
    with open(args.gate_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
