"""Benchmark: guided end-to-end docking throughput (driver contract).

Runs the flagship workload the way the demo actually runs it
(redocking_demo.sh config): the REAL featurizer on a PoseBusters demo
system, medium model at crop 256 / 2048 atoms, 40-step EDM reverse pass,
20 poses/round, physics correction ON (round 0 FF-only + round 1 with the
adaptive conformer bank), chirality accept/reject, pocket alignment and
ranking.  poses/s = sampled poses / wall time of a warm full dock.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline: the reference publishes NO throughput numbers anywhere
(SURVEY §6, BASELINE.md).  The denominator is an ASSUMED A100 figure of
0.02 poses/s at this config times the 5x target from BASELINE.json, and
is labelled as assumed in the output; the honest headline is `value`.

Tunnel rules (memory: axon-tpu-tunnel-gotchas): single process, no
device-array closures in jit, scalar-readback timing, jitted init.
"""

from __future__ import annotations

import json
import os
import time

ASSUMED_A100_POSES_PER_SEC = 0.02  # assumed — nothing published (SURVEY §6)
TARGET_MULTIPLIER = 5.0

DEMO_DIR = "/root/reference/demo/redocking/Posebusters_subset"
DEMO_MSA = "/root/reference/demo/redocking/features"


def main():
    import jax

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
    from physdock_tpu.cli.common import load_params

    if on_tpu:
        model_name, crop, atom_crop, steps, nspr = "medium", 256, 2048, 40, 20
    else:  # CI smoke: tiny everything
        model_name, crop, atom_crop, steps, nspr = "toy", 64, 256, 3, 2

    cfg = PhysDockConfig.named(
        model_name,
        crop_size=crop,
        atom_crop_size=atom_crop,
        bf16=on_tpu,
        infer_use_pocket=True,
        infer_use_key_res=True,
        num_augmentation_sample=2,
    )
    fz_kwargs = dict(
        msa_features_dir=f"{DEMO_MSA}/msa_features",
        uniprot_msa_features_dir=f"{DEMO_MSA}/uniprot_msa_features",
        inference_mode=True,
        seed=0,
    )
    if on_tpu:
        # featurize in a clean worker subprocess: the PJRT client's relay
        # threads multiply host numpy wall time 5-20x in this process
        # (measured; see data/feat_worker.py)
        from physdock_tpu.data.feat_worker import FeaturizerWorker

        featurizer = FeaturizerWorker(cfg.data, **fz_kwargs)
    else:
        featurizer = SystemFeaturizer(cfg.data, **fz_kwargs)
    params = load_params(None, cfg)
    # exactly 2 rounds every run: round 0 (FF-only) + round 1 (banked);
    # max_samples > nspr so the protocol never breaks early
    settings = SamplerSettings(
        max_samples=2 * nspr,
        num_samples_per_round=nspr,
        max_rounds=2,
        steps=steps,
        enable_physics_correction=True,
        num_confs=128 if on_tpu else 8,
        enable_ranking=True,
        seed=0,
    )
    pipe = DockingPipeline(cfg, params, featurizer, settings)

    if not os.path.isdir(DEMO_DIR):
        raise SystemExit("demo assets unavailable")
    import glob

    systems = sorted(glob.glob(f"{DEMO_DIR}/*.pkl.gz"))
    if not on_tpu:
        systems = systems[:1]

    def dock_pass():
        # the production shape: many systems, worker featurization
        # prefetched behind the previous system's device rounds.
        # batch_size=1: cross-system device batching measured SLOWER here
        # (33 s vs 20 s per pass) — collecting every load upfront forfeits
        # the load/rounds overlap and the B=4 vmapped sampler does not beat
        # 4 sequential programs at 20 poses each; it stays available for
        # small-pose-count screens where it wins 3.6x.
        return pipe.dock_many(
            systems, "/tmp/bench_out", write_outputs=False
        )

    dock_pass()  # compile + warmup (round-0 and banked sampler variants)
    n_iters = 2
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        res_list = dock_pass()
        times.append(time.perf_counter() - t0)
        import sys

        for res in res_list:
            print(
                f"iter {times[-1]:.2f}s: {res['system_id']}"
                f" timings={res.get('timings')}",
                file=sys.stderr,
            )
    dt = min(times)  # episodic host contention injects tens of seconds of
    # noise (scripts/tpu_contention_probe.py); min is the hardware number
    res = res_list[-1]

    poses_sampled = nspr * sum(r["rounds"] for r in res_list)
    poses_per_sec = poses_sampled / dt
    baseline = TARGET_MULTIPLIER * ASSUMED_A100_POSES_PER_SEC
    print(
        json.dumps(
            {
                "metric": (
                    f"poses/sec/chip (guided e2e dock, {model_name}, crop "
                    f"{crop}/{atom_crop}, {steps} steps, {res['rounds']} rounds, "
                    f"{len(systems)} systems, real featurizer, {platform})"
                ),
                "value": round(poses_per_sec, 4),
                "unit": "poses/s",
                "vs_baseline": round(poses_per_sec / baseline, 3),
                "baseline_note": (
                    "denominator is an ASSUMED A100 0.02 poses/s x5 target; "
                    "the reference publishes no throughput (SURVEY paragraph 6)"
                ),
                "feat_time_s": res["feat_time_s"],
                "dock_time_s": round(dt, 3),
                "n_systems": len(systems),
            }
        )
    )


if __name__ == "__main__":
    main()
