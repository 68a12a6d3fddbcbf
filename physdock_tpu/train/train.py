"""Training CLI.

TPU-native replacement for the Uni-Core harness
(reference: tasks/unicore_train/train.sh + __init__.py): pjit/shard_map DP
over the device mesh, optax adam + per-replica/global clipping + stair-decay
LR + EMA, orbax checkpoints every N updates keeping K.

    python -m physdock_tpu.train.train --dataset_dir DATA -o ckpts/ \
        --model_name medium --batch_size 8 --crop_size 256
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.feature_loader import SystemFeaturizer
from physdock_tpu.model.physdock import PhysDock
from physdock_tpu.parallel.mesh import make_mesh
from physdock_tpu.train import checkpoint as ckpt_lib
from physdock_tpu.train.optim import make_optimizer
from physdock_tpu.train.sampler import (
    WeightedSystemSampler,
    batch_iterator,
    prefetch,
)
from physdock_tpu.train.step import init_train_state, make_train_step


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("-o", "--ckpt_dir", required=True)
    p.add_argument("--model_name", default="medium")
    p.add_argument("--batch_size", type=int, default=None, help="global; default = #devices")
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--atom_crop_size", type=int, default=2048)
    p.add_argument("--num_augmentation_sample", type=int, default=48)
    p.add_argument("--total_steps", type=int, default=120000)
    p.add_argument("--lr", type=float, default=1.8e-3)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--save_every", type=int, default=400)
    p.add_argument("--keep_ckpts", type=int, default=40)
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--use_mini_rollout", action="store_true",
                   help="train the PAE/PDE/pLDDT confidence heads on a "
                        "short no-grad rollout (train.sh --use-mini-rollout)")
    p.add_argument("--mini_rollout_steps", type=int, default=12)
    p.add_argument("--alpha_pae", type=float, default=None,
                   help="override LossConfig.alpha_pae (pae weight = "
                        "alpha_confidence * alpha_pae)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--init_from_ckpt", default=None)
    p.add_argument("--seed", type=int, default=0)
    # multi-host (DCN) entry: the reference trains multi-node via OMPI env
    # plumbing + torch.distributed.run (train.sh:1-12,36,69-81); here the
    # same single-controller-per-host program spans slices once
    # jax.distributed.initialize connects the processes
    p.add_argument("--tp", type=int, default=1,
                   help="pair-row tensor-parallel axis size (devices per "
                        "replica; parallel/tp.py) — dp becomes #devices/tp")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port; enables multi-host")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args(argv)

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        print(
            f"multi-host: process {jax.process_index()}/{jax.process_count()} "
            f"local devices {len(jax.local_devices())} "
            f"global devices {len(jax.devices())}"
        )

    cfg = PhysDockConfig.named(
        args.model_name,
        crop_size=args.crop_size,
        atom_crop_size=args.atom_crop_size,
        bf16=args.bf16,
        inference_mode=False,
        num_augmentation_sample=args.num_augmentation_sample,
    )
    mesh = make_mesh(tp=args.tp)
    if args.tp > 1:
        from physdock_tpu.parallel.tp import enable_tp

        enable_tp(mesh)
    n_dev = mesh.shape["dp"]
    batch_size = args.batch_size or n_dev
    assert batch_size % n_dev == 0

    import dataclasses as _dc

    loss_cfg = cfg.loss
    if args.alpha_pae is not None:
        loss_cfg = _dc.replace(loss_cfg, alpha_pae=args.alpha_pae)
    model = PhysDock(
        cfg=cfg.model,
        dtype=cfg.dtypes.compute_dtype,
        with_confidence=args.use_mini_rollout,
    )
    optimizer = make_optimizer(args.lr, args.warmup_steps)

    # per-host input pipeline: each process featurizes only its share of
    # the global batch (distinct sampler stream per host)
    n_proc = jax.process_count()
    assert batch_size % n_proc == 0, (batch_size, n_proc)
    local_batch_size = batch_size // n_proc
    featurizer = SystemFeaturizer(
        cfg.data, inference_mode=False, seed=args.seed, pad_to_bucket=False
    )
    sampler = WeightedSystemSampler.from_dataset_dir(
        args.dataset_dir, args.seed + 7919 * jax.process_index()
    )
    batches = prefetch(
        batch_iterator(
            sampler, featurizer, local_batch_size, args.crop_size,
            args.atom_crop_size,
        )
    )

    from physdock_tpu.parallel.mesh import batch_sharding

    b_sharding = batch_sharding(mesh)

    def globalize(local):
        """Assemble the dp-sharded global batch from this host's shard."""
        if n_proc == 1:
            return {k: jnp.asarray(v) for k, v in local.items()}
        import numpy as _np

        return {
            k: jax.make_array_from_process_local_data(
                b_sharding, _np.asarray(v)
            )
            for k, v in local.items()
        }

    first = next(batches)
    micro0 = {k: jnp.asarray(v[0]) for k, v in first.items()}
    key = jax.random.PRNGKey(args.seed)
    resume = args.init_from_ckpt or ckpt_lib.latest_checkpoint(args.ckpt_dir)
    if resume and resume.endswith(".pt"):
        from physdock_tpu.model.import_weights import import_checkpoint

        params = import_checkpoint(resume)
        state = init_train_state(params, optimizer)
    elif resume:
        import numpy as _np

        template_params = model.init(
            key,
            micro0,
            jax.random.PRNGKey(1),
            method="init_all" if args.use_mini_rollout else None,
        )
        tstate = init_train_state(template_params, optimizer)
        restored = ckpt_lib.restore_train_state(
            resume,
            like={
                "step": _np.asarray(0),
                "params": tstate.params,
                "opt_state": tstate.opt_state,
                "ema_params": tstate.ema_params,
            },
        )
        params = restored["params"]
        state = init_train_state(params, optimizer)._replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"],
        )
    else:
        params = model.init(
            key,
            micro0,
            jax.random.PRNGKey(1),
            method="init_all" if args.use_mini_rollout else None,
        )
        state = init_train_state(params, optimizer)

    train_step = make_train_step(
        model, optimizer, loss_cfg, mesh, ema_decay=args.ema_decay,
        sigma_data=cfg.model.sigma_data,
        use_mini_rollout=args.use_mini_rollout,
        mini_rollout_steps=args.mini_rollout_steps,
    )

    batch = first
    t0 = time.time()
    while int(state.step) < args.total_steps:
        key, k_step = jax.random.split(key)
        state, logs = train_step(state, globalize(batch), k_step)
        step = int(state.step)
        if step % 10 == 0:
            logs = {k: float(v) for k, v in logs.items()}
            dt = time.time() - t0
            print(f"step {step} loss {logs['loss']:.4f} ({dt:.1f}s) {logs}")
            t0 = time.time()
        if step % args.save_every == 0 and jax.process_index() == 0:
            path = ckpt_lib.save_train_state(args.ckpt_dir, state, args.keep_ckpts)
            print(f"checkpoint: {path}")
        batch = next(batches)


if __name__ == "__main__":
    main()
