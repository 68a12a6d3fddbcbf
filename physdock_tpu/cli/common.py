"""Shared CLI plumbing: argparse surface matching the reference
(redocking.py:460-487 / screening.py), model/params loading."""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp


def add_common_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("-o", "--output_dir", required=True)
    p.add_argument("--params", default=None, help="checkpoint (.pt torch or orbax dir)")
    p.add_argument("--model_name", default="medium",
                   choices=["toy", "tiny", "small", "medium", "full"])
    p.add_argument("--ccd_blob", default=None,
                   help="external ccd_id_meta_data.pkl.gz (reference-"
                        "compatible schema) for ligand CCD chemistry")
    p.add_argument("--msa_features_dir", default=None)
    p.add_argument("--uniprot_msa_features_dir", default=None)
    p.add_argument("--max_samples", type=int, default=5)
    p.add_argument("--num_samples_per_round", type=int, default=5)
    p.add_argument("--max_rounds", type=int, default=10)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--enable_physics_correction", action="store_true")
    p.add_argument("--mmff_iters", type=int, default=5)
    p.add_argument("--eta", type=float, default=6.0,
                   help="mmff_gamma_0_factor_start")
    p.add_argument("--num_confs", type=int, default=128)
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--atom_crop_size", type=int, default=None)
    p.add_argument("--pocket_type", default="atom", choices=["atom", "ca"])
    p.add_argument("--pocket_cutoff", type=float, default=10.0)
    p.add_argument("--pocket_dist_type", default="ligand",
                   choices=["ligand", "ligand_centre"])
    p.add_argument("--use_pocket", action="store_true")
    p.add_argument("--use_key_res", action="store_true")
    p.add_argument("--key_res_random_mask_ratio", type=float, default=0.5)
    p.add_argument("--rho", type=float, default=1000.0)
    p.add_argument("--enable_ranking", action="store_true")
    p.add_argument("--enable_sidechain_relaxation", action="store_true")
    p.add_argument("--align_mode", default="pocket_ca")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--feat_cache_dir", default=None,
                   help="disk-cache featurized systems here (keyed by "
                        "system content hash + config; worker featurizer "
                        "only) — warm loads become a ~0.1 s pkl read")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ebable_x_gt_ligand_as_ref_pos", action="store_true",
                   help="GT-conformer ablation (reference redocking.py:79-82)")
    p.add_argument("--smiles_protonate_ph", type=float, default=-1.0,
                   help="assign physiological-pH formal charges to SMILES "
                        "ligands (e.g. 7.4); <0 = off (reference parity: "
                        "RDKit parse-time sanitization only)")
    p.add_argument("--smiles_canonical_tautomer", action="store_true",
                   help="canonicalize SMILES ligand tautomers before "
                        "embedding (data/protomers.py)")
    p.add_argument("--enable_confidence", action="store_true",
                   help="score poses with the trained confidence head "
                        "(pLDDT/PAE/pTM/ipTM per pose; requires params "
                        "trained with the head)")
    p.add_argument("--confidence_ranking", action="store_true",
                   help="rank poses by 0.8*ipTM + 0.2*pTM - has_clash "
                        "instead of geometric KMeans medoids (implies "
                        "--enable_confidence)")


def build_pipeline(args):
    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.feature_loader import SystemFeaturizer
    from physdock_tpu.infer.pipeline import DockingPipeline, SamplerSettings
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.utils.compile_cache import enable as enable_compile_cache

    # no-crop bucket ladders cost ~56 compiles; a persistent cache makes
    # the second process pay ~0 compile time (NOTES_ROUND2.md item 5)
    enable_compile_cache()

    cfg = PhysDockConfig.named(
        args.model_name,
        crop_size=args.crop_size,
        # no flags at all -> no-crop blind docking (reference: crop_size
        # None -> no crop, redocking.py:471); bucket ladder bounds shapes
        atom_crop_size=args.atom_crop_size
        or (args.crop_size * 8 if args.crop_size else None),
        bf16=args.bf16,
        infer_pocket_type=args.pocket_type,
        infer_pocket_cutoff=args.pocket_cutoff,
        infer_pocket_dist_type=args.pocket_dist_type,
        infer_use_pocket=args.use_pocket,
        infer_use_key_res=args.use_key_res,
        key_res_random_mask_ratio=args.key_res_random_mask_ratio,
        smiles_protonate_ph=args.smiles_protonate_ph,
        smiles_canonical_tautomer=args.smiles_canonical_tautomer,
    )
    want_confidence = args.enable_confidence or args.confidence_ranking
    from physdock_tpu.data.ccd import CCDLibrary

    fz_kwargs = dict(
        ccd=CCDLibrary(args.ccd_blob) if args.ccd_blob else None,
        msa_features_dir=args.msa_features_dir,
        uniprot_msa_features_dir=args.uniprot_msa_features_dir,
        inference_mode=True,
        seed=args.seed,
        use_x_gt_ligand_as_ref_pos=args.ebable_x_gt_ligand_as_ref_pos,
    )
    import jax

    if jax.devices()[0].platform != "cpu":
        # device-owning process: featurize in a clean worker subprocess
        # (data/feat_worker.py — PJRT client threads otherwise multiply
        # host featurization wall time)
        from physdock_tpu.data.feat_worker import FeaturizerWorker

        featurizer = FeaturizerWorker(
            cfg.data, cache_dir=getattr(args, "feat_cache_dir", None),
            **fz_kwargs,
        )
    else:
        featurizer = SystemFeaturizer(cfg.data, **fz_kwargs)
    params = load_params(args.params, cfg, with_confidence=want_confidence)
    settings = SamplerSettings(
        max_samples=args.max_samples,
        num_samples_per_round=args.num_samples_per_round,
        max_rounds=args.max_rounds,
        steps=args.steps,
        enable_physics_correction=args.enable_physics_correction,
        mmff_iters=args.mmff_iters,
        eta=args.eta,
        num_confs=args.num_confs,
        rho=args.rho,
        enable_ranking=args.enable_ranking,
        enable_sidechain_relaxation=args.enable_sidechain_relaxation,
        align_mode=args.align_mode,
        seed=args.seed,
        enable_confidence=want_confidence,
        confidence_ranking=args.confidence_ranking,
    )
    return DockingPipeline(cfg, params, featurizer, settings)


def load_params(path: Optional[str], cfg, with_confidence: bool = False):
    """Load params from a torch .pt (converted), an orbax checkpoint dir, or
    initialize randomly when absent (useful for smoke runs)."""
    if path is None:
        import numpy as np

        from physdock_tpu.data.synthetic import make_synthetic_batch
        from physdock_tpu.model.physdock import PhysDock

        model = PhysDock(
            cfg=cfg.model, dtype=cfg.dtypes.compute_dtype,
            with_confidence=with_confidence,
        )
        b = {
            k: jnp.asarray(v)
            for k, v in make_synthetic_batch(
                n_tokens=16, n_atoms=48, n_msa=4
            ).items()
        }
        # init_all also creates the confidence head's params when enabled
        # (the training forward alone doesn't touch it)
        method = "init_all" if with_confidence else None
        return jax.jit(model.init, static_argnames=("method",))(
            jax.random.PRNGKey(0), b, jax.random.PRNGKey(1), method=method
        )
    if path.endswith(".pt"):
        from physdock_tpu.model.import_weights import import_checkpoint

        return import_checkpoint(path)
    if path.endswith(".npz"):
        from physdock_tpu.train.checkpoint import load_params_npz

        return load_params_npz(path)
    from physdock_tpu.train.checkpoint import restore_params

    return restore_params(path)
