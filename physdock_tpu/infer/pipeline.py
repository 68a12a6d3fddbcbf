"""Docking inference pipeline: redocking and virtual screening.

Host-side orchestration of the on-device sampler, mirroring the reference
round structure (redocking.py:156-456) with the device/host split inverted
for TPU: everything per-step lives in one jitted lax.scan (conditioning +
sampling + chirality checks on device); the host only handles the few-round
accept/reject loop, adaptive step-scale, IO and ranking.

Round protocol (reference redocking.py:181-345) lives in
`infer/rounds.RoundProtocol`: round 0 unguided at high sigma (FF-only),
per-round conformer-bank rebuild from accepted ligand poses + epsilon-top
conformer refill, bounded reject backfill, adaptive eta.  The bank is a
STATIC [max_samples, L, 3] scan input swapped host-side per round, and the
adaptive factor is a traced scalar — so the whole multi-round dock costs
at most two compiles (round-0 variant + banked variant) per bucket.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from physdock_tpu.config import PhysDockConfig
from physdock_tpu.data.feat_worker import FeaturizerWorker
from physdock_tpu.data.feature_loader import SystemFeaturizer
from physdock_tpu.data.embed import generate_conformers
from physdock_tpu.infer import ranking as ranking_lib
from physdock_tpu.infer import writers
from physdock_tpu.infer.rounds import RoundProtocol, pairwise
from physdock_tpu.model.diffusion import PhysicsGuidance, sample_diffusion
from physdock_tpu.model.forcefield import build_ligand_ff, chirality_correct
from physdock_tpu.model.physdock import PhysDock
from physdock_tpu.utils.io import dump_json


def _json_safe(d: Dict) -> Dict:
    """numpy scalars/arrays -> plain python for json dumps."""
    out = {}
    for k, v in d.items():
        if isinstance(v, (np.bool_, bool)):
            out[k] = bool(v)
        elif isinstance(v, (np.integer, int)):
            out[k] = int(v)
        elif isinstance(v, (np.floating, float)):
            out[k] = round(float(v), 4)
        elif isinstance(v, np.ndarray):
            out[k] = v.tolist()
        else:
            out[k] = v
    return out


@dataclasses.dataclass
class SamplerSettings:
    """Flag surface of the reference CLIs (redocking.py:460-487)."""

    max_samples: int = 5
    num_samples_per_round: int = 5
    max_rounds: int = 10
    steps: int = 40
    enable_physics_correction: bool = False
    mmff_iters: int = 5
    eta: float = 6.0  # mmff_gamma_0_factor_start
    num_confs: int = 128
    rho: float = 1000.0
    gamma_0: float = 0.8
    gamma_min: float = 1.0
    noise_scale_lambda: float = 1.003
    step_scale_eta: float = 1.5
    enable_ranking: bool = True
    enable_sidechain_relaxation: bool = False
    align_mode: str = "pocket_ca"
    seed: int = 0
    # confidence head at inference (requires params trained with the head,
    # cfg.model.with_confidence): per-pose pLDDT/PAE/pTM/ipTM metrics, and
    # optionally ranking by 0.8*ipTM + 0.2*pTM - has_clash instead of the
    # geometric KMeans medoids (the fused-confidence ranking path)
    enable_confidence: bool = False
    confidence_ranking: bool = False
    # pair-row tensor parallelism over a tp mesh axis (parallel/tp.py):
    # z/ap/bias memory scales 1/tp — the multi-chip lever for crop-free
    # 768+ token trunks.  tp=1 = single-chip (identical trace).
    tp: int = 1


class DockingPipeline:
    def __init__(
        self,
        config: PhysDockConfig,
        params,
        featurizer: SystemFeaturizer,
        settings: Optional[SamplerSettings] = None,
    ):
        self.config = config
        self.s = settings or SamplerSettings()
        self.model = PhysDock(
            cfg=config.model, dtype=config.dtypes.compute_dtype,
            with_confidence=self.s.enable_confidence,
        )
        self.params = params
        self.featurizer = featurizer  # SystemFeaturizer or FeaturizerWorker
        if self.s.tp > 1:
            # process-lifetime ambient mesh: the pipeline's jitted fns are
            # traced lazily on first call, which must see the constraints
            from physdock_tpu.parallel.mesh import make_mesh
            from physdock_tpu.parallel.tp import enable_tp

            enable_tp(make_mesh(dp=1, tp=self.s.tp))
        # jit wrappers are CACHED on the pipeline — rebuilding them per dock
        # call would discard XLA's compile cache and recompile every system
        self._jit_sample = None
        self._jit_sample_batched = None
        self._jit_conf = None

    # ----------------------------------------------------------- featurize

    def _load(self, system, **kw):
        """featurizer.load, worker-aware.

        With a FeaturizerWorker the CPU-heavy stages (featurization AND the
        ETKDG-style conformer bank) run in a clean subprocess — off the
        PJRT-client process whose relay threads multiply host numpy wall
        time 5-20x on the tunneled single-core TPU host (see
        data/feat_worker.py), and off the device-owning process in general
        (dataloader-worker pattern).  The bank rides back in meta.
        """
        if isinstance(self.featurizer, FeaturizerWorker):
            want = self.s.enable_physics_correction
            feats, meta, confs = self.featurizer.load(
                system,
                num_confs=self.s.num_confs if want else None,
                conf_seed=self.s.seed,
                compact=True,
                **kw,
            )
            if confs is not None:
                meta["_conf_bank"] = confs
            return feats, meta
        return self.featurizer.load(system, **kw)

    # ------------------------------------------------------------- sampling

    def _sample_fn(self):
        if self._jit_sample is not None:
            return self._jit_sample
        s = self.s

        @functools.partial(jax.jit, static_argnames=("num_sample", "use_bank"))
        def fn(
            params, batch, key, conditioning, guidance, factor, num_sample,
            use_bank,
        ):
            # conditioning=None fuses the trunk into the SAME device program
            # as the sampler: one dispatch per round instead of two.  On the
            # tunneled single-core host each jit call pays pytree-arg
            # processing over the ~40-leaf batch dict plus a ~25 ms dispatch
            # round-trip, which the r4 stage profile showed dominating the
            # sampler-vs-e2e MFU gap.  (None vs tuple = two compiles; both
            # are cached.)  The computed conditioning is returned device-
            # resident for reuse (confidence scoring, MSA-static rounds).
            if conditioning is None:
                conditioning = self.model.apply(
                    params, batch, method="conditioning"
                )
            x = sample_diffusion(
                self.model,
                params,
                batch,
                key,
                num_sample=num_sample,
                steps=s.steps,
                gamma_0=s.gamma_0,
                gamma_min=s.gamma_min,
                noise_scale_lambda=s.noise_scale_lambda,
                step_scale_eta=s.step_scale_eta,
                karras_rho=s.rho,
                guidance=guidance,
                mmff_gamma_0_factor=factor,
                mmff_iters=s.mmff_iters,
                align_ref_pos=use_bank,
                conditioning=conditioning,
            )
            # chirality accept/reject fused into the same device program
            # (saves one dispatch + transfer round-trip per round)
            if guidance is not None and guidance.ff is not None:
                lig = jnp.take(x, guidance.ligand_idx, axis=-2, mode="clip")
                ok = chirality_correct(lig, guidance.ff)
            else:
                ok = jnp.ones((num_sample,), bool)
            return x, ok, conditioning

        self._jit_sample = fn
        return fn

    def _build_guidance(self, batch, meta, pad_atoms: Optional[int] = None):
        """Returns (PhysicsGuidance template, original conformer bank).

        The guidance's conf arrays are BANK-shaped ([max_samples, L, ...]) —
        the per-round adaptive bank is swapped in via dataclasses.replace
        with identical shapes (zero recompiles across rounds).  The full
        ETKDG-style bank ([num_confs, L, 3]) is returned separately for the
        RoundProtocol's host-side epsilon ranking.

        pad_atoms pads the ligand axis to a common size (batched screening
        over ligands of different sizes; padded entries carry mask 0 and
        out-of-range scatter indices).
        """
        mol = meta.get("ref_mol")
        lig_idx = np.asarray(meta["ligand_atom_idx"])
        if mol is None or len(lig_idx) == 0 or mol.num_atoms != len(lig_idx):
            return None, None
        confs = meta.get("_conf_bank")
        if confs is None:
            confs = generate_conformers(
                mol, num_confs=self.s.num_confs, base_coords=mol.coords,
                rng=np.random.default_rng(self.s.seed),
            )
        ff = build_ligand_ff(
            mol.atomic_numbers.tolist(),
            [(i, j) for i, j, _ in mol.bonds],
            confs[0],
            chiral_centers=mol.chiral_centers(),
            # E/Z stereo pairs stay rigid through FF relaxation
            rigid_14=[
                (min(a, b), max(a, b))
                for a, _, _, b, _ in getattr(mol, "stereo_bonds", None) or []
            ],
        )
        n_atoms = batch["ref_pos"].shape[-2]
        L = pad_atoms or mol.num_atoms
        assert L >= mol.num_atoms, (L, mol.num_atoms)
        idx = np.full(L, n_atoms, np.int32)  # pad -> out-of-range (dropped)
        idx[: len(lig_idx)] = lig_idx
        lig_mask = np.zeros(L, np.float32)
        lig_mask[: mol.num_atoms] = 1.0
        K = self.s.max_samples
        guidance = PhysicsGuidance(
            ligand_idx=jnp.asarray(idx),
            ligand_mask=jnp.asarray(lig_mask),
            conf_pos=jnp.zeros((K, L, 3), jnp.float32),
            conf_dists=jnp.zeros((K, L, L), jnp.float32),
            conf_mask=jnp.zeros((K,), jnp.float32),
            ff=ff,
        )
        return guidance, confs

    # ------------------------------------------------------------- dock one

    def dock(
        self,
        system,
        output_dir: str,
        remove_ligand: bool = False,
        smi: Optional[str] = None,
        ligand_sdf: Optional[str] = None,
        write_outputs: bool = True,
    ) -> Dict:
        """Dock one system (optionally replacing the ligand). Returns a
        result dict with poses, ranking, RMSD vs GT, timings."""
        t_start = time.time()
        loaded = self._load(
            system,
            remove_ligand=remove_ligand,
            smi=smi,
            ligand_sdf=ligand_sdf,
            num_msa_rounds=max(1, self.s.max_rounds),
        )
        return self._dock_loaded(
            loaded,
            output_dir,
            remove_ligand=remove_ligand,
            smi=smi,
            write_outputs=write_outputs,
            t_start=t_start,
        )

    def dock_many(
        self,
        systems,
        output_root: str,
        remove_ligand: bool = False,
        smi: Optional[str] = None,
        ligand_sdf: Optional[str] = None,
        write_outputs: bool = True,
        batch_size: int = 1,
    ) -> List[Dict]:
        """Dock a list of systems, PIPELINING host featurization with device
        sampling: system k+1 is featurized by the worker subprocess while
        system k's diffusion rounds run on the device (the reference docks
        strictly sequentially — redocking.py:156).  This both uses the idle
        host during device compute and shields throughput from episodic
        host-CPU contention (scripts/tpu_contention_probe.py).

        batch_size > 1 additionally STACKS same-shape systems and runs
        conditioning + the guided sampler vmapped over the stack in one
        device program (same machinery as batched virtual screening); poses
        then differ from a sequential run only through the per-batch RNG
        split.  Systems whose guidance cannot be built fall back to the
        sequential path."""
        if batch_size > 1 and isinstance(self.featurizer, FeaturizerWorker):
            return self._dock_many_batched(
                systems,
                output_root,
                remove_ligand=remove_ligand,
                smi=smi,
                ligand_sdf=ligand_sdf,
                write_outputs=write_outputs,
                batch_size=batch_size,
            )
        if not isinstance(self.featurizer, FeaturizerWorker):
            return [
                self.dock(
                    sysp,
                    os.path.join(output_root, f"sys{i}"),
                    remove_ligand=remove_ligand,
                    smi=smi,
                    ligand_sdf=ligand_sdf,
                    write_outputs=write_outputs,
                )
                for i, sysp in enumerate(systems)
            ]
        want = self.s.enable_physics_correction
        sub = dict(
            num_confs=self.s.num_confs if want else None,
            conf_seed=self.s.seed,
            compact=True,
            remove_ligand=remove_ligand,
            smi=smi,
            ligand_sdf=ligand_sdf,
            num_msa_rounds=max(1, self.s.max_rounds),
        )
        # submit everything upfront: the worker serves strictly in order and
        # the ~64 KB pipe gives natural backpressure (it blocks writing a
        # finished result until the parent drains the previous one), so this
        # keeps the worker continuously busy at bounded memory
        for sysp in systems:
            self.featurizer.submit(sysp, **sub)
        # postprocess (align/rank/score) is offloaded to the same worker so
        # it overlaps the NEXT system's device rounds; FIFO ordering means
        # all load responses drain before the first post response
        offload = not (
            self.s.enable_sidechain_relaxation or self.s.enable_confidence
        )
        results: List[Dict] = []
        pending = []
        for i, _ in enumerate(systems):
            t_start = time.time()
            feats, meta, confs = self.featurizer.result()
            if confs is not None:
                meta["_conf_bank"] = confs
            # attribute any load stall: header wait (worker latency) vs
            # payload read+unpickle (parent-side, PJRT-multiplied)
            meta["_recv_detail"] = dict(
                getattr(self.featurizer, "last_recv", {}) or {},
                worker_s=meta.get("_worker_time_s"),
                cache=meta.get("_feat_cache", "miss"),
            )
            out_dir = os.path.join(output_root, str(meta["system_id"]))
            ctx = self._dock_loaded(
                (feats, meta),
                out_dir,
                remove_ligand=remove_ligand,
                smi=smi,
                write_outputs=write_outputs,
                t_start=t_start,
                defer_post=offload,
            )
            if offload:
                self.featurizer.submit_post(
                    ctx["poses"],
                    self._post_args(ctx["feats"], ctx["meta"], remove_ligand, smi),
                )
                pending.append((ctx, out_dir))
            else:
                results.append(ctx)
        for ctx, out_dir in pending:
            post = self.featurizer.result()
            res = self._postprocess(
                ctx["feats"], ctx["meta"], ctx["poses"], out_dir,
                remove_ligand=remove_ligand, smi=smi,
                rounds_run=ctx["rounds_run"], t_feat=ctx["t_feat"],
                t_start=ctx["t_start"], write_outputs=write_outputs,
                post=post,
            )
            res["timings"] = ctx["timings"]
            results.append(res)
        return results

    def _dock_many_batched(
        self,
        systems,
        output_root: str,
        *,
        remove_ligand: bool,
        smi: Optional[str],
        ligand_sdf: Optional[str],
        write_outputs: bool,
        batch_size: int,
    ) -> List[Dict]:
        """Batched dock_many: featurize everything (worker), group by shape
        signature, run chunks of <= batch_size as one vmapped program."""
        want = self.s.enable_physics_correction
        sub = dict(
            num_confs=self.s.num_confs if want else None,
            conf_seed=self.s.seed,
            compact=True,
            remove_ligand=remove_ligand,
            smi=smi,
            ligand_sdf=ligand_sdf,
            num_msa_rounds=max(1, self.s.max_rounds),
        )
        t_start = time.time()
        for sysp in systems:
            self.featurizer.submit(sysp, **sub)
        loaded = []
        for _ in systems:
            feats, meta, confs = self.featurizer.result()
            if confs is not None:
                meta["_conf_bank"] = confs
            loaded.append((feats, meta))

        # group by MSA depth (rows cannot be padded without a row mask);
        # token/atom buckets are re-padded to the chunk max below
        groups: Dict[tuple, list] = {}
        for it in loaded:
            sig = (np.shape(it[0].get("msa_tok_c", it[0].get("msa_feat")))[0],)
            groups.setdefault(sig, []).append(it)

        from physdock_tpu.model.compact import (
            pad_compact_msa_np,
            pad_compact_np,
        )

        ablate = getattr(self.featurizer, "use_x_gt_ligand_as_ref_pos", False)
        results: List[Dict] = []
        for group in groups.values():
            for i in range(0, len(group), batch_size):
                chunk = group[i : i + batch_size]
                if len(chunk) > 1:
                    n_tok = max(len(f["s_mask"]) for f, _ in chunk)
                    n_atom = max(len(f["a_mask"]) for f, _ in chunk)
                    padded = []
                    for f, m in chunk:
                        f = pad_compact_np(f, n_tok, n_atom)
                        bm = m.get("batch_msa_feat_c")
                        if bm is not None:
                            m["batch_msa_feat_c"] = [
                                pad_compact_msa_np(x, n_tok) for x in bm
                            ]
                        padded.append((f, m))
                    chunk = padded
                out_dirs = [
                    os.path.join(output_root, str(m["system_id"]))
                    for _, m in chunk
                ]
                gt_ligs = None
                if ablate:
                    gt_ligs = [
                        np.asarray(f["x_gt"])[np.asarray(m["ligand_atom_idx"])]
                        for f, m in chunk
                    ]
                res = self._run_group_batched(
                    chunk,
                    out_dirs,
                    remove_ligand=remove_ligand,
                    smis=[smi] * len(chunk),
                    write_outputs=write_outputs,
                    t_start=t_start,
                    gt_ligs=gt_ligs,
                )
                if res is None:  # unbuildable guidance: sequential fallback
                    for (feats, meta), out_dir in zip(chunk, out_dirs):
                        results.append(
                            self._dock_loaded(
                                (feats, meta),
                                out_dir,
                                remove_ligand=remove_ligand,
                                smi=smi,
                                write_outputs=write_outputs,
                                t_start=t_start,
                            )
                        )
                else:
                    results.extend(res)
        return results

    def _dock_loaded(
        self,
        loaded,
        output_dir: str,
        *,
        remove_ligand: bool,
        smi: Optional[str],
        write_outputs: bool,
        t_start: float,
        defer_post: bool = False,
    ) -> Dict:
        s = self.s
        feats, meta = loaded
        t_loaded = time.time()
        # compact transport: one-hot features ship as int8 indices and are
        # re-expanded on device (model/compact.py) — ~27 MB -> ~0.5 MB per
        # system at crop 256/2048
        from physdock_tpu.model.compact import compact_batch_np, compact_msa_np

        if "msa_tok_c" in feats:  # worker already shipped the compact form
            batch = {k: jnp.asarray(v) for k, v in feats.items()}
        else:
            batch = {
                k: jnp.asarray(v) for k, v in compact_batch_np(feats).items()
            }
        batch_msa_feat = meta.pop("batch_msa_feat_c", None)
        if batch_msa_feat is None:
            batch_msa_feat = meta.pop("batch_msa_feat", None)
        # force transfer completion so the timing split is real
        jax.block_until_ready(batch)
        t_upload = time.time()
        if s.enable_physics_correction:
            guidance, conf_bank = self._build_guidance(batch, meta)
        else:
            guidance, conf_bank = None, None
        guided = guidance is not None
        sample_fn = self._sample_fn()

        lig_idx = np.asarray(meta["ligand_atom_idx"])
        x_gt = np.asarray(feats["x_gt"])
        key = jax.random.PRNGKey(s.seed)

        protocol = None
        if guided:
            gt_lig = None
            if getattr(self.featurizer, "use_x_gt_ligand_as_ref_pos", False):
                gt_lig = x_gt[lig_idx]  # ablation (redocking.py:293)
            protocol = RoundProtocol(
                conf_bank,
                max_samples=s.max_samples,
                num_samples_per_round=s.num_samples_per_round,
                eta_start=s.eta,
                gt_ligand=gt_lig,
            )
        t_feat = time.time() - t_start
        timings = {
            "load_s": round(t_loaded - t_start, 3),
            "upload_s": round(t_upload - t_loaded, 3),
            "guidance_s": round(time.time() - t_upload, 3),
        }
        if meta.get("_recv_detail"):
            timings["load_detail"] = meta.pop("_recv_detail")
        rounds_run = 0
        x = None
        conditioning = None
        for rnd in range(s.max_rounds if guided else 1):
            rounds_run += 1
            key, k_round = jax.random.split(key)
            if batch_msa_feat is not None:
                # MSA clusters resampled per round (redocking.py:187-188);
                # same shape every round -> single compile.  Conditioning
                # must be recomputed, so pass None and let the sampler
                # program fuse the trunk (one dispatch per round).
                c = batch_msa_feat[rnd % len(batch_msa_feat)]
                if not isinstance(c, dict):
                    c = compact_msa_np(c)
                batch["msa_tok_c"] = jnp.asarray(c["msa_tok_c"])
                batch["msa_del_c"] = jnp.asarray(c["msa_del_c"])
                conditioning = None
            # else: MSA static across rounds -> reuse the device-resident
            # conditioning returned by the previous round's fused call
            # round 0: unguided at high sigma (align_ref_pos=recycle_id>0,
            # redocking.py:290); FF relaxation at low sigma stays on.
            bank = protocol.bank(rnd) if guided else None
            if bank is not None:
                pos, mask = bank
                g = dataclasses.replace(
                    guidance,
                    conf_pos=jnp.asarray(pos),
                    conf_dists=jnp.asarray(pairwise(pos)),
                    conf_mask=jnp.asarray(mask),
                )
                use_bank = True
            else:
                g, use_bank = guidance, False
            x, ok, conditioning = sample_fn(
                self.params,
                batch,
                k_round,
                conditioning,
                g,
                jnp.float32(protocol.factor if guided else s.eta),
                s.num_samples_per_round,
                use_bank,
            )
            x, ok = np.asarray(x), np.asarray(ok)
            if not guided:
                break
            protocol.update(x, x[:, lig_idx], ok)
            if protocol.done:
                break
        poses = (
            protocol.final_poses() if guided else np.asarray(x)[: s.max_samples]
        )
        conf_metrics = rank_scores = None
        if s.enable_confidence:
            conf_metrics, rank_scores = self._confidence_scores(
                batch, conditioning, poses, feats
            )
        timings["rounds_s"] = round(time.time() - t_start - t_feat, 3)
        if defer_post:
            return dict(
                feats=feats, meta=meta, poses=poses, rounds_run=rounds_run,
                t_feat=t_feat, t_start=t_start, timings=timings,
            )
        res = self._postprocess(
            feats, meta, poses, output_dir,
            remove_ligand=remove_ligand, smi=smi, rounds_run=rounds_run,
            t_feat=t_feat, t_start=t_start, write_outputs=write_outputs,
            conf_metrics=conf_metrics,
            rank_scores=rank_scores if s.confidence_ranking else None,
        )
        res["timings"] = timings
        return res

    def _post_args(self, feats, meta, remove_ligand, smi) -> Dict:
        """numpy argument pack for ranking.postprocess_poses."""
        lig_idx = np.asarray(meta["ligand_atom_idx"])
        return dict(
            x_gt=np.asarray(feats["x_gt"]),
            lig_idx=lig_idx,
            centre_ids=np.asarray(feats["token_id_to_centre_atom_id"]),
            pocket_res=np.asarray(feats["pocket_res_feat"]),
            is_protein=np.asarray(feats["is_protein"]),
            s_mask=np.asarray(feats["s_mask"]),
            a_mask=np.asarray(feats["a_mask"]),
            enable_ranking=self.s.enable_ranking,
            compute_rmsd=bool(len(lig_idx)) and not remove_ligand and smi is None,
        )

    # -------------------------------------------------------- post-processing

    def _confidence_scores(self, batch, conditioning, poses, feats):
        """Per-pose confidence metrics from the trained head (requires
        cfg.model.with_confidence params).  Scores every selected pose with
        the current round's trunk embeddings (s, z) — the AF3-style usage
        where confidence rides the same conditioning as the denoiser.
        Returns (metrics list, ranking_confidence array)."""
        if not self.model.with_confidence:
            raise ValueError(
                "enable_confidence requires a model/params built with "
                "with_confidence=True (train with --mini-rollout)"
            )
        if self._jit_conf is None:
            self._jit_conf = jax.jit(
                lambda p, b, s_emb, z_emb, x: self.model.apply(
                    p, b, s_emb, z_emb, x, method="confidence"
                )
            )
        from physdock_tpu.infer import metrics as metrics_lib

        _, _, s_emb, z_emb = conditioning
        out, scores = [], []
        for i in range(len(poses)):
            p_pae, p_pde, p_plddt = self._jit_conf(
                self.params, batch, s_emb, z_emb,
                jnp.asarray(poses[i : i + 1]),
            )
            m = metrics_lib.get_metrics(
                np.asarray(p_pae, np.float32),
                np.asarray(p_plddt, np.float32),
                poses[i],
                feats,
            )
            out.append(m)
            scores.append(m["ranking_confidence"])
        return out, np.asarray(scores, np.float32)

    def _postprocess(
        self,
        feats,
        meta,
        poses: np.ndarray,
        output_dir: str,
        *,
        remove_ligand: bool,
        smi: Optional[str],
        rounds_run: int,
        t_feat: float,
        t_start: float,
        write_outputs: bool,
        post=None,
        conf_metrics=None,
        rank_scores=None,
    ) -> Dict:
        """Align to the GT pocket-CA frame, optionally relax, rank, score,
        and write outputs (redocking.py:341-447).  `post` short-circuits the
        numpy stages with a precomputed (aligned, order, rmsds) from the
        worker (dock_many offload)."""
        s = self.s
        lig_idx = np.asarray(meta["ligand_atom_idx"])
        x_gt = np.asarray(feats["x_gt"])
        if post is None:
            relax_fn = None
            if s.enable_sidechain_relaxation:
                # restraint-field relaxation of each pose (replaces the
                # reference OpenMM stage — redocking.py:438-445)
                from physdock_tpu.infer.relax import relax_complex

                def relax_fn(aligned):
                    return np.stack([relax_complex(a, meta) for a in aligned])

            args = self._post_args(feats, meta, remove_ligand, smi)
            post = ranking_lib.postprocess_poses(
                poses, args.pop("x_gt"), relax_fn=relax_fn,
                rank_scores=rank_scores, **args
            )
        aligned, order, lig_rmsds = post

        result = {
            "system_id": meta["system_id"],
            "num_poses": len(aligned),
            "rank_order": order,
            "top5_rmsd": lig_rmsds[:5] if lig_rmsds else None,
            "all_rmsd": lig_rmsds,  # rank-ordered, every pose
            "rounds": rounds_run,
            "feat_time_s": round(t_feat, 3),
            "total_time_s": round(time.time() - t_start, 3),
            # static bucket this system compiled at (device-program shape;
            # bench.py counts per-bucket FLOPs from these)
            "n_atoms_padded": int(np.shape(feats["ref_pos"])[-2]),
            "n_tokens_padded": int(np.shape(feats["s_mask"])[-1]),
        }
        if conf_metrics is not None:
            # rank-ordered so confidence[0] belongs to pred_rank0
            result["confidence"] = [conf_metrics[i] for i in order]

        if write_outputs:
            os.makedirs(output_dir, exist_ok=True)
            writers.write_pdb(
                x_gt, meta, os.path.join(output_dir, "gt.pdb")
            )
            for rank, idx in enumerate(order[:5]):
                writers.write_pdb(
                    aligned[idx],
                    meta,
                    os.path.join(output_dir, f"pred_rank{rank}.pdb"),
                )
                if len(lig_idx):
                    writers.write_ligand_sdf(
                        aligned[idx],
                        meta,
                        os.path.join(output_dir, f"ligand_rank{rank}.sdf"),
                        name=f"{meta['system_id']}_rank{rank}",
                    )
            if lig_rmsds:
                dump_json(
                    {"top5_rmsd": lig_rmsds[:5], "rank_order": order},
                    os.path.join(output_dir, "top5_rmsd.json"),
                )
            if conf_metrics is not None:
                dump_json(
                    result["confidence"],
                    os.path.join(output_dir, "confidence.json"),
                )
            if len(lig_idx) and meta.get("ref_mol") is not None:
                # per-pose validity verdicts for the written top-5, the
                # native equivalent of the reference's PoseBusters table
                # (data/relaxation.py:29-50 get_bust_results)
                from physdock_tpu.infer.relax import check_pose

                report = [
                    {"rank": rank, **_json_safe(check_pose(aligned[idx], meta))}
                    for rank, idx in enumerate(order[:5])
                ]
                dump_json(
                    report, os.path.join(output_dir, "bust_report.json")
                )
        return result

    # ------------------------------------------------------------ screening

    def screen(
        self,
        system,
        smiles_list: List[str],
        output_dir: str,
        write_outputs: bool = True,
        batch_size: int = 1,
    ) -> List[Dict]:
        """Virtual screening: dock each SMILES into the receptor pocket
        (screening.py:495-523; outputs keyed by md5(smi)).

        batch_size > 1 stacks that many ligand-systems on a leading axis and
        runs conditioning + the guided sampler vmapped over it in one device
        program (the reference screens sequentially, one SMILES at a time —
        SURVEY §2.5 'fleet of independent ligands').
        """
        from physdock_tpu.utils.io import md5_string

        results = []
        smi_map = {smi: md5_string(smi) for smi in smiles_list}
        if batch_size > 1:
            for i in range(0, len(smiles_list), batch_size):
                results += self._dock_ligand_batch(
                    system,
                    smiles_list[i : i + batch_size],
                    output_dir,
                    smi_map,
                    write_outputs=write_outputs,
                )
        else:
            for smi in smiles_list:
                out = os.path.join(output_dir, smi_map[smi])
                try:
                    r = self.dock(
                        system,
                        out,
                        remove_ligand=True,
                        smi=smi,
                        write_outputs=write_outputs,
                    )
                    r["smiles"] = smi
                    results.append(r)
                except Exception as e:  # robustness (screening.py:458-460)
                    results.append({"smiles": smi, "error": str(e)})
        if write_outputs:
            dump_json(smi_map, os.path.join(output_dir, "smiles_to_md5.json"))
        return results

    # ----------------------------------------------------- batched screening

    def _sample_fn_batched(self):
        if self._jit_sample_batched is not None:
            return self._jit_sample_batched
        s = self.s

        @functools.partial(jax.jit, static_argnames=("num_sample", "use_bank"))
        def fn(
            params, batches, keys, conds, guidances, factors, num_sample,
            use_bank,
        ):
            def one(batch, key, cond, g, factor):
                # cond=None fuses the vmapped trunk into the same device
                # program as the sampler (see _sample_fn); the computed
                # conditioning is returned for MSA-static round reuse
                if cond is None:
                    cond = self.model.apply(
                        params, batch, method="conditioning"
                    )
                x = sample_diffusion(
                    self.model,
                    params,
                    batch,
                    key,
                    num_sample=num_sample,
                    steps=s.steps,
                    gamma_0=s.gamma_0,
                    gamma_min=s.gamma_min,
                    noise_scale_lambda=s.noise_scale_lambda,
                    step_scale_eta=s.step_scale_eta,
                    karras_rho=s.rho,
                    guidance=g,
                    mmff_gamma_0_factor=factor,
                    mmff_iters=s.mmff_iters,
                    align_ref_pos=use_bank,
                    conditioning=cond,
                )
                if g is not None and g.ff is not None:
                    lig = jnp.take(x, g.ligand_idx, axis=-2, mode="clip")
                    ok = chirality_correct(lig, g.ff)
                else:
                    ok = jnp.ones((num_sample,), bool)
                return x, ok, cond

            return jax.vmap(one)(batches, keys, conds, guidances, factors)

        self._jit_sample_batched = fn
        return fn

    def _dock_ligand_batch(
        self,
        system,
        smiles: List[str],
        output_dir: str,
        smi_map: Dict[str, str],
        write_outputs: bool = True,
    ) -> List[Dict]:
        """Dock a batch of SMILES against one receptor in ONE device program.

        Systems are stacked on a leading axis; conditioning and the guided
        sampler are vmapped over it.  Ligand force fields are padded to
        common capacities (stack_ligand_ffs) and conformer banks to the max
        ligand size, so one compile serves the whole screen.  Ligands whose
        featurization or guidance build fails fall back to the sequential
        path.
        """

        s = self.s
        t_start = time.time()
        results: List[Dict] = []
        items = []  # (smi, feats, meta)
        for smi in smiles:
            try:
                feats, meta = self._load(
                    system,
                    remove_ligand=True,
                    smi=smi,
                    num_msa_rounds=max(1, s.max_rounds),
                )
                items.append((smi, feats, meta))
            except Exception as e:
                results.append({"smiles": smi, "error": str(e)})
        if not items:
            return results

        # group by shape signature (different ligands can land in different
        # static buckets); each group is one vmapped program
        groups: Dict[tuple, list] = {}
        for it in items:
            sig = tuple(sorted((k, np.shape(v)) for k, v in it[1].items()))
            groups.setdefault(sig, []).append(it)
        for group in groups.values():
            results += self._run_ligand_group(
                system, group, output_dir, smi_map, write_outputs, t_start
            )
        return results

    def _run_ligand_group(
        self, system, group, output_dir, smi_map, write_outputs, t_start
    ) -> List[Dict]:
        """Screening wrapper over the generic batched group runner."""
        items = [(f, m) for _, f, m in group]
        smis = [smi for smi, _, _ in group]
        out_dirs = [os.path.join(output_dir, smi_map[smi]) for smi in smis]
        res = self._run_group_batched(
            items,
            out_dirs,
            remove_ligand=True,
            smis=smis,
            write_outputs=write_outputs,
            t_start=t_start,
        )
        if res is None:
            # a ligand without buildable guidance: sequential fallback for
            # the whole group (keeps per-ligand protocol semantics exact)
            out: List[Dict] = []
            for smi, _, _ in group:
                try:
                    r = self.dock(
                        system,
                        os.path.join(output_dir, smi_map[smi]),
                        remove_ligand=True,
                        smi=smi,
                        write_outputs=write_outputs,
                    )
                    r["smiles"] = smi
                except Exception as e:
                    r = {"smiles": smi, "error": str(e)}
                out.append(r)
            return out
        for smi, r in zip(smis, res):
            r["smiles"] = smi
        return res

    def _run_group_batched(
        self,
        items,
        out_dirs,
        *,
        remove_ligand: bool,
        smis,
        write_outputs: bool,
        t_start: float,
        gt_ligs=None,
    ) -> Optional[List[Dict]]:
        """Run a group of same-shape systems as ONE vmapped device program.

        Shared by batched virtual screening (one receptor, many ligands —
        SURVEY 2.5 "fleet of independent ligands") and batched redocking
        (dock_many(batch_size>1) — beyond the reference, which only docks
        sequentially).  Ligand force fields / conformer banks are padded to
        common capacities, per-system RoundProtocols run host-side, and
        pose postprocessing is offloaded to the featurizer worker when one
        is attached.  Returns None when physics correction is requested but
        unbuildable for some item (caller falls back to sequential).

        Note: the per-system RNG streams differ from sequential dock()
        (keys are split per round across the batch), so individual poses
        differ from a sequential run while the protocol semantics match.
        """
        from physdock_tpu.model.forcefield import stack_ligand_ffs

        s = self.s
        B = len(items)
        feats_list = [f for f, _ in items]
        metas = [m for _, m in items]
        batch_msa = [
            m.pop("batch_msa_feat_c", None) or m.pop("batch_msa_feat", None)
            for m in metas
        ]
        lig_idxs = [np.asarray(m["ligand_atom_idx"]) for m in metas]
        L_max = max(max(len(ix) for ix in lig_idxs), 1)

        guided = s.enable_physics_correction
        guidances, conf_banks, ffs = [], [], []
        if guided:
            for feats, meta in items:
                g, confs = self._build_guidance(feats, meta, pad_atoms=L_max)
                if g is None:
                    return None
                guidances.append(g)
                conf_banks.append(confs)
                ffs.append(g.ff)

        from physdock_tpu.model.compact import compact_batch_np, compact_msa_np

        compacts = [
            f if "msa_tok_c" in f else compact_batch_np(f) for f in feats_list
        ]
        stacked = {
            k: jnp.asarray(np.stack([np.asarray(c[k]) for c in compacts]))
            for k in compacts[0]
        }
        if guided:
            ff_stacked = stack_ligand_ffs(ffs)
            g_stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[dataclasses.replace(g, ff=None) for g in guidances],
            )
            g_stacked = dataclasses.replace(g_stacked, ff=ff_stacked)
            protocols = [
                RoundProtocol(
                    conf_banks[b],
                    max_samples=s.max_samples,
                    num_samples_per_round=s.num_samples_per_round,
                    eta_start=s.eta,
                    gt_ligand=None if gt_ligs is None else gt_ligs[b],
                )
                for b in range(B)
            ]
        else:
            g_stacked, protocols = None, None

        sample_fn = self._sample_fn_batched()
        key = jax.random.PRNGKey(s.seed)
        t_feat = time.time() - t_start
        rounds_run = 0
        x = None
        conds = None
        msa_resampled = any(bm is not None for bm in batch_msa)
        for rnd in range(s.max_rounds if guided else 1):
            rounds_run += 1
            key, k_round = jax.random.split(key)
            keys = jax.random.split(k_round, B)
            for b, bm in enumerate(batch_msa):
                if bm is not None:
                    c = bm[rnd % len(bm)]
                    if not isinstance(c, dict):
                        c = compact_msa_np(c)
                    stacked["msa_tok_c"] = (
                        stacked["msa_tok_c"].at[b].set(c["msa_tok_c"])
                    )
                    stacked["msa_del_c"] = (
                        stacked["msa_del_c"].at[b].set(c["msa_del_c"])
                    )
            if msa_resampled:
                # MSA resampled -> trunk must recompute; fuse it into the
                # sampler program (one dispatch) by passing conds=None
                conds = None
            if guided:
                banks = [p.bank(rnd) for p in protocols]
            else:
                banks = [None] * B
            if guided and banks[0] is not None:
                K = s.max_samples
                pos = np.zeros((B, K, L_max, 3), np.float32)
                mask = np.zeros((B, K), np.float32)
                for b, bank in enumerate(banks):
                    pb, mb = bank
                    pos[b, :, : pb.shape[1]] = pb
                    mask[b] = mb
                g_round = dataclasses.replace(
                    g_stacked,
                    conf_pos=jnp.asarray(pos),
                    conf_dists=jnp.asarray(
                        np.linalg.norm(
                            pos[:, :, :, None] - pos[:, :, None], axis=-1
                        )
                    ),
                    conf_mask=jnp.asarray(mask),
                )
                use_bank = True
            else:
                g_round, use_bank = g_stacked, False
            x, ok, conds = sample_fn(
                self.params,
                stacked,
                keys,
                conds,
                g_round,
                jnp.asarray(
                    [p.factor for p in protocols]
                    if guided
                    else [s.eta] * B,
                    jnp.float32,
                ),
                s.num_samples_per_round,
                use_bank,
            )
            x, ok = np.asarray(x), np.asarray(ok)  # [B, S, A, 3], [B, S]
            if not guided:
                break
            for b in range(B):
                protocols[b].update(x[b], x[b][:, lig_idxs[b]], ok[b])
            if all(p.done for p in protocols):
                break

        all_poses = [
            protocols[b].final_poses() if guided else x[b][: s.max_samples]
            for b in range(B)
        ]
        offload = isinstance(self.featurizer, FeaturizerWorker) and (
            not s.enable_sidechain_relaxation
        )
        posts: List = [None] * B
        if offload:
            for b in range(B):
                self.featurizer.submit_post(
                    all_poses[b],
                    self._post_args(
                        feats_list[b], metas[b], remove_ligand, smis[b]
                    ),
                )
            posts = [self.featurizer.result() for _ in range(B)]

        out: List[Dict] = []
        for b, (feats, meta) in enumerate(items):
            r = self._postprocess(
                feats,
                meta,
                all_poses[b],
                out_dirs[b],
                remove_ligand=remove_ligand,
                smi=smis[b],
                rounds_run=rounds_run,
                t_feat=t_feat,
                t_start=t_start,
                write_outputs=write_outputs,
                post=posts[b],
            )
            r["vs_batch_size"] = B
            out.append(r)
        return out
