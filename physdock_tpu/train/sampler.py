"""Training data sampling + host-side batch assembly.

Equivalent of the reference's weighted infinite sampler + retry loop
(tasks/unicore_train/__init__.py:27-65, feature_loader_plinder.py:1134) with
TPU-shaped output: fixed (crop_size, atom_crop_size) padded batches stacked
along a leading system axis and prefetched on a background thread.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from physdock_tpu.data.feature_loader import SystemFeaturizer
from physdock_tpu.data.synthetic import pad_batch
from physdock_tpu.utils.io import find_files, load_json


class WeightedSystemSampler:
    """Infinite weighted sampling of system pkls (cluster-weighted in the
    reference, train_val_weights.json)."""

    def __init__(
        self,
        systems: Sequence[str],
        weights: Optional[Sequence[float]] = None,
        seed: int = 0,
    ):
        self.systems = list(systems)
        w = np.asarray(weights if weights is not None else np.ones(len(systems)))
        self.p = w / w.sum()
        self.rng = np.random.default_rng(seed)

    @classmethod
    def from_dataset_dir(cls, dataset_dir: str, seed: int = 0):
        import os

        systems = find_files(os.path.join(dataset_dir, "train_val"), ".pkl.gz")
        weights = None
        wpath = os.path.join(dataset_dir, "train_val_weights.json")
        if os.path.exists(wpath):
            wmap = load_json(wpath)
            weights = [wmap.get(s, 1.0) for s in systems]
        return cls(systems, weights, seed)

    def __iter__(self) -> Iterator[str]:
        while True:
            yield self.systems[self.rng.integers(len(self.systems), dtype=np.int64)] \
                if self.p is None else self.systems[
                    self.rng.choice(len(self.systems), p=self.p)
                ]


def batch_iterator(
    sampler: WeightedSystemSampler,
    featurizer: SystemFeaturizer,
    batch_size: int,
    crop_size: int,
    atom_crop_size: int,
    max_retries: int = 8,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield stacked, padded feature batches [B, ...] (retry-on-exception as
    in the reference dataset, tasks/unicore_train/__init__.py:48-56)."""
    from physdock_tpu.data.schema import FEATURE_SCHEMA

    it = iter(sampler)
    while True:
        systems = []
        while len(systems) < batch_size:
            path = next(it)
            for _ in range(max_retries):
                try:
                    feats, _ = featurizer.load(path)
                    feats = {k: v for k, v in feats.items() if k in FEATURE_SCHEMA}
                    feats = pad_batch(feats, crop_size, atom_crop_size)
                    systems.append(feats)
                    break
                except Exception:
                    path = next(it)
            else:
                raise RuntimeError("too many featurization failures")
        yield {
            k: np.stack([s[k] for s in systems]) for k in systems[0]
        }


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch (replaces DataLoader workers)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item


class MixedBatchSampler:
    """Training data mix (feature_loader_plinder.py:1-7 header):
    ~85% receptor+ligand complexes, ~5% protein-only, ~10% ligand-only
    conformer batches (SMILES chunks standing in for the reference's
    374-chunk ligand DB).

    On the header's "0.5 APO / 0.5 HOLO template" split: the reference's
    ACTUAL training code contradicts its own header — the plinder loader
    samples t_mask=1 with probability 0.1 (feature_loader_plinder.py:
    1059-1064; the bert-mask variant is commented out), and the release
    loader uses P(template)=1-train_use_template_ratio=0.25 with bert
    masking (feature_loader.py:955-961).  This build mirrors the release
    loader's executed behavior exactly (data/feature_loader.py
    _template_feat); tune `train_use_template_ratio` to move the split."""

    def __init__(
        self,
        complex_sampler: WeightedSystemSampler,
        featurizer: SystemFeaturizer,
        ligand_smiles: Optional[Sequence[str]] = None,
        complex_ratio: float = 0.85,
        protein_only_ratio: float = 0.05,
        seed: int = 0,
    ):
        self.complexes = complex_sampler
        self.featurizer = featurizer
        self.ligand_smiles = list(ligand_smiles or [])
        self.ratios = (complex_ratio, protein_only_ratio)
        self.rng = np.random.default_rng(seed)
        self._complex_iter = iter(complex_sampler)

    def sample(self) -> Dict[str, np.ndarray]:
        r = self.rng.random()
        complex_r, protein_r = self.ratios
        if r < complex_r or not self.ligand_smiles:
            feats, _ = self.featurizer.load(next(self._complex_iter))
        elif r < complex_r + protein_r:
            feats, _ = self.featurizer.load(
                next(self._complex_iter), remove_ligand=True
            )
        else:
            from physdock_tpu.data.smiles import mol_from_smiles

            smi = self.ligand_smiles[self.rng.integers(len(self.ligand_smiles))]
            mol = mol_from_smiles(smi, seed=int(self.rng.integers(2**31)))
            feats, _ = self.featurizer.load(
                {}, remove_receptor=True, ligand_mol=mol
            )
        return feats
