"""Compact host->device feature transport.

The three fat conditioning inputs are one-hot/flag expansions that XLA can
rebuild on device from int8 indices:

  * msa_feat    [N, T, 34] f32 = one_hot(32) + has_deletion + deletion_value
  * rel_tok_feat [T, T, 42] f32 = d_token 1-hot(32) + bond-type 1-hot(5) +
                  bonded/as-double/in-ring/conjugated/aromatic
  * templ_feat  [T, T, 40] f32 = 39-bin distogram 1-hot + mask

Shipping them raw costs ~27 MB per system at crop 256 (a real tax over a
remote-device link and on host RAM bandwidth); the compact forms are
~0.5 MB.  `compact_batch_np` (host, numpy) recovers indices from the
one-hots (exact; all-zero rows -> sentinel -1 which re-expands to zeros),
and `expand_batch` (device, jnp) rebuilds the f32 features inside jit.
deletion_value is quantized to uint8 (quantization step 1/255 on a [0,1]
feature — below bf16 input precision).

Model entry points call `expand_batch` so both fat and compact batches
work everywhere; parity suites keep using the fat path.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

FAT_KEYS = ("msa_feat", "rel_tok_feat", "templ_feat")


def _onehot_to_idx(oh: np.ndarray) -> np.ndarray:
    """[..., C] one-hot -> int8 index with -1 for all-zero rows."""
    idx = oh.argmax(-1).astype(np.int8)
    return np.where(oh.sum(-1) > 0, idx, np.int8(-1))


def compact_msa_np(msa_feat: np.ndarray) -> Dict[str, np.ndarray]:
    mf = np.asarray(msa_feat)
    return {
        "msa_tok_c": _onehot_to_idx(mf[..., :32]),
        "msa_del_c": np.round(mf[..., 33] * 255.0).astype(np.uint8),
    }


def compact_batch_np(feats: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Host-side: strip fat f32 features + derived pair masks, add int8
    compacts."""
    out = {
        k: v
        for k, v in feats.items()
        if k not in FAT_KEYS + ("ap_mask", "z_mask")
    }
    out.update(compact_msa_np(feats["msa_feat"]))

    rel = np.asarray(feats["rel_tok_feat"])
    flags = (
        (rel[..., 37] > 0).astype(np.int8)  # bonded
        | ((rel[..., 39] > 0).astype(np.int8) << 1)  # in ring
        | ((rel[..., 40] > 0).astype(np.int8) << 2)  # conjugated
        | ((rel[..., 41] > 0).astype(np.int8) << 3)  # aromatic
    )
    out["rel_d_tok_c"] = _onehot_to_idx(rel[..., :32])
    out["rel_bond_type_c"] = _onehot_to_idx(rel[..., 32:37])
    # bond order as double in {0, 1, 1.5, 2, 3} -> x2 exact int8
    out["rel_as_double_x2_c"] = np.round(rel[..., 38] * 2.0).astype(np.int8)
    out["rel_flags_c"] = flags

    tf = np.asarray(feats["templ_feat"])
    out["templ_bins_c"] = _onehot_to_idx(tf[..., :39])
    out["templ_mask_c"] = (tf[..., 39] > 0).astype(np.int8)
    return out


# compact transport keys: symbolic axes (S = MSA rows, T = tokens)
COMPACT_SCHEMA = {
    "msa_tok_c": ("S", "T"),
    "msa_del_c": ("S", "T"),
    "rel_d_tok_c": ("T", "T"),
    "rel_bond_type_c": ("T", "T"),
    "rel_as_double_x2_c": ("T", "T"),
    "rel_flags_c": ("T", "T"),
    "templ_bins_c": ("T", "T"),
    "templ_mask_c": ("T", "T"),
}
# index compacts pad with -1 (re-expands to all-zero one-hots, matching the
# fat features' zero padding); value/flag compacts pad with 0
_NEG_ONE_PAD = {"msa_tok_c", "rel_d_tok_c", "rel_bond_type_c", "templ_bins_c"}


def pad_compact_np(
    c: Dict[str, np.ndarray], n_tok: int, n_atom: int
) -> Dict[str, np.ndarray]:
    """Re-pad a compact batch to larger (n_tok, n_atom) bucket sizes.

    Needed when batching systems that landed in different featurizer
    buckets (infer/pipeline.dock_many batch_size>1): schema keys go through
    the featurizer's own pad_batch (index fixups included), compact keys
    are padded with their one-hot-neutral fill."""
    from physdock_tpu.data.schema import FEATURE_SCHEMA
    from physdock_tpu.data.synthetic import pad_batch

    base = {k: v for k, v in c.items() if k in FEATURE_SCHEMA}
    out = pad_batch(base, n_tok, n_atom)
    for k, v in c.items():
        if k in FEATURE_SCHEMA:
            continue
        v = np.asarray(v)
        spec = COMPACT_SCHEMA[k]
        pads = [
            (0, n_tok - v.shape[i]) if ax == "T" else (0, 0)
            for i, ax in enumerate(spec)
        ]
        fill = -1 if k in _NEG_ONE_PAD else 0
        out[k] = np.pad(v, pads, constant_values=fill)
    return out


def pad_compact_msa_np(c: Dict[str, np.ndarray], n_tok: int) -> Dict[str, np.ndarray]:
    """Pad a per-round compact MSA dict's token axis."""
    return {
        "msa_tok_c": np.pad(
            np.asarray(c["msa_tok_c"]),
            ((0, 0), (0, n_tok - c["msa_tok_c"].shape[1])),
            constant_values=-1,
        ),
        "msa_del_c": np.pad(
            np.asarray(c["msa_del_c"]),
            ((0, 0), (0, n_tok - c["msa_del_c"].shape[1])),
        ),
    }


def _idx_one_hot(idx, n):
    """int index -> one-hot; -1 (or any out-of-range) -> zeros."""
    return jax.nn.one_hot(idx.astype(jnp.int32), n, dtype=jnp.float32)


def expand_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Device-side: rebuild fat f32 features from compacts when absent."""
    need = [k for k in FAT_KEYS if k not in batch]
    if not need:
        return batch
    batch = dict(batch)
    if "msa_feat" not in batch and "msa_tok_c" in batch:
        oh = _idx_one_hot(batch["msa_tok_c"], 32)
        del_val = batch["msa_del_c"].astype(jnp.float32) / 255.0
        has_del = (del_val > 0).astype(jnp.float32)
        batch["msa_feat"] = jnp.concatenate(
            [oh, has_del[..., None], del_val[..., None]], axis=-1
        )
    if "rel_tok_feat" not in batch and "rel_d_tok_c" in batch:
        flags = batch["rel_flags_c"].astype(jnp.int32)
        batch["rel_tok_feat"] = jnp.concatenate(
            [
                _idx_one_hot(batch["rel_d_tok_c"], 32),
                _idx_one_hot(batch["rel_bond_type_c"], 5),
                (flags & 1).astype(jnp.float32)[..., None],
                (batch["rel_as_double_x2_c"].astype(jnp.float32) / 2.0)[..., None],
                ((flags >> 1) & 1).astype(jnp.float32)[..., None],
                ((flags >> 2) & 1).astype(jnp.float32)[..., None],
                ((flags >> 3) & 1).astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )
    if "templ_feat" not in batch and "templ_bins_c" in batch:
        batch["templ_feat"] = jnp.concatenate(
            [
                _idx_one_hot(batch["templ_bins_c"], 39),
                batch["templ_mask_c"].astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )
    return batch
