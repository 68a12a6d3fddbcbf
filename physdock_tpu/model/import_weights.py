"""Checkpoint conversion: reference PyTorch `params.pt` -> flax param pytree.

Contract from reference PhysDock/utils/import_weights.py:
  * `import_state_dict` (:31-41): flat release checkpoint, strip a leading
    `model.` prefix from every key.
  * `import_unicore_ckpt` (:6-28): training checkpoint, take
    ckpt["ema"]["params"] (fallback ckpt["model"]), strip 6-char prefix
    (16 for compiled modules).

Structural mapping to this implementation:
  * torch module paths map 1:1 onto flax module names (they were chosen to
    match), except per-block `blocks.{i}.<rest>` entries, which are stacked
    along a leading axis (our stacks are `nn.scan` over stacked params).
  * torch `nn.Linear.weight` is [out, in]; flax kernels here are [in, out]
    -> every rank-2 weight is transposed.  Rank-1 norm weights/biases pass
    through.
  * the reference TimestepEmbeddings nests `time_embedder.timestep_embedder.
    linear_{1,2}`; ours flattens to `time_embedder.linear_{1,2}`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

_BLOCK_RE = re.compile(r"^(.*?\bblocks)\.(\d+)\.(.*)$")


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint into numpy arrays (handles both release
    `params.pt` and Uni-Core training checkpoints)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "ema" in ckpt:
        state = ckpt["ema"].get("params", ckpt.get("model"))
        if state is None:
            raise ValueError(
                "Uni-Core checkpoint has an 'ema' key but neither "
                "ckpt['ema']['params'] nor ckpt['model'] exists; expected "
                "the train.sh layout {'ema': {'params': state_dict}, ...} "
                f"(got ema keys {sorted(ckpt['ema'])[:8]}, "
                f"top-level keys {sorted(ckpt)[:8]})"
            )
    elif isinstance(ckpt, dict) and "model" in ckpt and not any(
        hasattr(v, "numpy") for v in list(ckpt.values())[:3]
    ):
        state = ckpt["model"]
    else:
        state = ckpt
    out = {}
    for k, v in state.items():
        if k.startswith("model."):
            k = k[len("model.") :]
        if k.startswith("_orig_mod.model."):  # compiled module prefix (16 chars)
            k = k[len("_orig_mod.model.") :]
        out[k] = v.detach().float().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _rewrite_key(key: str) -> str:
    """Reference-name -> our-name rewrites."""
    key = key.replace(".timestep_embedder.linear_1", ".linear_1")
    key = key.replace(".timestep_embedder.linear_2", ".linear_2")
    return key


def convert_state_dict(
    state: Mapping[str, np.ndarray],
) -> Dict[str, Any]:
    """Convert a flat torch state dict into a nested flax params tree
    (the {"params": ...} pytree) with scan-stacked blocks."""
    # group per-block entries: path -> {block_idx: array}
    stacked: Dict[str, Dict[int, np.ndarray]] = {}
    flat: Dict[str, np.ndarray] = {}
    for key, arr in state.items():
        key = _rewrite_key(key)
        m = _BLOCK_RE.match(key)
        if m:
            canon = f"{m.group(1)}.{m.group(3)}"
            stacked.setdefault(canon, {})[int(m.group(2))] = arr
        else:
            flat[key] = arr

    def maybe_t(a: np.ndarray) -> np.ndarray:
        return a.T if a.ndim == 2 else a

    tree: Dict[str, Any] = {}

    def insert(path: str, value: np.ndarray):
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, arr in flat.items():
        insert(key, maybe_t(arr))
    for key, by_block in stacked.items():
        idxs = sorted(by_block)
        assert idxs == list(range(len(idxs))), f"missing block indices for {key}"
        insert(key, np.stack([maybe_t(by_block[i]) for i in idxs], axis=0))

    return {"params": tree}


def import_checkpoint(path: str) -> Dict[str, Any]:
    """Load + convert a reference checkpoint to flax params."""
    return convert_state_dict(load_torch_state_dict(path))


def tree_paths(tree, prefix=()):
    """All leaf paths of a nested dict tree (for conversion audits)."""
    if isinstance(tree, Mapping):
        out = []
        for k, v in tree.items():
            out.extend(tree_paths(v, prefix + (k,)))
        return out
    return [prefix]


def audit_conversion(converted: Dict[str, Any], flax_params: Dict[str, Any]):
    """Compare converted-checkpoint paths/shapes against a freshly
    initialized model's params; returns (missing, unexpected, mismatched)."""
    conv = {p: None for p in tree_paths(converted)}
    ref = {p: None for p in tree_paths(flax_params)}

    def shape_at(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return tuple(np.shape(node))

    missing = [p for p in ref if p not in conv]
    unexpected = [p for p in conv if p not in ref]
    mismatched = [
        (p, shape_at(converted, p), shape_at(flax_params, p))
        for p in ref
        if p in conv and shape_at(converted, p) != shape_at(flax_params, p)
    ]
    return missing, unexpected, mismatched
