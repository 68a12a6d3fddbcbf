"""Checkpointing via orbax.

Reference contract (train.sh:95-98,109 + utils/import_weights.py): save every
N updates keeping K, store both raw and EMA params, resume picks EMA first.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(ckpt_dir: str, state, keep: int = 40) -> str:
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    _ckptr().save(
        path,
        {
            "step": np.asarray(step),
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "ema_params": jax.device_get(state.ema_params),
        },
        force=True,
    )
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int) -> None:
    import shutil

    ckpts = sorted(
        d for d in os.listdir(ckpt_dir) if d.startswith("step_")
    )
    for d in ckpts[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(
        d
        for d in os.listdir(ckpt_dir)
        # a crash mid-save leaves step_N.orbax-checkpoint-tmp — resuming
        # from it fails; only complete saves count
        if d.startswith("step_") and not d.endswith("-tmp")
    )
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def restore_train_state(path: str, like=None):
    """Restore a saved train-state dict.

    `like`: an optional template dict {"step", "params", "opt_state",
    "ema_params"} from a freshly initialized TrainState — orbax restores
    bare pytrees as nested dicts, which breaks optax (its states are
    NamedTuples: 'dict' object has no attribute 'mu'); restoring against
    the template reproduces the exact container types."""
    if like is None:
        return _ckptr().restore(path)
    import orbax.checkpoint as ocp

    template = jax.tree_util.tree_map(np.asarray, jax.device_get(like))
    return _ckptr().restore(path, args=ocp.args.PyTreeRestore(
        restore_args=ocp.checkpoint_utils.construct_restore_args(template),
        item=template,
    ))


def restore_params(path: str, prefer_ema: bool = True):
    """Params-only restore (EMA preferred — import_weights.py:6-28)."""
    tree = _ckptr().restore(path)
    if isinstance(tree, dict) and "ema_params" in tree and prefer_ema:
        return tree["ema_params"]
    if isinstance(tree, dict) and "params" in tree and "step" in tree:
        return tree["params"]
    return tree


def save_params_npz(path: str, params, dtype=np.float16) -> None:
    """Save a params pytree as one flat .npz — a compact, restore-proof
    artifact format (orbax dirs are many files and don't belong in git).

    float16 default: more mantissa bits than the bf16 the model computes
    in, half the bytes of fp32; weight magnitudes are far inside fp16
    range (guarded here).
    """
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(jax.device_get(params), sep="/")
    out = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if dtype is not None and v.dtype in (np.float32, np.float64):
            assert np.all(np.abs(v[np.isfinite(v)]) < 6e4), f"{k} overflows fp16"
            v = v.astype(dtype)
        out[k] = v
    np.savez_compressed(path, **out)


def load_params_npz(path: str, dtype=np.float32):
    """Load a flat .npz params artifact back into the nested pytree."""
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        flat = {
            k: (
                z[k].astype(dtype)
                if z[k].dtype in (np.float16, np.float32, np.float64)
                else z[k]
            )
            for k in z.files
        }
    return unflatten_dict(flat, sep="/")
