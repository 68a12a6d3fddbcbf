"""Export a train checkpoint's EMA params to a flat .npz artifact.

Gitignored orbax checkpoint dirs do not survive machine restores; the
compact .npz form (fp16, flax-flattened keys) is small enough to commit,
and `cli/common.load_params` accepts it directly, so a committed artifact
makes the trained-weights demos restore-proof.

Usage: python scripts/export_params_npz.py CKPT_DIR OUT.npz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from physdock_tpu.train.checkpoint import restore_params, save_params_npz

    ckpt, out = sys.argv[1], sys.argv[2]
    params = restore_params(ckpt)
    save_params_npz(out, params)
    mb = os.path.getsize(out) / 1e6
    print(f"wrote {out} ({mb:.1f} MB)")


if __name__ == "__main__":
    main()
