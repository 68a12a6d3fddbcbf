#!/usr/bin/env python
"""Generate the self-contained synthetic demo complex (no external data).

    python scripts/make_demo_system.py --output_dir /tmp/physdock_demo

Writes DEMO_receptor.pdb, DEMO_ligand.sdf and the prepared system pkl
(DEMO_A_B_1.pkl.gz) ready for the redocking CLI.  See
physdock_tpu/data/demo.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-side prep only


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--name", default="DEMO")
    p.add_argument("--smiles", default=None,
                   help="ligand SMILES (default: paracetamol)")
    p.add_argument("--sequence", default=None,
                   help="receptor helix sequence (default: 28-aa mix)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from physdock_tpu.data import demo

    kw = {}
    if args.smiles:
        kw["smiles"] = args.smiles
    if args.sequence:
        kw["sequence"] = args.sequence
    pkl = demo.make_demo_complex(
        args.output_dir, name=args.name, seed=args.seed, **kw)
    print(pkl)


if __name__ == "__main__":
    main()
