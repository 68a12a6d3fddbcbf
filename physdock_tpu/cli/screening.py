"""Virtual-screening CLI (reference: screening.py:495-523).

Dock a SMILES library into one receptor pocket:
    python -m physdock_tpu.cli.screening -i RECEPTOR.pkl.gz -s smiles.txt -o out/

The GT ligand position in the system pkl defines the pocket/crop centre;
the ligand itself is replaced per query SMILES.
"""

from __future__ import annotations

import argparse
import os

from physdock_tpu.cli.common import add_common_flags, build_pipeline
from physdock_tpu.utils.io import dump_json, load_txt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input_pkl", required=True)
    p.add_argument("-s", "--smiles_txt", required=True)
    p.add_argument("--vs_batch_size", type=int, default=1,
                   help="ligands docked per device program (vmapped "
                        "multi-ligand batching; 1 = sequential like the "
                        "reference)")
    add_common_flags(p)
    args = p.parse_args(argv)

    smiles = load_txt(args.smiles_txt)
    pipe = build_pipeline(args)
    results = pipe.screen(
        args.input_pkl, smiles, args.output_dir,
        batch_size=args.vs_batch_size,
    )
    dump_json(results, os.path.join(args.output_dir, "screening_results.json"))
    for r in results:
        tag = r.get("error", f"poses={r.get('num_poses')}")
        print(f"[screen] {r['smiles'][:50]}: {tag}")
    return results


if __name__ == "__main__":
    main()
