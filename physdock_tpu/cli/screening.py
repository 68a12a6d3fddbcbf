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
    p.add_argument("--num_shards", type=int, default=1,
                   help="split the library across N independent processes/"
                        "hosts (embarrassingly parallel; per-ligand output "
                        "dirs are md5-keyed so shards share one output dir)")
    p.add_argument("--shard_id", type=int, default=0)
    add_common_flags(p)
    args = p.parse_args(argv)

    smiles = load_txt(args.smiles_txt)
    assert 0 <= args.shard_id < args.num_shards, (args.shard_id, args.num_shards)
    if args.num_shards > 1:
        smiles = smiles[args.shard_id :: args.num_shards]
        print(
            f"[screen] shard {args.shard_id}/{args.num_shards}: "
            f"{len(smiles)} ligands"
        )
    pipe = build_pipeline(args)
    results = pipe.screen(
        args.input_pkl, smiles, args.output_dir,
        batch_size=args.vs_batch_size,
    )
    name = (
        "screening_results.json"
        if args.num_shards == 1
        else f"screening_results.shard{args.shard_id:03d}.json"
    )
    dump_json(results, os.path.join(args.output_dir, name))
    for r in results:
        tag = r.get("error", f"poses={r.get('num_poses')}")
        print(f"[screen] {r['smiles'][:50]}: {tag}")
    return results


if __name__ == "__main__":
    main()
