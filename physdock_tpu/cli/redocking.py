"""Redocking CLI (reference: redocking.py:460-517).

Predict poses of known ligands in prepared systems:
    python -m physdock_tpu.cli.redocking -i SYSTEM.pkl.gz -o out/ [...]
    python -m physdock_tpu.cli.redocking -f SYSTEMS_DIR -o out/ [...]

For reference-prepped systems whose ligand CCD metadata is unavailable
(the reference's binary blob), pass --ligand_sdf or --ligand_smi to supply
the ligand chemistry (positions in the pkl still define the pocket).
"""

from __future__ import annotations

import argparse
import glob
import os

from physdock_tpu.cli.common import add_common_flags, build_pipeline
from physdock_tpu.utils.io import dump_json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input_pkl", default=None)
    p.add_argument("-f", "--input_dir", default=None)
    p.add_argument("--ligand_sdf", default=None)
    p.add_argument("--ligand_smi", default=None)
    p.add_argument(
        "--dock_batch_size", type=int, default=1,
        help="stack this many same-shape systems into one vmapped device "
        "program (1 = sequential docks with prefetched featurization)",
    )
    add_common_flags(p)
    args = p.parse_args(argv)

    systems = []
    if args.input_pkl:
        systems = [args.input_pkl]
    elif args.input_dir:
        systems = sorted(glob.glob(os.path.join(args.input_dir, "*.pkl.gz")))
    if not systems:
        p.error("provide -i or -f with systems")

    pipe = build_pipeline(args)
    results = []
    todo = []
    for sys_pkl in systems:
        name = os.path.basename(sys_pkl).replace(".pkl.gz", "")
        if os.path.exists(os.path.join(args.output_dir, name, "top5_rmsd.json")):
            print(f"[skip] {name}: outputs exist")
            continue
        todo.append(sys_pkl)
    if len(todo) > 1:
        try:
            # multi-system path: featurization prefetched behind device
            # rounds; optional cross-system device batching
            rs = pipe.dock_many(
                todo,
                args.output_dir,
                ligand_sdf=args.ligand_sdf,
                smi=args.ligand_smi,
                batch_size=args.dock_batch_size,
            )
            for r in rs:
                print(f"[done] {r['system_id']}: top5_rmsd={r['top5_rmsd']}")
            results.extend(rs)
            todo = []
        except Exception as e:
            print(f"[dock_many failed: {e}; falling back to sequential]")
            # dock_many may have died with load/post responses still queued
            # in the worker pipe; the request-id protocol would catch the
            # desync, but the fallback needs a clean worker to proceed
            if hasattr(pipe.featurizer, "respawn"):
                pipe.featurizer.respawn()
            todo = [
                s for s in todo
                if not os.path.exists(os.path.join(
                    args.output_dir,
                    os.path.basename(s).replace(".pkl.gz", ""),
                    "top5_rmsd.json",
                ))
            ]
    for sys_pkl in todo:
        name = os.path.basename(sys_pkl).replace(".pkl.gz", "")
        out = os.path.join(args.output_dir, name)
        try:
            r = pipe.dock(
                sys_pkl,
                out,
                ligand_sdf=args.ligand_sdf,
                smi=args.ligand_smi,
            )
            results.append(r)
            print(f"[done] {name}: top5_rmsd={r['top5_rmsd']}")
        except Exception as e:  # per-system robustness (redocking.py:454-456)
            print(f"[fail] {name}: {e}")
            results.append({"system_id": name, "error": str(e)})
    dump_json(results, os.path.join(args.output_dir, "summary.json"))
    return results


if __name__ == "__main__":
    main()
