"""Create a torch-format checkpoint in the reference's release layout
(flat state_dict with `model.` prefixes, utils/import_weights.py:31-41)
from a randomly initialized reference model — the stand-in for the
unobtainable params.pt that convert_and_verify_params.py must take
end-to-end (zero egress; scripts/download_params.sh in the reference).

  python scripts/make_synthetic_pt.py /tmp/toy_params.pt --model toy
"""

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--model", default="toy")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import torch

    # the reference imports rdkit at module scope; absent here (see
    # tests/test_reference_parity.py)
    if "rdkit" not in sys.modules:
        rdkit = types.ModuleType("rdkit")
        chem = types.ModuleType("rdkit.Chem")
        chem.AllChem = types.SimpleNamespace()
        geom = types.ModuleType("rdkit.Geometry")
        geom.Point3D = object
        rdbase = types.ModuleType("rdkit.rdBase")
        rdbase.DisableLog = lambda *_: None
        rdkit.Chem, rdkit.Geometry, rdkit.rdBase = chem, geom, rdbase
        sys.modules.update({"rdkit": rdkit, "rdkit.Chem": chem,
                            "rdkit.Geometry": geom, "rdkit.rdBase": rdbase})
    sys.path.insert(0, "/root/reference")
    from PhysDock.configs import PhysDockConfig as TorchConfig
    from PhysDock.models.model import PhysDock as TorchPhysDock

    torch.manual_seed(args.seed)
    model = TorchPhysDock(
        TorchConfig(model_name=args.model, num_augmentation_sample=2)
    )
    state = {f"model.{k}": v for k, v in model.state_dict().items()}
    torch.save(state, args.out)
    n = sum(v.numel() for v in state.values())
    print(f"wrote {args.out}: {len(state)} entries, {n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
