"""Print the analytic FLOP count for a dock config as one JSON line.

Meant to run in a CLEAN CPU process (bench.py spawns it with the axon
sitecustomize stripped): tracing/lowering the medium model is host-heavy.

Usage: python scripts/flops_count.py MODEL CROP ATOM_CROP STEPS NUM_SAMPLE
"""

import json
import os
import sys

# scan bodies must be unrolled in the lowered HLO or XLA's cost analysis
# counts each scan (block stacks, the 40-step sigma loop) only once
os.environ["PHYSDOCK_UNROLL_SCANS"] = "1"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from physdock_tpu.utils.flops import estimate_dock_flops

    model, crop, atom_crop, steps, num_sample = sys.argv[1:6]
    out = estimate_dock_flops(
        model, int(crop), int(atom_crop), int(steps), int(num_sample)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
