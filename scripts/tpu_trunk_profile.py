"""Attribute conditioning-trunk time to stages by block-count ablation.

Times the jitted conditioning at medium config and with each stack
reduced to ~zero blocks; the deltas attribute time to Pairformer,
Evoformer, atom stack, and template stack.  Chained invocations inside
one jit amortize tunnel readback latency.
"""

from __future__ import annotations

import dataclasses
import time


def main():
    import jax
    import jax.numpy as jnp

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.physdock import PhysDock

    on_tpu = jax.devices()[0].platform != "cpu"
    name = "medium" if on_tpu else "toy"
    n_tok, n_atoms, n_msa = (256, 2048, 128) if on_tpu else (32, 96, 8)
    R = 8

    base = PhysDockConfig.named(name, bf16=on_tpu, num_augmentation_sample=2)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(
            n_tokens=n_tok, n_atoms=n_atoms, n_msa=n_msa, n_ligand_tokens=16
        ).items()
        if k not in ("ap_mask", "z_mask")
    }

    def time_cfg(tag, **overrides):
        mcfg = dataclasses.replace(base.model, **overrides)
        model = PhysDock(cfg=mcfg, dtype=base.dtypes.compute_dtype)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1)
        )

        @jax.jit
        def run(p, b):
            out = 0.0
            for i in range(R):
                a, ap, s, z = model.apply(p, b, method="conditioning")
                out = out + jnp.sum(s.astype(jnp.float32))
                b = dict(b)
                b["target_feat"] = b["target_feat"] + 1e-6 * out
            return out

        float(run(params, batch))  # compile+warm
        t0 = time.perf_counter()
        float(run(params, batch))
        dt = (time.perf_counter() - t0) / R * 1e3
        print(f"{tag}: {dt:.1f} ms")
        return dt

    full = time_cfg("full trunk")
    no_pair = time_cfg("pairformer=1 (of 24)", no_blocks_pairformer=1)
    no_evo = time_cfg("evoformer=1 (of 4)", no_blocks_evoformer=1)
    no_atom = time_cfg("atom=1 (of 3)", no_blocks_atom=1)
    no_templ = time_cfg("template=1 (of 2)", no_blocks_template=1)
    print(f"attribution: pairformer ~{full-no_pair:.1f} ms, "
          f"evoformer ~{full-no_evo:.1f} ms, atom ~{full-no_atom:.1f} ms, "
          f"template ~{full-no_templ:.1f} ms")


if __name__ == "__main__":
    main()
