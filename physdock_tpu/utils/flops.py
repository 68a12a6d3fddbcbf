"""Analytic FLOP accounting for the bench's MFU headline.

Counts come from XLA's own HLO cost analysis on the LOWERED (not
compiled) modules of the two programs that dominate a guided dock —
the conditioning trunk and the `steps`-step EDM sampler — at the exact
static shapes the bench runs.  This is exhaustive over every matmul/
elementwise op XLA will schedule, unlike a hand count, and it is
hardware-independent (the HLO is lowered for whatever backend is
active; FLOPs are shape arithmetic).

MFU = measured_flops_per_second / chip_peak.  Peak table below is
bf16 dense peak per chip from published TPU specs; unknown chips
report mfu=null rather than guessing.
"""

from __future__ import annotations

from typing import Dict, Optional

# bf16 dense peak FLOP/s per chip (public spec sheets)
TPU_PEAK_FLOPS = {
    "TPU v2": 45e12,
    "TPU v3": 123e12 / 2,  # per chip = 2 cores; cited per-chip 61.5
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6e": 918e12,
    "TPU7x": 2307e12,
}


def peak_flops_for(device_kind: str) -> Optional[float]:
    for k, v in TPU_PEAK_FLOPS.items():
        if device_kind.lower().startswith(k.lower()):
            return v
    return None


def _structify(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda v: jax.ShapeDtypeStruct(jnp.asarray(v).shape, jnp.asarray(v).dtype),
        tree,
    )


def estimate_dock_flops(
    model_name: str,
    crop: int,
    atom_crop: int,
    steps: int,
    num_sample: int,
    n_msa: int = 128,
    bf16: bool = True,
) -> Dict[str, float]:
    """FLOPs of one conditioning pass and one `num_sample`-pose sampler
    pass at the given bucket, via XLA HLO cost analysis.

    Run this in a clean CPU process (scripts/flops_count.py) — tracing the
    medium model is host-heavy and must stay off the device-owning process.
    """
    import jax
    import jax.numpy as jnp

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.diffusion import sample_diffusion
    from physdock_tpu.model.physdock import PhysDock

    cfg = PhysDockConfig.named(
        model_name, crop_size=crop, atom_crop_size=atom_crop, bf16=bf16,
        num_augmentation_sample=2,
    )
    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    batch_np = make_synthetic_batch(
        n_tokens=crop, n_atoms=atom_crop, n_msa=n_msa, n_ligand_tokens=24
    )
    batch = _structify({k: jnp.asarray(v) for k, v in batch_np.items()})
    k0 = jax.ShapeDtypeStruct((2,), jnp.uint32)
    params = jax.eval_shape(model.init, k0, batch, k0)

    def cond_fn(p, b):
        return model.apply(p, b, method="conditioning")

    cond_lowered = jax.jit(cond_fn).lower(params, batch)
    conditioning = jax.eval_shape(cond_fn, params, batch)

    def sample_fn(p, b, key, conditioning):
        return sample_diffusion(
            model, p, b, key,
            num_sample=num_sample, steps=steps,
            karras_rho=1000.0, guidance=None, align_ref_pos=False,
            conditioning=conditioning,
        )

    sample_lowered = jax.jit(sample_fn).lower(params, batch, k0, conditioning)

    def flops_of(lowered) -> float:
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    f_cond = flops_of(cond_lowered)
    f_sample = flops_of(sample_lowered)
    return {
        "cond_flops": f_cond,
        "sample_flops": f_sample,
        "flops_per_system_round": f_cond + f_sample,
        "model_name": model_name,
        "crop": crop,
        "atom_crop": atom_crop,
        "steps": steps,
        "num_sample": num_sample,
        "n_msa": n_msa,
    }
