"""On-chip phase breakdown of the guided dock: conditioning, unguided
sampler, FF-only round (round 0), banked round (round >=1).

Scalar-readback timing (tunnel rule), batch uploaded once.
"""

from __future__ import annotations

import time

import numpy as np
from physdock_tpu.utils.demo_assets import system_preparation_dir


def force(x):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    return sum(float(jnp.sum(l.astype(jnp.float32))) for l in leaves)


def main():
    import jax
    import jax.numpy as jnp

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.mol import read_sdf
    from physdock_tpu.data.embed import generate_conformers
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.diffusion import PhysicsGuidance, sample_diffusion
    from physdock_tpu.model.forcefield import build_ligand_ff
    from physdock_tpu.model.physdock import PhysDock

    on_tpu = jax.devices()[0].platform != "cpu"
    name = "medium" if on_tpu else "toy"
    n_tok, n_atoms, n_msa, S, steps = (
        (256, 2048, 128, 20, 40) if on_tpu else (32, 96, 8, 2, 4)
    )

    mol = read_sdf(f"{system_preparation_dir()}/EJQ.sdf")
    L = mol.num_atoms
    cfg = PhysDockConfig.named(name, bf16=on_tpu, num_augmentation_sample=2)
    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(
            n_tokens=n_tok, n_atoms=n_atoms, n_msa=n_msa, n_ligand_tokens=L
        ).items()
        if k not in ("ap_mask", "z_mask")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    confs = generate_conformers(mol, num_confs=32, base_coords=mol.coords)
    ff = build_ligand_ff(
        mol.atomic_numbers.tolist(), [(i, j) for i, j, _ in mol.bonds],
        confs[0], chiral_centers=mol.chiral_centers(),
    )
    lig_idx = np.arange(n_atoms - L, n_atoms, dtype=np.int32)
    K = 8  # bank size
    bank = confs[:K]
    g = PhysicsGuidance(
        ligand_idx=jnp.asarray(lig_idx),
        ligand_mask=jnp.ones(L, jnp.float32),
        conf_pos=jnp.asarray(bank),
        conf_dists=jnp.asarray(
            np.linalg.norm(bank[:, :, None] - bank[:, None], axis=-1)
        ),
        conf_mask=jnp.ones(K, jnp.float32),
        ff=ff,
    )

    cond_fn = jax.jit(lambda p, b: model.apply(p, b, method="conditioning"))

    import functools

    @functools.partial(jax.jit, static_argnames=("use_bank", "with_g"))
    def samp(p, b, key, cond, gg, factor, use_bank, with_g):
        return sample_diffusion(
            model, p, b, key, num_sample=S, steps=steps, karras_rho=1000.0,
            guidance=gg if with_g else None, mmff_gamma_0_factor=factor,
            align_ref_pos=use_bank, conditioning=cond,
        )

    def t(fn, *a, reps=3, **kw):
        force(fn(*a, **kw))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(reps):
            force(fn(*a, **kw))
        return (time.perf_counter() - t0) / reps

    k = jax.random.PRNGKey(2)
    dt = t(cond_fn, params, batch)
    print(f"conditioning: {dt*1e3:.0f} ms")
    cond = cond_fn(params, batch)
    f = jnp.float32(6.0)
    dt = t(samp, params, batch, k, cond, None, f, False, False)
    print(f"sampler unguided ({S} poses, {steps} steps): {dt*1e3:.0f} ms")
    dt = t(samp, params, batch, k, cond, g, f, False, True)
    print(f"sampler FF-only (round 0): {dt*1e3:.0f} ms")
    dt = t(samp, params, batch, k, cond, g, f, True, True)
    print(f"sampler banked (round >=1): {dt*1e3:.0f} ms")


if __name__ == "__main__":
    main()
