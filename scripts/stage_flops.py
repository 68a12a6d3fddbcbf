"""Per-stage FLOP counts for the sampler stage profile (CPU process).

Writes /root/repo/_artifacts/stage_flops.json mapping stage -> flops at
the bench's static shapes (medium, crop 256/2048, S poses, 40 steps).
scripts/tpu_sampler_profile.py reads this to print achieved TF/s per
stage; run THIS in a clean CPU process first (tracing medium is
host-heavy and must stay off the device-owning process).

Stages mirror tpu_sampler_profile.py exactly:
  cond            conditioning trunk (once per round)
  bias_cache      per-block attention biases from (ap, z) (once per round)
  denoise_full    one denoiser call, B=S samples (per step)
  atom_enc / token_dit / atom_dec   the three DiT stacks inside denoise
  sampler         the full 40-step unguided EDM scan
  sampler_guided  same with conformer-matching + FF guidance active
"""

import json
import os
import sys

os.environ["PHYSDOCK_UNROLL_SCANS"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.diffusion import PhysicsGuidance, sample_diffusion
    from physdock_tpu.model.forcefield import build_ligand_ff
    from physdock_tpu.model.physdock import PhysDock

    name = sys.argv[1] if len(sys.argv) > 1 else "medium"
    n_tok, n_atoms, n_msa, S, steps = 256, 2048, 128, 20, 40
    if name == "toy":  # CPU smoke
        n_tok, n_atoms, n_msa, S, steps = 32, 96, 8, 2, 4

    cfg = PhysDockConfig.named(name, bf16=(name != "toy"), num_augmentation_sample=2)
    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    batch_np = make_synthetic_batch(
        n_tokens=n_tok, n_atoms=n_atoms, n_msa=n_msa, n_ligand_tokens=16
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in batch_np.items()
        if k not in ("ap_mask", "z_mask")
    }

    def struct(tree):
        return jax.tree_util.tree_map(
            lambda v: jax.ShapeDtypeStruct(jnp.shape(v), jnp.asarray(v).dtype), tree
        )

    bstruct = struct(batch)
    k0 = jax.ShapeDtypeStruct((2,), jnp.uint32)
    params = jax.eval_shape(model.init, k0, bstruct, k0)

    def flops_of(lowered):
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    out = {}

    cond_fn = lambda p, b: model.apply(p, b, method="conditioning")
    out["cond"] = flops_of(jax.jit(cond_fn).lower(params, bstruct))
    conditioning = jax.eval_shape(cond_fn, params, bstruct)
    a, ap, s, z = conditioning

    bias_fn = lambda p, b, ap_, z_: model.apply(
        p, b, ap_, z_, method="denoise_bias_cache"
    )
    out["bias_cache"] = flops_of(jax.jit(bias_fn).lower(params, bstruct, ap, z))
    bc = jax.eval_shape(bias_fn, params, bstruct, ap, z)

    x_hat = jax.ShapeDtypeStruct((S, n_atoms, 3), jnp.float32)
    t_hat = jax.ShapeDtypeStruct((S,), jnp.float32)
    denoise_fn = lambda p, b, x, t, a_, ap_, s_, z_, bc_: model.apply(
        p, b, x, t, a_, ap_, s_, z_, bias_cache=bc_, method="denoise"
    )
    out["denoise_full"] = flops_of(
        jax.jit(denoise_fn).lower(params, bstruct, x_hat, t_hat, a, ap, s, z, bc)
    )

    cdt = cfg.dtypes.compute_dtype
    ba0 = jax.ShapeDtypeStruct((S, n_atoms, cfg.model.c_a), cdt)
    bs0 = jax.ShapeDtypeStruct((S, n_tok, cfg.model.c_s), cdt)

    def _t(mdl, th):
        return mdl.dit.time_embedder(th)

    enc_fn = lambda p, ba, th, bc_: model.apply(
        p, ba, th, bc_,
        method=lambda mdl, ba_, th_, b_: mdl.dit.atom_dit_encoder(
            ba_, None, _t(mdl, th_), None, None, cached_bias=b_["atom_enc"]
        ),
    )
    tok_fn = lambda p, bs, th, bc_: model.apply(
        p, bs, th, bc_,
        method=lambda mdl, bs_, th_, b_: mdl.dit.token_dit(
            bs_, None, _t(mdl, th_), None, None, cached_bias=b_["token"]
        ),
    )
    dec_fn = lambda p, ba, th, bc_: model.apply(
        p, ba, th, bc_,
        method=lambda mdl, ba_, th_, b_: mdl.dit.atom_dit_decoder(
            ba_, None, _t(mdl, th_), None, None, cached_bias=b_["atom_dec"]
        ),
    )
    out["atom_enc"] = flops_of(jax.jit(enc_fn).lower(params, ba0, t_hat, bc))
    out["token_dit"] = flops_of(jax.jit(tok_fn).lower(params, bs0, t_hat, bc))
    out["atom_dec"] = flops_of(jax.jit(dec_fn).lower(params, ba0, t_hat, bc))

    samp_fn = lambda p, b, k, c: sample_diffusion(
        model, p, b, k, num_sample=S, steps=steps, karras_rho=1000.0,
        guidance=None, align_ref_pos=False, conditioning=c,
    )
    out["sampler"] = flops_of(
        jax.jit(samp_fn).lower(params, bstruct, k0, conditioning)
    )

    # guided: ligand = atoms of ligand tokens, bank K = 2*S (pipeline shape)
    tok_map = np.asarray(batch_np["atom_id_to_token_id"])
    lig_atoms = np.nonzero((np.asarray(batch_np["is_ligand"]) > 0)[tok_map])[0]
    L = len(lig_atoms)
    K = 2 * S
    rng = np.random.default_rng(0)
    confs = rng.normal(0, 2, (K, L, 3)).astype(np.float32)
    dists = np.linalg.norm(confs[:, :, None] - confs[:, None], axis=-1)
    ff = build_ligand_ff([6] * L, [(i, i + 1) for i in range(L - 1)], confs[0])
    guidance = PhysicsGuidance(
        ligand_idx=jnp.asarray(lig_atoms, jnp.int32),
        ligand_mask=jnp.ones(L),
        conf_pos=jnp.asarray(confs),
        conf_dists=jnp.asarray(dists),
        conf_mask=jnp.ones(K),
        ff=ff,
    )
    gsamp_fn = lambda p, b, k, c: sample_diffusion(
        model, p, b, k, num_sample=S, steps=steps, karras_rho=1000.0,
        guidance=guidance, align_ref_pos=True, conditioning=c,
        mmff_gamma_0_factor=6.0,
    )
    out["sampler_guided"] = flops_of(
        jax.jit(gsamp_fn).lower(params, bstruct, k0, conditioning)
    )

    out.update(model=name, n_tok=n_tok, n_atoms=n_atoms, n_msa=n_msa, S=S,
               steps=steps, lig_atoms=int(L))
    os.makedirs("/root/repo/_artifacts", exist_ok=True)
    path = "/root/repo/_artifacts/stage_flops.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
