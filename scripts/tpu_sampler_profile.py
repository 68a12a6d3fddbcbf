"""Per-stage breakdown of the AF3DiT denoiser on-chip.

The e2e sampler runs at ~42% MFU while the folded flash kernel alone
issues 67-74% of the measured MXU wall — this script attributes the gap:
bias-cache build (per round), atom-DiT encoder, token-DiT, atom-DiT
decoder (per step, B=20 samples), vs the full denoise call and the
full 40-step sampler (EDM churn / augmentation / scan glue = remainder).

Scalar-readback timing (tunnel rule); synthetic batch at the bench's
static shapes (medium, crop 256/2048, 20 samples).
"""

from __future__ import annotations

import time

import numpy as np


def force(x):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    return sum(float(jnp.sum(l.astype(jnp.float32))) for l in leaves)


def timeit(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        force(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.diffusion import sample_diffusion
    from physdock_tpu.model.physdock import PhysDock

    on_tpu = jax.devices()[0].platform != "cpu"
    name = "medium" if on_tpu else "toy"
    n_tok, n_atoms, n_msa, S, steps = (
        (256, 2048, 128, 20, 40) if on_tpu else (32, 96, 8, 2, 4)
    )
    cfg = PhysDockConfig.named(name, bf16=on_tpu, num_augmentation_sample=2)
    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(
            n_tokens=n_tok, n_atoms=n_atoms, n_msa=n_msa, n_ligand_tokens=16
        ).items()
        if k not in ("ap_mask", "z_mask")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    cond_fn = jax.jit(lambda p, b: model.apply(p, b, method="conditioning"))
    a, ap, s, z = cond_fn(params, batch)

    bias_fn = jax.jit(
        lambda p, b, ap_, z_: model.apply(p, b, ap_, z_, method="denoise_bias_cache")
    )
    bc = bias_fn(params, batch, ap, z)

    denoise_fn = jax.jit(
        lambda p, b, x, t, a_, ap_, s_, z_, bc_: model.apply(
            p, b, x, t, a_, ap_, s_, z_, bias_cache=bc_, method="denoise"
        )
    )
    key = jax.random.PRNGKey(2)
    x_hat = 16.0 * jax.random.normal(key, (S, n_atoms, 3), jnp.float32)
    t_hat = jnp.full((S,), 16.0, jnp.float32)

    cdt = cfg.dtypes.compute_dtype
    c_a, c_s = cfg.model.c_a, cfg.model.c_s
    ba0 = jax.random.normal(key, (S, n_atoms, c_a), jnp.float32).astype(cdt)
    bs0 = jax.random.normal(key, (S, n_tok, c_s), jnp.float32).astype(cdt)

    # stage-only callables (precond glue replicated from AF3DiT.__call__;
    # the time embedder is shared and costs ~nothing)
    def _t(mdl, th):
        return mdl.dit.time_embedder(th)

    enc_fn = jax.jit(
        lambda p, ba, th, bc_: model.apply(
            p, ba, th, bc_,
            method=lambda mdl, ba_, th_, b_: mdl.dit.atom_dit_encoder(
                ba_, None, _t(mdl, th_), None, None, cached_bias=b_["atom_enc"]
            ),
        )
    )
    tok_fn = jax.jit(
        lambda p, bs, th, bc_: model.apply(
            p, bs, th, bc_,
            method=lambda mdl, bs_, th_, b_: mdl.dit.token_dit(
                bs_, None, _t(mdl, th_), None, None, cached_bias=b_["token"]
            ),
        )
    )
    dec_fn = jax.jit(
        lambda p, ba, th, bc_: model.apply(
            p, ba, th, bc_,
            method=lambda mdl, ba_, th_, b_: mdl.dit.atom_dit_decoder(
                ba_, None, _t(mdl, th_), None, None, cached_bias=b_["atom_dec"]
            ),
        )
    )

    samp_fn = jax.jit(
        lambda p, b, k, c: sample_diffusion(
            model, p, b, k, num_sample=S, steps=steps, karras_rho=1000.0,
            guidance=None, align_ref_pos=False, conditioning=c,
        )
    )

    t_bias = timeit(bias_fn, params, batch, ap, z)
    t_full = timeit(denoise_fn, params, batch, x_hat, t_hat, a, ap, s, z, bc)
    t_enc = timeit(enc_fn, params, ba0, t_hat, bc)
    t_tok = timeit(tok_fn, params, bs0, t_hat, bc)
    t_dec = timeit(dec_fn, params, ba0, t_hat, bc)
    t_samp = timeit(samp_fn, params, batch, key, (a, ap, s, z), warmup=1, iters=3)

    glue = t_full - (t_enc + t_tok + t_dec)
    scan_over = t_samp / steps - t_full
    print(f"bias cache (per round): {t_bias*1e3:.1f} ms")
    print(f"denoise full (B={S}):   {t_full*1e3:.1f} ms/step")
    print(f"  atom encoder:         {t_enc*1e3:.1f} ms ({t_enc/t_full:.0%})")
    print(f"  token DiT:            {t_tok*1e3:.1f} ms ({t_tok/t_full:.0%})")
    print(f"  atom decoder:         {t_dec*1e3:.1f} ms ({t_dec/t_full:.0%})")
    print(f"  glue (pool/upscale/precond): {glue*1e3:.1f} ms")
    print(f"sampler {steps} steps:  {t_samp*1e3:.0f} ms "
          f"({t_samp/steps*1e3:.1f} ms/step; EDM/aug overhead "
          f"{scan_over*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
