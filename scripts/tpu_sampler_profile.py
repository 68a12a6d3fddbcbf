"""Per-stage breakdown of the guided dock on-chip (VERDICT r3 item 1).

Attributes the e2e-MFU vs kernel-MFU gap: conditioning trunk, bias-cache
build (per round), atom-DiT encoder / token-DiT / atom-DiT decoder (per
step, B=S samples), the full denoise call, the full 40-step unguided
sampler, and the guided sampler (conformer matching + FF relaxation +
rigid projection inside the scan).

If /root/repo/_artifacts/stage_flops.json exists (written by
scripts/stage_flops.py in a clean CPU process), each stage also reports
achieved TF/s and % of the measured chip wall (~80-83 TF/s bf16,
scripts/mxu_roofline_tpu.py).  Writes STAGE_PROFILE.json.

Scalar-readback timing (tunnel rule); synthetic batch at the bench's
static shapes (medium, crop 256/2048, 20 samples).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEASURED_WALL_TFS = 81.0  # chip bf16 wall, scripts/mxu_roofline_tpu.py


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


def timeit_looped(stage, carry_init, extra, reps, iters=3):
    """One-dispatch repeat timer: run `stage` `reps` times inside a
    lax.fori_loop, threading a real data dependency through the carry so
    XLA can neither hoist the body nor skip iterations.

    Per-call dispatch over the axon tunnel costs ~20-25 ms — timing a
    ~10 ms stage call-by-call inflates it 3x, which is exactly how the
    round-4 STAGE_PROFILE got NEGATIVE glue terms (sub-stages summed to
    more than the whole; VERDICT r4 weak #3).  `stage(carry, *extra)`
    must return either a tensor of carry's shape (used as the next
    carry) or any pytree (reduced to a scalar folded into the carry).
    `extra` (params etc.) is passed as jit arguments, never closed over
    (tunnel rule: baked device constants blow up the compile payload).
    """
    import jax
    import jax.numpy as jnp

    def run(c0, *ex):
        def body(_, c):
            out = stage(c, *ex)
            if isinstance(out, jax.Array) and out.shape == c.shape:
                return out.astype(c.dtype)
            s = sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(out)
            )
            return c * (1.0 + 1e-30 * s.astype(c.dtype))

        return jax.lax.fori_loop(0, reps, body, c0)

    fn = jax.jit(run)
    force(fn(carry_init, *extra))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(carry_init, *extra))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps


def main():
    import jax

    if os.environ.get("PHYSDOCK_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from physdock_tpu.config import PhysDockConfig
    from physdock_tpu.data.synthetic import make_synthetic_batch
    from physdock_tpu.model.diffusion import PhysicsGuidance, sample_diffusion
    from physdock_tpu.model.forcefield import build_ligand_ff
    from physdock_tpu.model.physdock import PhysDock
    from physdock_tpu.utils.compile_cache import enable as enable_cc

    enable_cc()
    on_tpu = jax.devices()[0].platform != "cpu"
    name = "medium" if on_tpu else "toy"
    n_tok, n_atoms, n_msa, S, steps = (
        (256, 2048, 128, 20, 40) if on_tpu else (32, 96, 8, 2, 4)
    )
    cfg = PhysDockConfig.named(name, bf16=on_tpu, num_augmentation_sample=2)
    model = PhysDock(cfg=cfg.model, dtype=cfg.dtypes.compute_dtype)
    batch_np = make_synthetic_batch(
        n_tokens=n_tok, n_atoms=n_atoms, n_msa=n_msa, n_ligand_tokens=16
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in batch_np.items()
        if k not in ("ap_mask", "z_mask")
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch, jax.random.PRNGKey(1))

    cond_fn = jax.jit(lambda p, b: model.apply(p, b, method="conditioning"))
    a, ap, s, z = cond_fn(params, batch)

    bias_fn = jax.jit(
        lambda p, b, ap_, z_: model.apply(p, b, ap_, z_, method="denoise_bias_cache")
    )
    bc = bias_fn(params, batch, ap, z)

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

    samp_fn = jax.jit(
        lambda p, b, k, c: sample_diffusion(
            model, p, b, k, num_sample=S, steps=steps, karras_rho=1000.0,
            guidance=None, align_ref_pos=False, conditioning=c,
        )
    )

    # guided sampler: synthetic ligand guidance at pipeline-like shapes
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
    gsamp_fn = jax.jit(
        lambda p, b, k, c: sample_diffusion(
            model, p, b, k, num_sample=S, steps=steps, karras_rho=1000.0,
            guidance=guidance, align_ref_pos=True, conditioning=c,
            mmff_gamma_0_factor=6.0,
        )
    )

    # small stages: loop-amortized single-dispatch timing (tunnel
    # round-trips otherwise dominate and the glue terms go negative)
    REPS = 8 if on_tpu else 2
    times = {}
    times["cond"] = timeit_looped(
        lambda c, p: model.apply(p, {**batch, "ref_pos": c}, method="conditioning"),
        batch["ref_pos"], (params,), REPS,
    )
    times["bias_cache"] = timeit_looped(
        # `ap` must ride as a jit argument: closed over, it bakes into the
        # compile payload and the tunnel rejects it (HTTP 413).
        lambda c, p, ap_: model.apply(p, batch, ap_, c, method="denoise_bias_cache"),
        z, (params, ap), REPS,
    )
    times["denoise_full"] = timeit_looped(
        lambda c, p, a_, ap_, s_, z_, bc_: model.apply(
            p, batch, c, t_hat, a_, ap_, s_, z_, bias_cache=bc_,
            method="denoise",
        ),
        x_hat, (params, a, ap, s, z, bc), REPS,
    )
    times["atom_enc"] = timeit_looped(
        lambda c, p, bc_: model.apply(
            p, c, t_hat, bc_,
            method=lambda mdl, ba_, th_, b_: mdl.dit.atom_dit_encoder(
                ba_, None, _t(mdl, th_), None, None, cached_bias=b_["atom_enc"]
            ),
        ),
        ba0, (params, bc), REPS,
    )
    times["token_dit"] = timeit_looped(
        lambda c, p, bc_: model.apply(
            p, c, t_hat, bc_,
            method=lambda mdl, bs_, th_, b_: mdl.dit.token_dit(
                bs_, None, _t(mdl, th_), None, None, cached_bias=b_["token"]
            ),
        ),
        bs0, (params, bc), REPS,
    )
    times["atom_dec"] = timeit_looped(
        lambda c, p, bc_: model.apply(
            p, c, t_hat, bc_,
            method=lambda mdl, ba_, th_, b_: mdl.dit.atom_dit_decoder(
                ba_, None, _t(mdl, th_), None, None, cached_bias=b_["atom_dec"]
            ),
        ),
        ba0, (params, bc), REPS,
    )
    # the samplers are already one dispatch per call (whole scan inside)
    times["sampler"] = timeit(
        samp_fn, params, batch, key, (a, ap, s, z), warmup=1, iters=3
    )
    times["sampler_guided"] = timeit(
        gsamp_fn, params, batch, key, (a, ap, s, z), warmup=1, iters=3
    )

    flops = {}
    fpath = "/root/repo/_artifacts/stage_flops.json"
    if os.path.exists(fpath):
        with open(fpath) as f:
            flops = json.load(f)
        if flops.get("model") != name or flops.get("n_atoms") != n_atoms:
            flops = {}  # stale artifact from another shape

    rows = []
    for k, t in times.items():
        fl = flops.get(k)
        tfs = fl / t / 1e12 if fl else None
        pct = tfs / MEASURED_WALL_TFS if tfs else None
        rows.append((k, t, fl, tfs, pct))
        extra = (
            f"  {tfs:6.1f} TF/s  {pct:5.0%} of wall" if tfs is not None else ""
        )
        print(f"{k:16s} {t*1e3:8.1f} ms{extra}", flush=True)

    t_full = times["denoise_full"]
    glue = t_full - (times["atom_enc"] + times["token_dit"] + times["atom_dec"])
    scan_over = times["sampler"] / steps - t_full
    guided_over = (times["sampler_guided"] - times["sampler"]) / steps
    print(f"\ndenoise glue (pool/upscale/precond): {glue*1e3:.1f} ms/step")
    print(f"EDM/aug scan overhead:               {scan_over*1e3:.1f} ms/step")
    print(f"guidance overhead:                   {guided_over*1e3:.1f} ms/step")

    out = {
        "model": name, "n_tok": n_tok, "n_atoms": n_atoms, "S": S,
        "steps": steps, "wall_tfs": MEASURED_WALL_TFS,
        "stages": {
            k: {
                "time_s": t,
                "flops": fl,
                "tflops_per_s": tfs,
                "pct_of_wall": pct,
            }
            for k, t, fl, tfs, pct in rows
        },
        "denoise_glue_ms": glue * 1e3,
        "scan_overhead_ms_per_step": scan_over * 1e3,
        "guidance_overhead_ms_per_step": guided_over * 1e3,
    }
    with open("/root/repo/STAGE_PROFILE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
