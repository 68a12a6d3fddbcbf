"""Tune the head-folded flash kernel's grid/tiling at the sampler's shape
(B=20 samples, S=2048 atoms, H*D=128, bf16) — chained-call timing."""

from __future__ import annotations

import functools
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.ops.flash_attention_folded import flash_sdpa_folded

    B, S, HD, H = 20, 2048, 128, 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, S, S)), jnp.bfloat16)
    R = 20

    variants = [
        ("current(bq128)", dict()),
        ("swap(bq128)", dict(swap_grid=True)),
        ("bq256", dict(bq=256)),
        ("bq256+swap", dict(bq=256, swap_grid=True)),
        ("bq512 g2", dict(bq=512, group=2)),
        ("bq256 g2", dict(bq=256, group=2)),
        ("bq128 g10", dict(group=10)),
        ("bq256 g5", dict(bq=256, group=5)),
    ]
    base = None
    for name, kw in variants:
        try:
            fn = functools.partial(flash_sdpa_folded, n_heads=H, **kw)

            @jax.jit
            def run(q, k, v, bias):
                o = q
                for _ in range(R):
                    o = fn(o.astype(jnp.bfloat16), k, v, bias)
                return jnp.sum(o.astype(jnp.float32))

            r0 = float(run(q, k, v, bias))  # compile+warm
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(q, k, v, bias))
                best = min(best, (time.perf_counter() - t0) / R * 1e3)
            if base is None:
                base = best
            print(f"{name:16s}: {best:.3f} ms/call ({base/best:.2f}x)", flush=True)
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
