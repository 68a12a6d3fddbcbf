"""A/B the manual-DMA folded kernel (v2) against v1 at the sampler's
production shape (B=20, S=2048, H*D=128, bf16) + correctness check.

Target (VERDICT r3 item 4): >=1.5x over v1's 2.94 ms.
"""

from __future__ import annotations

import functools
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.ops.attention import sdpa_xla
    from physdock_tpu.ops.flash_attention_folded import flash_sdpa_folded
    from physdock_tpu.ops.flash_attention_folded_v2 import flash_sdpa_folded_v2
    from physdock_tpu.ops.flash_attention_folded_v3 import flash_sdpa_folded_v3

    B, S, HD, H = 20, 2048, 128, 4
    D = HD // H
    rng = np.random.default_rng(0)
    print("building inputs...", flush=True)
    q = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, S, S)), jnp.bfloat16)
    print("inputs on device:", float(jnp.sum(q.astype(jnp.float32))), flush=True)

    # correctness vs per-head XLA reference on a small slice
    def split(x):
        return jnp.transpose(
            x.reshape(B, S, H, D), (0, 2, 1, 3)
        ).astype(jnp.float32)

    print("compiling v3 kernel...", flush=True)
    got = flash_sdpa_folded_v3(q[:2], k[:2], v[:2], bias, H, group=2)
    print("v3 ran:", float(jnp.sum(got.astype(jnp.float32))), flush=True)
    print("compiling xla reference...", flush=True)
    ref = jnp.transpose(
        sdpa_xla(split(q)[:2], split(k)[:2], split(v)[:2], bias[None]),
        (0, 2, 1, 3),
    ).reshape(2, S, HD)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
    print(f"v3 max err vs xla: {err:.4f}", flush=True)
    assert err < 0.1, err

    R = 20
    variants = [
        ("v1 bq256 g2", functools.partial(
            flash_sdpa_folded, n_heads=H, bq=256, group=2)),
        ("v3 bq256 g2", functools.partial(
            flash_sdpa_folded_v3, n_heads=H, bq=256, group=2)),
        ("v3 bq256 g1", functools.partial(
            flash_sdpa_folded_v3, n_heads=H, bq=256, group=1)),
        ("v3 bq128 g4", functools.partial(
            flash_sdpa_folded_v3, n_heads=H, bq=128, group=4)),
        ("v3 bq128 g2", functools.partial(
            flash_sdpa_folded_v3, n_heads=H, bq=128, group=2)),
        ("v3 bq512 g1", functools.partial(
            flash_sdpa_folded_v3, n_heads=H, bq=512, group=1)),
        ("v2 bq256 g2", functools.partial(
            flash_sdpa_folded_v2, n_heads=H, bq=256, group=2)),
    ]
    base = None
    for name, fn in variants:
        try:
            @jax.jit
            def run(q, k, v, bias, fn=fn):
                o = q
                for _ in range(R):
                    o = fn(o.astype(jnp.bfloat16), k, v, bias)
                return jnp.sum(o.astype(jnp.float32))

            float(run(q, k, v, bias))  # compile+warm
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(q, k, v, bias))
                best = min(best, (time.perf_counter() - t0) / R * 1e3)
            if base is None:
                base = best
            print(f"{name:14s}: {best:.3f} ms/call ({base/best:.2f}x)", flush=True)
        except Exception as e:
            print(f"{name:14s}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
