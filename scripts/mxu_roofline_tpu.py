"""Measure the chip's achievable bf16 matmul throughput (MXU roofline)
and put the folded-attention kernel's effective TF/s in context.

The folded kernel issues 4x redundant MXU work by construction (masked
full-width contraction trades lanes for HBM traffic); this probe answers
whether its ~2.8 ms at B=20,S=2048 is VPU overhead or simply the MXU
wall for the issued FLOPs.
"""

import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print("device_kind:", dev.device_kind, flush=True)
    rng = np.random.default_rng(0)

    def bench_matmul(m, k, n, reps=30):
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

        @jax.jit
        def run(a, b):
            acc = jnp.zeros((), jnp.float32)
            x = a
            for _ in range(reps):
                y = jax.lax.dot(x, b, preferred_element_type=jnp.bfloat16)
                acc = acc + jnp.sum(y.astype(jnp.float32))
                x = a + acc * 0  # serialize without changing shape
            return acc

        float(run(a, b))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(a, b))
            best = min(best, (time.perf_counter() - t0) / reps)
        tf = 2 * m * k * n / best / 1e12
        print(f"matmul {m}x{k}x{n}: {best*1e3:.3f} ms = {tf:.1f} TF/s", flush=True)
        return tf

    peak = max(
        bench_matmul(4096, 4096, 4096),
        bench_matmul(2048, 2048, 2048),
    )
    # attention-shaped chains
    bench_matmul(1024, 128, 2048)   # stacked-q logits shape (v3)
    bench_matmul(1024, 2048, 128)   # stacked-p attend shape
    bench_matmul(256, 128, 2048)    # per-head v1 logits shape

    # folded kernel effective rate at production shape
    from physdock_tpu.ops.flash_attention_folded import flash_sdpa_folded

    B, S, HD, H = 20, 2048, 128, 4
    q = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, S, S)), jnp.bfloat16)

    @jax.jit
    def run(q, k, v, bias):
        o = q
        for _ in range(20):
            o = flash_sdpa_folded(
                o.astype(jnp.bfloat16), k, v, bias, n_heads=H, bq=256, group=2
            )
        return jnp.sum(o.astype(jnp.float32))

    float(run(q, k, v, bias))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(q, k, v, bias))
        best = min(best, (time.perf_counter() - t0) / 20)
    issued = 2 * 2 * H * B * S * S * HD  # logits+attend, full-width lanes
    print(
        f"folded kernel: {best*1e3:.3f} ms, issued {issued/1e9:.0f} GF -> "
        f"{issued/best/1e12:.1f} TF/s issued ({issued/best/1e12/peak:.0%} of "
        f"measured peak); useful (D=32) rate = {issued/4/best/1e12:.1f} TF/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
