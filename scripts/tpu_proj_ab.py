"""Same-process A/B of fused vs separate shared-input projections.

Between-process trunk timings vary with chip clock state, so this compiles
BOTH variants in one session and interleaves timed runs (fused, separate,
fused, ...) to cancel drift.  Times a Pairformer slice (the dominant trunk
stage) at medium dims.
"""

from __future__ import annotations

import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from physdock_tpu.nn import primitives
    from physdock_tpu.nn.transformers import Pairformer

    on_tpu = jax.devices()[0].platform != "cpu"
    S, c_s, c_z, blocks, R = (256, 512, 128, 8, 8) if on_tpu else (32, 64, 32, 2, 2)
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(S, c_s)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(S, S, c_z)), jnp.float32)
    mask = jnp.ones((S, S), jnp.float32)

    def build(fuse: bool):
        primitives.FUSE_PROJECTIONS = fuse
        pf = Pairformer(no_blocks=blocks, dtype=dt)
        params = jax.jit(pf.init)(jax.random.PRNGKey(0), s, z, mask)

        @jax.jit
        def run(p, s0, z0):
            out = 0.0
            ss, zz = s0, z0
            for _ in range(R):
                ss, zz = pf.apply(p, ss, zz, mask)
                ss, zz = ss.astype(jnp.float32), zz.astype(jnp.float32)
                out = out + jnp.sum(ss)
            return out

        float(run(params, s, z))  # compile+warm
        return params, run

    p_f, run_f = build(True)
    p_s, run_s = build(False)

    tf, ts = [], []
    for _ in range(4):
        t0 = time.perf_counter(); float(run_f(p_f, s, z)); tf.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run_s(p_s, s, z)); ts.append(time.perf_counter() - t0)
    per = 1e3 / (R * blocks)
    print(f"fused:    {min(tf)*per:.3f} ms/block (runs {[round(x*1e3,1) for x in tf]})")
    print(f"separate: {min(ts)*per:.3f} ms/block (runs {[round(x*1e3,1) for x in ts]})")


if __name__ == "__main__":
    main()
