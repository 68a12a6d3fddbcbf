"""Pure-CPU numpy probe inside a TPU-client process, with thread CPU stats.

Pinpoints whether the axon client's threads steal the single core from
host-side numpy work (run the same probe without axon on PYTHONPATH for
the control)."""

from __future__ import annotations

import os
import time


def work(a):
    t0 = time.perf_counter()
    for _ in range(6):
        a = (a @ a) * 1e-4
    return time.perf_counter() - t0


def thread_cpu():
    out = []
    base = f"/proc/{os.getpid()}/task"
    for tid in os.listdir(base):
        try:
            with open(f"{base}/{tid}/stat") as f:
                parts = f.read().split()
            name = parts[1]
            utime, stime = int(parts[13]), int(parts[14])
            out.append((tid, name, utime + stime))
        except OSError:
            pass
    return out


def main():
    import numpy as np

    a = np.random.default_rng(0).normal(size=(1500, 1500))
    print(f"numpy before jax: {work(a):.2f}s", flush=True)

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((256, 256), jnp.float32)
    float(jnp.sum(jax.jit(lambda x: x @ x)(x)))

    c0 = {t[0]: t[2] for t in thread_cpu()}
    print(f"numpy after device use: {work(a):.2f}s", flush=True)
    time.sleep(6)
    c1 = {t[0]: t[2] for t in thread_cpu()}
    print(f"numpy after 6s idle: {work(a):.2f}s", flush=True)
    c2 = thread_cpu()
    busy = [
        (tid, name, c - c1.get(tid, 0), c1.get(tid, 0) - c0.get(tid, 0))
        for tid, name, c in c2
        if c - c1.get(tid, 0) > 5 or c1.get(tid, 0) - c0.get(tid, 0) > 5
    ]
    print("busy threads (tid, name, jiffies during last work, during idle):", busy, flush=True)


if __name__ == "__main__":
    main()
