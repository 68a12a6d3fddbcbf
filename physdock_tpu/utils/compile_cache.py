"""Persistent XLA compilation cache.

No-crop blind docking walks a bucket ladder (56 compiles measured,
NOTES_ROUND2.md item 5); without a persistent cache every process pays
the full compile bill again.  `enable()` points JAX's compilation cache
at a durable directory so a second process pays ~0 compile time.

Call once, before the first jit execution.  Safe to call twice; safe on
backends that cannot serialize executables (falls back to a warning
inside JAX, never an error here).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "PHYSDOCK_COMPILE_CACHE", "/tmp/physdock_xla_cache"
)

_enabled = False


def enable(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compilation cache.  Returns the directory in
    use, or None if disabled (PHYSDOCK_COMPILE_CACHE=0/off)."""
    global _enabled
    d = cache_dir or _DEFAULT_DIR
    if d in ("0", "off", "none", ""):
        return None
    try:
        import jax

        if jax.devices()[0].platform == "cpu":
            # XLA:CPU AOT entries record compile-machine features that can
            # mismatch the loader (observed "+prefer-no-scatter not
            # supported" warnings threatening SIGILL), and CPU compiles are
            # cheap anyway — the cache targets the TPU bucket ladders
            return None
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache everything but trivial compiles; the bucket-ladder trunk
        # compiles are 20-40 s each on the tunnel
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return d
    except Exception:  # older jax / unsupported backend: not fatal
        return None
