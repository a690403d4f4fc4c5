"""Platform selection helper.

Some deployment images force-register a TPU plugin and override the
JAX_PLATFORMS environment variable via site configuration (observed here:
config pinned to "axon,cpu" regardless of env). `ensure_platform()` makes the
env var authoritative again — call it before the first backend use in CLI
entry points so `JAX_PLATFORMS=cpu python ...` reliably avoids the TPU (two
processes contending for the TPU tunnel deadlock each other)."""

from __future__ import annotations

import os

_CACHE_DIR = os.environ.get(
    "OMNIVGGT_COMPILE_CACHE", os.path.expanduser("~/.cache/omnivggt_tpu_xla")
)


def ensure_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS", "").strip()
    if env:
        import jax

        jax.config.update("jax_platforms", env)
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: TPU compiles on this tunneled backend
    run minutes; caching makes repeated bench/CLI runs start in seconds."""
    import jax

    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # cache is an optimisation only
