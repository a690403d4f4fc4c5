"""Platform selection helper.

Some deployment images force-register a TPU plugin and override the
JAX_PLATFORMS environment variable via site configuration (observed here:
config pinned to "axon,cpu" regardless of env). `ensure_platform()` makes the
env var authoritative again — call it before the first backend use in CLI
entry points so `JAX_PLATFORMS=cpu python ...` reliably avoids the TPU (two
processes contending for the TPU tunnel deadlock each other)."""

from __future__ import annotations

import os


def ensure_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS", "").strip()
    if env:
        import jax

        jax.config.update("jax_platforms", env)
