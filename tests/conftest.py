"""Test configuration.

Runs the whole suite on a virtual 8-device CPU backend (the standard JAX
fake-backend idiom) so sharded code paths are testable without a TPU.
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after the env setup above)

# This environment force-registers a TPU plugin platform regardless of
# JAX_PLATFORMS; pin the config to the CPU backend before any backend
# initialisation so tests never touch (or hang on) the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# fp32 parity vs torch needs true-fp32 matmuls (the CPU backend otherwise
# splits matmuls into lower-precision passes)
jax.config.update("jax_default_matmul_precision", "highest")
