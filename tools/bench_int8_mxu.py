"""Microbenchmark: int8 vs bf16 MXU throughput on this chip.

Two probes, both under one jit with a scalar checksum output (fetching a
full result array through the TPU tunnel costs ~5 s for 512 MB and corrupts
the timing — see CLAUDE.md):

  1. raw chained 16384^2 matmuls — the MXU rate ceiling per dtype
  2. a 24-layer trunk-shaped MLP stack (10992 x 1024 -> 4096 -> 1024) with
     the full W8A8 quant/dequant epilogues (ops/layers.qlinear_int8 math) —
     the end-to-end speedup the int8 trunk mode can actually bank

Measured on the v5e (2026-08, round 3): raw 340 TOPS int8 vs 183 TFLOPs
bf16 (1.86x); trunk-shaped MLP 24.9 ms int8 vs 32.2 ms bf16 (1.29x — the
dynamic per-row activation quant costs the difference; precomputed static
scales measured 22.7 ms but need calibration data). These numbers justify
config.trunk_quant="int8" (whole-model S=8: 17.60 -> 18.89 views/s).

Run: python tools/bench_int8_mxu.py   (needs the TPU; nothing else running)
"""

import time

import numpy as np


def _time(fn, *args, reps=3):
    np.asarray(fn(*args))  # compile + first run
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)  # scalar fetch waits for the whole queue
    return (time.perf_counter() - t0) / reps


def main():
    from omnivggt_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    # ---- probe 1: raw MXU rate ------------------------------------------
    n, reps = 16384, 8
    x16 = (jax.random.normal(key, (n, n)) * 0.01).astype(jnp.bfloat16)
    w16 = (jax.random.normal(key, (n, n)) * 0.01).astype(jnp.bfloat16)
    xi = jax.random.randint(key, (n, n), -4, 4, jnp.int8)
    wi = jax.random.randint(key, (n, n), -4, 4, jnp.int8)

    @jax.jit
    def chain_bf16(x, w):
        for _ in range(reps):
            x = jnp.dot(x, w).astype(jnp.bfloat16)
        return jnp.float32(x.sum())

    @jax.jit
    def chain_int8(x, w):
        for _ in range(reps):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            x = (y & 7).astype(jnp.int8) - 4
        return x.astype(jnp.int32).sum()

    flops = 2 * n**3 * reps
    for name, fn, args in (
        ("raw bf16", chain_bf16, (x16, w16)),
        ("raw int8", chain_int8, (xi, wi)),
    ):
        dt = _time(fn, *args, reps=2)
        print(f"{name}: {dt * 1e3:7.1f} ms  {flops / dt / 1e12:6.1f} T(FL)OPS")

    # ---- probe 2: trunk-shaped MLP stack with quant overhead ------------
    from omnivggt_tpu.ops.layers import qlinear_int8

    N, D, H, layers = 10992, 1024, 4096, 24
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (N, D)).astype(jnp.bfloat16)
    p1 = {"w": (jax.random.normal(k2, (D, H)) * 0.02).astype(jnp.bfloat16)}
    p2 = {"w": (jax.random.normal(k3, (H, D)) * 0.02).astype(jnp.bfloat16)}

    @jax.jit
    def mlp_bf16(x):
        for _ in range(layers):
            h = jax.nn.gelu(x @ p1["w"], approximate=True)
            x = (h @ p2["w"]).astype(jnp.bfloat16)
        return jnp.float32(x.sum())

    @jax.jit
    def mlp_int8(x):
        for _ in range(layers):
            h = jax.nn.gelu(qlinear_int8(p1, x), approximate=True)
            x = qlinear_int8(p2, h)
        return jnp.float32(x.sum())

    flops = 2 * N * D * H * 2 * layers
    for name, fn in (("mlp bf16", mlp_bf16), ("mlp int8", mlp_int8)):
        dt = _time(fn, x0)
        print(f"{name}: {dt * 1e3:7.1f} ms  {flops / dt / 1e12:6.1f} T(FL)OPS")


if __name__ == "__main__":
    main()
