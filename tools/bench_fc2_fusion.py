"""Experiment: is the fc2 kOutput fusion (matmul + residual add + next-LN
stats, measured ~91 TF/s vs fc1's 174) worth breaking apart?

The S=8 profile attributes ~1.0 ms/layer to the aggregator's fc2 fusion —
XLA fuses the residual add and the NEXT LayerNorm's mean/var reduction into
the matmul's output epilogue (kOutput), which halves the effective matmul
rate. An `optimization_barrier` between fc2's dot and the residual add
forces the epilogue into a separate (bandwidth-bound, ~0.1 ms) pass; if the
bare matmul then runs at fc1's rate, the barrier saves ~0.4 ms x 48
matmuls. This script measures a 24-layer LN->MLP->residual scan at the
trunk shape both ways, on the chip.

Run: python tools/bench_fc2_fusion.py   (needs the TPU; nothing else running)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from omnivggt_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, N, C, HID, DEPTH = 8, 1374, 1024, 4096, 24


def _time(fn, *args, reps=5):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def make_stack(barrier: bool, flat: bool):
    def body(x, w):
        h = jax.nn.gelu(
            jnp.einsum("...c,ch->...h", x, w["w1"]), approximate=True
        )
        y = jnp.einsum("...h,hc->...c", h, w["w2"])
        if barrier:
            # keep the residual add + the next LN's reductions OUT of the
            # matmul's output epilogue
            y = jax.lax.optimization_barrier(y)
        x = x + y
        # stand-in for the next layer's LN (mean/var reductions over C)
        mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        x = ((x - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
        return x, None

    @jax.jit
    def run(x, ws):
        if flat:
            x = x.reshape(B * N, C)
        x, _ = jax.lax.scan(body, x, ws)
        return jnp.sum(x.astype(jnp.float32))

    return run


def main():
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (B, N, C)) * 0.02).astype(jnp.bfloat16)
    ws = {
        "w1": (jax.random.normal(key, (DEPTH, C, HID)) * 0.02).astype(jnp.bfloat16),
        "w2": (jax.random.normal(key, (DEPTH, HID, C)) * 0.02).astype(jnp.bfloat16),
    }
    flops = 2 * 2 * B * N * C * HID * DEPTH  # fc1+fc2 per layer x depth
    for flat in (False, True):
        for barrier in (False, True):
            t = _time(make_stack(barrier, flat), x, ws)
            print(
                f"flat={int(flat)} barrier={int(barrier)}: {t*1e3:7.2f} ms"
                f"  ({flops/t/1e12:6.1f} TF/s)"
            )


if __name__ == "__main__":
    main()
