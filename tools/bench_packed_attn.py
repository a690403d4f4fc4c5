"""A/B microbench: packed-heads (token-major) vs head-major flash attention
at the frame / DINOv2 attention shapes.

The packed kernel's claim is NOT a faster inner loop — it eliminates the four
(B, N, H, D) <-> (BH, N, D) HBM relayout passes per attention (measured
~18 ms/forward across the 48 frame+DINO layers at S=8). So the timed region
here deliberately includes what the model pays: q/k/v produced token-major
(like the qkv matmul does), attention consumed token-major (like the proj
matmul does). Chains ITERS calls under one jit (per-call dispatch through
the tunnel dominates otherwise) and fetches a scalar checksum.

Usage: python tools/bench_packed_attn.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform

ensure_platform()

from omnivggt_tpu.ops.attention import scaled_dot_product_attention
from omnivggt_tpu.ops.pallas.flash_attention import (
    flash_attention,
    flash_attention_packed,
)

ITERS = int(os.environ.get("ITERS", "20"))
REPS = int(os.environ.get("REPS", "5"))


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out)  # warm compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3  # ms per iteration


def chain(attn_fn):
    """ITERS attention calls with a data dependency so XLA can't dedupe;
    q/k/v regenerated from the previous output by cheap elementwise ops
    (keeps the chain honest without a second matmul in the timed region)."""

    @jax.jit
    def run(q, k, v):
        acc = jnp.float32(0)
        for i in range(ITERS):
            o = attn_fn(q, k, v)
            # perturb inputs from the output: elementwise, token-major
            d = o.reshape(q.shape) * jnp.bfloat16(1e-3)
            q = q + d
            k = k - d
            v = v + d
            acc = acc + jnp.sum(o[..., :1, :1].astype(jnp.float32))
        return acc

    return run


def main():
    # SHAPE_SET=s64 measures the S=64 frame/DINO shapes (B*H = 1024 rows),
    # where the round-3 head-major measurement (11.4 vs 7.2 ms/layer for
    # XLA) set _FLASH_MAX_ROWS=512 — the packed kernel's economics differ
    # (no relayout passes), so the threshold must be re-measured per-kernel.
    if os.environ.get("SHAPE_SET", "s8") == "s64":
        shapes = [
            ("frame S=64 (64,1374,16,64) bounded", (64, 1374, 16, 64), True, None),
            ("dino S=64 (64,1376,16,64) kv=1374", (64, 1376, 16, 64), False, 1374),
        ]
    else:
        shapes = [
            ("frame S=8 (8,1374,16,64) bounded", (8, 1374, 16, 64), True, None),
            ("dino S=8 (8,1376,16,64) kv=1374", (8, 1376, 16, 64), False, 1374),
        ]
    rng = np.random.RandomState(0)
    for name, (B, N, H, D), bounded, kv in shapes:
        q = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)

        variants = {
            "head-major bf16": functools.partial(
                flash_attention, kv_valid=kv, bounded_logits=bounded
            ),
            "head-major int8": functools.partial(
                flash_attention, kv_valid=kv, bounded_logits=bounded,
                qk_int8=True,
            ),
            "packed bf16": functools.partial(
                flash_attention_packed, kv_valid=kv, bounded_logits=bounded
            ),
            # what the model's auto dispatch runs at rows > _FLASH_MAX_ROWS
            # (static kv_valid slices K/V exactly as sdpa's wrapper does)
            "xla": functools.partial(
                scaled_dot_product_attention, impl="xla", kv_valid=kv
            ),
        }
        print(f"== {name} ==", flush=True)
        ref = None
        for vname, fn in variants.items():
            try:
                out = np.asarray(fn(q, k, v)).astype(np.float32)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"  {vname}: FAILED {type(e).__name__}: {e}")
                continue
            if ref is None:
                ref = out
                delta = 0.0
            else:
                delta = float(np.max(np.abs(out - ref)))
            ms = timed(chain(fn), q, k, v)
            print(f"  {vname}: {ms:.3f} ms/call  maxdelta={delta:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
