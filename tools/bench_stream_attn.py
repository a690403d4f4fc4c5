"""A/B microbench: token-major streaming (packed-heads) vs head-major flash
attention at the GLOBAL-attention shapes.

Like tools/bench_packed_attn.py, the timed region includes what the model
pays around the kernel: q/k/v produced token-major (the qkv matmul's output
layout), attention consumed token-major (the proj matmul's input layout).
The head-major variants therefore pay their four (B,N,H,D)<->(BH,N,D)
relayouts and (for int8) the out-of-kernel quant passes inside the timed
chain — exactly the costs the streaming kernel exists to eliminate.

Usage: python tools/bench_stream_attn.py [S ...]   (default S=8 and S=64)
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

from omnivggt_tpu.ops.pallas.flash_attention import (
    flash_attention,
    flash_attention_packed_stream,
)

ITERS = int(os.environ.get("ITERS", "10"))
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
    @jax.jit
    def run(q, k, v):
        acc = jnp.float32(0)
        for _ in range(ITERS):
            o = attn_fn(q, k, v)
            d = o.reshape(q.shape) * jnp.bfloat16(1e-3)
            q = q + d
            k = k - d
            v = v + d
            acc = acc + jnp.sum(o[..., :1, :1].astype(jnp.float32))
        return acc

    return run


def main():
    views = [int(a) for a in sys.argv[1:]] or [8, 64]
    rng = np.random.RandomState(0)
    for S in views:
        N = S * 1374
        B, H, D = 1, 16, 64
        name = f"global S={S} ({B},{N},{H},{D}) bounded"
        q = jnp.asarray(rng.randn(B, N, H, D) * 0.5, jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, N, H, D) * 0.5, jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)

        variants = {
            "head-major bf16": functools.partial(
                flash_attention, bounded_logits=True
            ),
            "head-major int8": functools.partial(
                flash_attention, bounded_logits=True, qk_int8=True
            ),
            "stream bf16": flash_attention_packed_stream,
            "stream int8": functools.partial(
                flash_attention_packed_stream, qk_int8=True
            ),
        }
        for bq, bk in [(768, 3072), (1536, 2048), (512, 2048), (1024, 4096)]:
            variants[f"stream int8 bq={bq} bk={bk}"] = functools.partial(
                flash_attention_packed_stream, block_q=bq, block_k=bk,
                qk_int8=True,
            )
        print(f"== {name} ==", flush=True)
        ref = None
        for vname, fn in variants.items():
            try:
                out = np.asarray(fn(q, k, v)).astype(np.float32)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"  {vname}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")
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
