"""Device-trace A/B of the head-major vs token-major-streaming flash
kernels at the global-attention shape: prints per-op durations so kernel
time separates from the out-of-kernel relayout/quant ops.

    python tools/profile_stream_attn.py [S]
"""

import collections
import functools
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from omnivggt_tpu.ops.pallas.flash_attention import (  # noqa: E402
    flash_attention,
    flash_attention_packed_stream,
)

ITERS = 10


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


def trace_ops(fn, *args):
    np.asarray(fn(*args))  # compile
    logdir = tempfile.mkdtemp(prefix="stream_prof_")
    jax.profiler.start_trace(logdir)
    np.asarray(fn(*args))
    jax.profiler.stop_trace()
    totals = collections.Counter()
    for path in glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    ):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                totals[ev.get("name", "")] += ev["dur"]
    return totals


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = S * 1374
    B, H, D = 1, 16, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, D) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H, D) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)

    for name, fn in [
        ("head-major int8", functools.partial(
            flash_attention, bounded_logits=True, qk_int8=True)),
        ("stream int8", functools.partial(
            flash_attention_packed_stream, qk_int8=True)),
    ]:
        totals = trace_ops(chain(fn), q, k, v)
        print(f"== {name} (us over {ITERS} iters) ==", flush=True)
        for op, dur in totals.most_common(18):
            if dur < 500:
                break
            print(f"  {dur/ITERS:10.1f}  {op[:110]}")


if __name__ == "__main__":
    main()
