"""A/B microbench: plain 3x3 conv vs the stride-2 output-folding rewrite
(L.conv2d_s2d) at the DPT-head output-conv shapes.

The rewrite's claim: cout<128 fills only cout/128 MXU lanes, so folding 2x2
output pixels into channels (cout -> 4*cout) should raise the roofline ~4x
for 16/9 the FLOPs. End-to-end it measured NEGATIVE (-1.4% S=8, round 5);
this isolates whether the conv itself wins (=> the e2e loss is broken
relu/interpolate fusions) or the conv loses too (=> stride-2 4x4 lowering /
d2s relayout eat the lane gain).

Chains ITERS convs under one jit, fetches a scalar. Usage:
    python tools/bench_s2d_conv.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from omnivggt_tpu.utils.platform import ensure_platform

ensure_platform()

from omnivggt_tpu.ops import layers as L

ITERS = int(os.environ.get("ITERS", "20"))
REPS = int(os.environ.get("REPS", "5"))


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best * 1e3


def chain(conv_fn, p):
    @jax.jit
    def run(x):
        acc = jnp.float32(0)
        h = x
        for _ in range(ITERS):
            y = conv_fn(p, h)
            # feed a cheap elementwise mix back so XLA can't dedupe; keep
            # the input channel count by tiling the (smaller) output
            reps = -(-h.shape[-1] // y.shape[-1])
            h = h + jnp.tile(y, (1, 1, 1, reps))[..., : h.shape[-1]] * 1e-3
            acc = acc + jnp.sum(y[..., :1, :1].astype(jnp.float32))
        return acc

    return run


def main():
    shapes = [
        # (name, B, H, W, cin, cout) — the DPT output convs at the S=8 chunk.
        # FLAGSHIP shapes (features=256): output_conv2.conv1 is 128->32 at
        # 518px (the only fold-eligible conv; output_conv1 is 256->128, f=1).
        # In-model XLA runs the 518px conv at 35.6 TF/s (4.43 ms, trace
        # fusion.707/715) — NOT the 8.5 TF/s the earlier 64->32 shape
        # measured; that cin=64 shape (a smaller config) hits a pathological
        # XLA lowering the flagship never sees. Kept last as a regression
        # probe of that lowering.
        ("output_conv2.conv1 518px 128->32 [flagship]", 8, 518, 518, 128, 32),
        ("output_conv1 148px 256->128 [flagship]", 8, 148, 148, 256, 128),
        ("64->32 518px [non-flagship, pathological XLA]", 8, 518, 518, 64, 32),
    ]
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16" else jnp.float32
    for name, B, H, W, cin, cout in shapes:
        x = jnp.asarray(rng.randn(B, H, W, cin), dtype)
        p = {
            "w": jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32),
        }
        gflop = 2 * 9 * cin * cout * H * W * B / 1e9
        from omnivggt_tpu.ops.pallas.conv3x3 import conv3x3_folded

        print(f"== {name} ({dtype.__name__}) ==", flush=True)
        variants = [
            ("plain", lambda p_, x_: L.conv2d(p_, x_, padding=((1, 1), (1, 1)))),
            ("s2d", L.conv2d_s2d),
            ("pallas", lambda p_, x_: conv3x3_folded(p_, x_)),
        ]
        if os.environ.get("SKIP", ""):
            skip = set(os.environ["SKIP"].split(","))
            variants = [v for v in variants if v[0] not in skip]
        for vname, fn in variants:
            try:
                t = timed(chain(fn, p), x)
            except Exception as e:  # keep measuring the others
                print(f"  {vname}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                continue
            print(f"  {vname}: {t:.3f} ms  ({gflop / t:.1f} TF/s"
                  f" dense-equivalent)", flush=True)


if __name__ == "__main__":
    main()
