"""Microbenchmark: int8 vs bf16 convolution throughput on this chip.

Probes the DPT-head conv shapes (models/dpt_head.py RefineNet fusion +
output convs at S=8 @ 518 px — the heads are ~56 ms of the 395 ms S=8
forward) to decide whether a W8A8 conv rung belongs in the int8 serving
ladder the way qlinear_int8 covers the trunk matmuls:

  1. raw 3x3 conv rate per dtype at the largest RefineNet shape — does
     XLA lower s8xs8->s32 convs onto the 2x-rate int8 MXU at all?
  2. the same conv with the full W8A8 epilogue (per-row activation quant,
     per-output-channel weight scales, dequant) — the bankable speedup.

Like tools/bench_int8_mxu.py: everything under one jit, scalar checksum
output (never fetch a big array through the tunnel — ~5 s per 512 MB).

Run: python tools/bench_int8_conv.py   (needs the TPU; nothing else running)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(fn, *args, reps=3):
    np.asarray(fn(*args))  # compile + first run
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)  # scalar fetch waits for the whole queue
    return (time.perf_counter() - t0) / reps


# DPT-head conv shapes at S=8 @ 518 px (NHWC, HWIO 3x3 kernels):
#   RefineNet RCU convs: 256ch at the four pyramid levels (37..296)
#   output_conv1: 256->128 at 296^2, output_conv2: 128->32 at 518^2
SHAPES = [
    ("rcu_296", (8, 296, 296, 256), 256),
    ("rcu_148", (8, 148, 148, 256), 256),
    ("out1_296", (8, 296, 296, 256), 128),
    ("out2_518", (8, 518, 518, 128), 32),
]


def main():
    from omnivggt_tpu.utils.platform import ensure_platform

    ensure_platform()
    import jax
    import jax.numpy as jnp
    from jax import lax

    key = jax.random.PRNGKey(0)
    dimnums = lax.conv_dimension_numbers(
        SHAPES[0][1], (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC")
    )

    for name, xshape, cout in SHAPES:
        cin = xshape[-1]
        x = (jax.random.normal(key, xshape) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, cin, cout)) * 0.1).astype(jnp.bfloat16)
        xi = jax.random.randint(key, xshape, -127, 128, jnp.int8)
        wi = jax.random.randint(key, (3, 3, cin, cout), -127, 128, jnp.int8)
        flops = 2 * np.prod(xshape) * 9 * cout

        # 8 convs per jit (distinct rolled WEIGHTS so XLA cannot CSE them —
        # rolling the activation would put a memory-bound full-tensor pass
        # in the timed chain, 2x more bytes for bf16 than int8, inflating
        # the apparent int8 speedup; the (3,3,cin,cout) weight roll is
        # negligible): a single dispatched conv through the tunnel has a
        # ~10 ms floor that buries the dtype signal (like the single-matmul
        # "67 TFLOP peak" artifact — CLAUDE.md); amortise like bench_int8_mxu.
        CHAIN = 8
        flops *= CHAIN

        @jax.jit
        def conv_bf16(x, w):
            acc = jnp.float32(0)
            for i in range(CHAIN):
                y = lax.conv_general_dilated(
                    x, jnp.roll(w, i, axis=3), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=dimnums,
                )
                acc += jnp.sum(y.astype(jnp.float32))
            return acc

        @jax.jit
        def conv_int8(xi, wi):
            acc = jnp.int32(0)
            for i in range(CHAIN):
                y = lax.conv_general_dilated(
                    xi, jnp.roll(wi, i, axis=3), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=dimnums,
                    preferred_element_type=jnp.int32,
                )
                acc += jnp.sum(y)
            return acc

        @jax.jit
        def conv_w8a8(x, wi):
            # dynamic per-image activation quant + per-channel weight
            # dequant; the act quant runs once per conv (as qconv2d_int8
            # does) but over the SAME x — distinct rolled weights still
            # defeat conv CSE, and XLA CSEs the repeated quant of x, so add
            # a cheap per-iter bias to x to keep each quant pass live
            acc = jnp.float32(0)
            s_w = jnp.full((cout,), 0.01, jnp.float32)
            for i in range(CHAIN):
                xr = x + jnp.bfloat16(i * 1e-6)
                s_x = jnp.max(
                    jnp.abs(xr), axis=(1, 2, 3), keepdims=True
                ).astype(jnp.float32) / 127.0
                xq = jnp.clip(
                    jnp.round(xr.astype(jnp.float32) / s_x), -127, 127
                ).astype(jnp.int8)
                y = lax.conv_general_dilated(
                    xq, jnp.roll(wi, i, axis=3), (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=dimnums,
                    preferred_element_type=jnp.int32,
                )
                acc += jnp.sum(y.astype(jnp.float32) * s_x * s_w)
            return acc

        try:
            t8 = _time(conv_int8, xi, wi)
        except Exception as e:  # int8 conv may not lower on this backend
            print(f"{name}: int8 conv FAILED to compile/run: {type(e).__name__}")
            t8 = None
        t16 = _time(conv_bf16, x, w)
        line = f"{name}: bf16 {t16*1e3:7.3f} ms ({flops/t16/1e12:6.1f} TF/s)"
        if t8 is not None:
            tq = _time(conv_w8a8, x, wi)
            line += (
                f" | int8-raw {t8*1e3:7.3f} ms ({flops/t8/1e12:6.1f} TOP/s,"
                f" {t16/t8:4.2f}x) | w8a8 {tq*1e3:7.3f} ms ({t16/tq:4.2f}x)"
            )
        print(line)


if __name__ == "__main__":
    main()
