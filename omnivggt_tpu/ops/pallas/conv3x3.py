"""Pallas TPU kernel: 3x3 stride-1 pad-1 NHWC conv with 2x2 output folding.

Why this exists: the DPT heads' full-resolution output convs
(/root/reference/omnivggt/heads/dpt_head.py:101-126 — 128->64 at 296px and
64->32 at 518px per head) are the single largest off-trunk block of the S=8
forward (~29 ms of ~377). XLA's conv lowering runs them at ~8-21 TF/s
(tools/bench_s2d_conv.py): cout<128 fills a fraction of the MXU lanes and
the lowering pays relayouts the shape doesn't need. XLA-level rewrites
measured WORSE end-to-end (space-to-depth 2x2-block conv -3.7%, stride-2
4x4 folding -1.4% — see L.conv2d_s2d); the fix has to control the data
movement, i.e. live in a kernel.

The kernel computes the conv as ONE matmul chain per row-chunk:
  - the padded input slab for a chunk of 2*rb output rows (rb folded rows)
    is DMA'd HBM->VMEM with its 1-row/1-col halos (overlapping windows are
    not expressible as BlockSpec blocks, so the input stays in ANY memory
    and the kernel slices it explicitly),
  - the slab is phase-split in VMEM ((2r, 2c) -> (r, c, phase)) and the
    sixteen 4x4-tap patch slices are concatenated channel-wise in GROUPS
    (bounding Mosaic stack temporaries), giving matmul operands
    (rb*W/2, group*cin) against the fold-transformed kernel
    W'[(ty,tx,ci), (dy,dx,co)] = W[ty-dy, tx-dx, ci, co]  (zero o.o.r.)
    so every output sub-pixel pair (dy,dx) lands in lanes: 4*cout >= 128
    fills the MXU for the cout=32/64 convs,
  - fp32 accumulate + bias (+ optional fused ReLU), unfold back to
    (2rb, W, cout) in VMEM, one natural-layout store.

The extra taps vs the 3x3 kernel are exact zeros, so the result is the
plain conv up to fp32 reduction order (parity-tested against lax conv).
Forward/serving only: heads run under stop-gradient in inference; training
uses the XLA conv (this kernel defines no VJP).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,cin,cout) HWIO -> (16*cin, 4*cout) folded matmul kernel.

    Row order matches the kernel's patch concatenation: (ty*4+tx)*cin + ci;
    column order matches its output unfold: (dy*2+dx)*cout + co."""
    cin, cout = w.shape[2], w.shape[3]
    idx = np.arange(4)[:, None] - np.arange(2)[None, :] + 1  # (tap, d)
    wpad = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))  # 5-tap axes
    ky = idx[:, None, :, None]  # axes (ty, tx, dy, dx)
    kx = idx[None, :, None, :]
    w4 = wpad[ky, kx]  # (ty,tx,dy,dx,cin,cout)
    return w4.transpose(0, 1, 4, 2, 3, 5).reshape(16 * cin, 4 * cout)


def _conv_kernel(
    x_hbm, w_ref, b_ref, o_ref, xs, sem, *, rb, w2, cin, cout, relu, groups
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * 2 * rb, 2 * rb + 2)], xs, sem
    )
    cp.start()
    cp.wait()

    # phase split: xs (2rb+2, 2*(w2+1), cin) -> per-(sy,sx) (rb+1, w2+1, cin)
    xr = xs[:].reshape(rb + 1, 2, w2 + 1, 2, cin)
    phases = [[xr[:, sy, :, sx, :] for sx in range(2)] for sy in range(2)]

    taps = [(ty, tx) for ty in range(4) for tx in range(4)]
    per_group = len(taps) // groups
    acc = None
    for g in range(groups):
        cols = []
        for ty, tx in taps[g * per_group : (g + 1) * per_group]:
            sy, by = ty % 2, ty // 2
            sx, bx = tx % 2, tx // 2
            cols.append(phases[sy][sx][by : by + rb, bx : bx + w2, :])
        patch = jnp.concatenate(cols, axis=-1).reshape(
            rb * w2, per_group * cin
        )
        k0 = g * per_group * cin
        part = jax.lax.dot_general(
            patch,
            w_ref[pl.ds(k0, per_group * cin), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rb*w2, 4*cout)
        acc = part if acc is None else acc + part

    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    # store the FOLDED layout (rb*w2, 4*cout) — Mosaic rejects the in-kernel
    # unfold ((rb*w2,128) -> (rb,w2,2,2,cout) splits the lane dim:
    # "infer-vector-layout: unsupported shape cast"); the depth-to-space
    # shuffle runs in XLA on the kernel output instead
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_rb(h2: int, lo: int = 6, hi: int = 48) -> int | None:
    """Largest divisor of h2 in [lo, hi] — the folded-row chunk size.
    Bounds keep per-step matmuls MXU-sized without blowing VMEM."""
    for rb in range(hi, lo - 1, -1):
        if h2 % rb == 0:
            return rb
    return None


def conv3x3_eligible(x_shape, w_shape) -> bool:
    kh, kw = w_shape[0], w_shape[1]
    H, W = x_shape[-3], x_shape[-2]
    return (
        kh == 3 and kw == 3 and H % 2 == 0 and W % 2 == 0
        and _pick_rb(H // 2) is not None
    )


@functools.partial(jax.jit, static_argnames=("relu",))
def conv3x3_folded(p, x: jnp.ndarray, relu: bool = False) -> jnp.ndarray:
    """Exact 3x3 stride-1 pad-1 NHWC conv (+ optional fused ReLU).

    p: {"w": (3,3,cin,cout) HWIO, "b": optional (cout,)}. Requires
    conv3x3_eligible; caller falls back to lax conv otherwise."""
    w = p["w"]
    kh, kw, cin, cout = w.shape
    B, H, W, _ = x.shape
    if not conv3x3_eligible(x.shape, w.shape):
        raise ValueError(f"conv3x3_folded ineligible: {x.shape}, {w.shape}")
    rb = _pick_rb(H // 2)
    w2 = W // 2

    wf = _fold_weights(w.astype(jnp.float32)).astype(x.dtype)
    bias = p.get("b")
    bias = jnp.zeros((cout,), jnp.float32) if bias is None else bias
    bf = jnp.tile(bias.astype(jnp.float32), 4).reshape(1, 4 * cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h2 = H // 2
    nsteps = h2 // rb
    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, rb=rb, w2=w2, cin=cin, cout=cout, relu=relu,
            # bound the per-group patch buffer (Mosaic stack temporaries):
            # contraction runs in 4-tap groups for cin 64 (K=256/step), 8
            # 2-tap groups for cin 128 (K=256)
            groups=4 if cin <= 64 else 8,
        ),
        grid=(B, nsteps),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16 * cin, 4 * cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 4 * cout), lambda b, i: (0, 0)),
        ],
        # each step writes one whole (rb*w2, 4*cout) folded slab (full-dim
        # blocks: rb*w2 is not 8-aligned, so tiling a flat row dim instead
        # would mis-align every block)
        out_specs=pl.BlockSpec(
            (1, rb * w2, 4 * cout), lambda b, i: (b * nsteps + i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B * nsteps, rb * w2, 4 * cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * rb + 2, W + 2, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xp, wf, bf)
    # depth-to-space unfold in XLA: (B*nsteps, rb*w2, (dy,dx,co)) ->
    # (B, H, W, cout). One bandwidth-bound pass over the output.
    out = out.reshape(B, h2, w2, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, cout)
