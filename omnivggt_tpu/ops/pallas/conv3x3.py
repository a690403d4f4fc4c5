"""Pallas TPU kernel: 3x3 stride-1 pad-1 NHWC conv with W-folded outputs.

STATUS: measured NEGATIVE end-to-end on the flagship — default OFF, kept as
a probe (OMNIVGGT_PALLAS_HEAD_CONVS=1). Paired A/B/B/A at BENCH_ITERS=60:
S=8 21.26/21.26 off vs 19.07/19.08 on (-10.3%), S=64 6.63 vs 6.39. Why the
microbench (3x the XLA conv) didn't transfer, from the device trace:

  1. The microbench shapes were wrong for the flagship. With features=256
     heads, the only fold-eligible conv is output_conv2.conv1 = 128->32 at
     518px (output_conv1 is 256->128, f=1, ineligible). In-model XLA runs
     that conv+bias at 35.6 TF/s / 4.43 ms per head (trace fusion.707/715)
     — not the 8.5 TF/s of the 64->32 cin=64 shape the microbench timed
     (a pathological XLA lowering the flagship never hits).
  2. The kernel itself runs the real shape at ~2 ms (~79 TF/s
     dense-equivalent), a ~2.4 ms/head win — but the XLA-side tap
     expansion has to re-materialise the 549 MB conv input: in the full
     model it lowered to 12 strided slices (~1.24 ms EACH; stride-f reads
     are uncoalesced), pads, and layout copies around the custom call,
     ~40 ms of added data movement vs ~9 ms of conv removed. An
     optimization_barrier on x (kept below) does not change this — the
     cost is the expansion itself, not producer duplication.
  3. A bitcast-friendly prep (view (W,cin) as (wf, f*cin) contiguously +
     one lane concat) still needs >= 2 full passes over the 549 MB input
     (~4-5 ms/head at HBM roofline) and so cannot beat the 4.9 ms total
     win; an all-in-kernel formulation needs +/-1 lane/sublane shifts that
     Mosaic's layout rules reject (tools/probe_mosaic_layouts.py). At
     cin=128 the relayout cost exceeds the lane-fill win on this hardware.
     Don't retry without a Mosaic that can shift sublanes.

Original premise (kept for context): the DPT heads' full-resolution output
convs (/root/reference/omnivggt/heads/dpt_head.py:101-126) underfill the
MXU lanes at cout<128, so fold f=128/cout output columns into lanes. The
kernel IS 2.2x the XLA conv at the real flagship shape — the loss is all
relayout. XLA-level rewrites measured worse still (space-to-depth -3.7%,
stride-2 4x4 folding -1.4% — see L.conv2d_s2d).

Formulation (probe-driven). On-chip Mosaic layout probes
(tools/probe_mosaic_layouts.py) show the only vector relayouts that compile
are major-dim reshape splits, major merges with 16-aligned sublanes, and
concats/slices shifted along the MAJOR dim — every sublane/lane-offset trick
(phase-split reshapes, sublane-offset slices, pltpu.roll, strided slices)
fails to lower. A 3x3 conv needs +/-1 shifts along BOTH spatial dims, so
exactly one of them can live in the kernel: the y-taps ride the major
(row) dim in-kernel; the x-taps are pre-expanded by XLA.

  - fold f = 128//cout output columns into lanes (f=4 for cout=32, f=2 for
    cout=64): output viewed as (H, W/f, f*cout) fills the 128 MXU lanes,
  - XLA prepares Xwin[h, wf, (tx, ci)] = xpad[h, wf*f + tx - 1, ci] for
    tx in [0, f+2): f+2 strided slices stacked into lanes — one
    bandwidth-bound pass writing (f+2)/f times the input bytes,
  - the kernel DMAs a (rb+2)-row slab (rb output rows + 1-row halos) and
    computes THREE MXU matmuls, one per y-tap:
        acc += Xwin_slab[ty : ty+rb]  reshaped (rb*Wfp, (f+2)cin)
               @ Wf[ty]               ((f+2)cin, f*cout)
    (major slice + 16-aligned major merge + 2D matmul: all probe-PASS),
  - fp32 accumulate + bias (+ optional fused ReLU), one folded-layout store;
    the unfold (H, Wfp, f, cout) -> (H, W, cout) is a pure lane-split
    reshape in XLA (dx is the fast index, so no transpose).

The folded weight Wf[ty, (tx,ci), (dx,co)] = W[ty, tx-dx, ci, co] (zero
out-of-range) carries exact-zero taps, so the result is the plain conv up
to fp32 reduction order (parity-tested against the lax conv). FLOPs
overhead vs the dense conv: 3(f+2)/9 = 2.0x at f=4, 1.33x at f=2, plus the
Wf->Wfp sublane-alignment pad — paid for ~6x lane occupancy.

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

# Per-step VMEM slab budget (bytes). Bounds rb so slab + matmul operand +
# fp32 accumulator stay well under VMEM alongside the pipeline's other
# buffers (e.g. 518px f=4: rb=14 -> slab 1.8 MB, total ~5.4 MB).
_SLAB_BYTES = 2 << 20


def _fold_weights(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """(3,3,cin,cout) HWIO -> (3, (f+2)*cin, f*cout) folded matmul kernels.

    Wf[ty, (tx,ci), (dx,co)] = W[ty, tx-dx, ci, co], zero out-of-range.
    Row order matches the kernel's lane layout of Xwin ((tx, ci) in lanes);
    column order matches the output unfold ((dx, co) in lanes)."""
    cin, cout = w.shape[2], w.shape[3]
    kx = np.arange(f + 2)[:, None] - np.arange(f)[None, :]  # (tap, dx)
    wpad = jnp.pad(w, ((0, 0), (f - 1, f - 1), (0, 0), (0, 0)))
    w4 = wpad[:, kx + (f - 1)]  # (3, f+2, f, cin, cout)
    return w4.transpose(0, 1, 3, 2, 4).reshape(3, (f + 2) * cin, f * cout)


def _conv_kernel(x_hbm, w_ref, b_ref, o_ref, xs, sem, *, rb, wfp, kf, relu):
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * rb, rb + 2)], xs, sem)
    cp.start()
    cp.wait()

    acc = None
    for ty in range(3):
        opnd = xs[ty : ty + rb].reshape(rb * wfp, kf)
        part = jax.lax.dot_general(
            opnd,
            w_ref[ty],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part

    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)


def _fold_factor(cout: int) -> int:
    return max(1, min(4, 128 // cout))


def _pick_rb(h: int, wfp: int, kf: int, itemsize: int) -> int | None:
    """Largest divisor of h whose (rb+2)-row input slab fits _SLAB_BYTES."""
    best = None
    for rb in range(2, h + 1):
        if h % rb == 0 and (rb + 2) * wfp * kf * itemsize <= _SLAB_BYTES:
            best = rb
    return best


def _geometry(x_shape, w_shape):
    kh, kw, cin, cout = w_shape
    H, W = x_shape[-3], x_shape[-2]
    f = _fold_factor(cout)
    if kh != 3 or kw != 3 or f < 2:
        return None
    wf = -(-W // f)
    wfp = -(-wf // 16) * 16  # 16-aligned sublanes: the in-kernel major
    kf = (f + 2) * cin       # merge (rb, Wfp, kf) -> (rb*Wfp, kf) needs it
    rb = _pick_rb(H, wfp, kf, 2)
    if rb is None:
        return None
    return f, wf, wfp, kf, rb


def conv3x3_eligible(x_shape, w_shape) -> bool:
    return _geometry(x_shape, w_shape) is not None


@functools.partial(jax.jit, static_argnames=("relu",))
def conv3x3_folded(p, x: jnp.ndarray, relu: bool = False) -> jnp.ndarray:
    """Exact 3x3 stride-1 pad-1 NHWC conv (+ optional fused ReLU).

    p: {"w": (3,3,cin,cout) HWIO, "b": optional (cout,)}. Requires
    conv3x3_eligible; caller falls back to lax conv otherwise."""
    w = p["w"]
    cin, cout = w.shape[2], w.shape[3]
    B, H, W, _ = x.shape
    geo = _geometry(x.shape, w.shape)
    if geo is None:
        raise ValueError(f"conv3x3_folded ineligible: {x.shape}, {w.shape}")
    f, wf, wfp, kf, rb = geo

    wfold = _fold_weights(w.astype(jnp.float32), f).astype(x.dtype)
    bias = p.get("b")
    bias = jnp.zeros((cout,), jnp.float32) if bias is None else bias
    bf = jnp.tile(bias.astype(jnp.float32), f).reshape(1, f * cout)

    # x-tap window expansion (XLA): cols needed are wf*f + tx - 1 for
    # tx in [0, f+2), i.e. padded cols [0, wf*f + 2); rows get their 1-row
    # halo here too so the kernel slab is a plain contiguous row range.
    # The barrier keeps x's producer OUT of the f+2 tap slices: in the full
    # model the conv input is a bilinear interpolate (+ pos-embed add), and
    # XLA duplicates that whole gather+lerp chain into EVERY tap consumer —
    # profiled at 3x24 ms of add_multiply fusions per forward (vs 8 ms of
    # actual kernel time), turning the kernel's microbench win into a -10%
    # e2e loss. Materialising x once restores the microbench economics.
    x = jax.lax.optimization_barrier(x)
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, wf * f - W + 1), (0, 0))
    )  # (B, H+2, wf*f + 2, cin)
    taps = [
        jax.lax.slice(
            xp,
            (0, 0, tx, 0),
            (B, H + 2, tx + (wf - 1) * f + 1, cin),
            (1, 1, f, 1),
        )
        for tx in range(f + 2)
    ]  # each (B, H+2, wf, cin)
    xwin = jnp.stack(taps, axis=3).reshape(B, H + 2, wf, kf)
    xwin = jnp.pad(xwin, ((0, 0), (0, 0), (0, wfp - wf), (0, 0)))

    nsteps = H // rb
    out = pl.pallas_call(
        functools.partial(_conv_kernel, rb=rb, wfp=wfp, kf=kf, relu=relu),
        grid=(B, nsteps),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, kf, f * cout), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, f * cout), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, rb * wfp, f * cout), lambda b, i: (b * nsteps + i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B * nsteps, rb * wfp, f * cout), x.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((rb + 2, wfp, kf), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xwin, wfold, bf)
    # unfold in XLA: block-major order is (b, i, r) = (b, h), and dx is the
    # fast lane index, so this is a pure reshape + pad-column slice.
    out = out.reshape(B, H, wfp, f, cout)[:, :, :wf]
    return out.reshape(B, H, wf * f, cout)[:, :, :W]
